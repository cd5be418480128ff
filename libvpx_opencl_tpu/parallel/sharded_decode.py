"""Multi-chip sharded VP8 decode: MB-row sharding with halo stitching.

The FULL frame program of models/tpu_decoder.py (residuals + inter MC +
intra wavefront + loop filter + plane assembly) runs under `shard_map`
over a ('row',) device mesh:

  * per-MB arrays and reference planes are partitioned by MB row;
  * reference planes are all-gathered along 'row' before MC (an ICI
    all-gather: VP8 MVs reach ±127 px so no fixed halo bounds the MC
    window — reconinter.c:348-383 UMV clamp semantics preserved);
  * the intra + loop-filter wavefronts run diagonal-interleaved across
    shards with per-step `ppermute` halo strips (parallel/
    sharded_wavefront.py) — the cross-chip twin of the reference's
    nsync-lagged row threads (vp8/decoder/threading.c:252-478);
  * the 4-px loop-filter seam edits travel back UP one shard after the
    scan (the deferred U edit strips of models/wavefront.py).

ShardedTPUDecoder drives the same host entropy layer as TPUDecoder and is
MD5-identical to the golden decoder for every shard count — asserted on
conformance streams by tests/test_sharded_decode.py and by
__graft_entry__.dryrun_multichip.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec
from jax import shard_map

from ..models import refdec
from ..models.refdec import RefDecoder, BORDER, INTRA_FRAME, B_PRED, SPLITMV
from ..models.tpu_decoder import (U8_REF, U8_MODE, U8_UVMODE, U8_INTRA,
                                  U8_HASY2, U8_Y2BIG, U8_FLEVEL, U8_MBLIM,
                                  U8_BLIM, U8_LIM, U8_HEV, U8_NOSKIP,
                                  I16_DQY1DC, I16_DQY1AC, I16_DQY2DC,
                                  I16_DQY2AC, I16_DQUVDC, I16_DQUVAC,
                                  TPUDecoder)
from ..ops import predict as P
from ..ops import transforms as tf
from . import sharded_wavefront as sw

B = BORDER
B2 = BORDER // 2


def make_row_mesh(n_devices=None):
    """A pure ('row',) mesh: one frame's MB rows across chips (ICI)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("row",))


HALO_BUCKETS = (1, 2, 4, 9, 18)   # MB rows; 18 covers the ±255.75px
#                                   coded-MV ceiling + filter margins


def _halo_exchange(plane, axis_name, n_row, rows, halo, sidx, valid_h):
    """Assemble a locally-extended reference plane from neighbor shards.

    plane [nref, rows, W] (this shard's slice of a row-sharded plane);
    halo px of rows are pulled from up to ceil(halo/rows) neighbors each
    way over ICI ppermutes (the bounded-halo alternative to a full
    all-gather — reach is bounded by the UMV clamp + the per-frame
    measured MV field, reconinter.c:348-383).  Rows outside the true
    frame (valid_h px) are replaced by the nearest valid row
    (vp8_yv12_extend_frame_borders semantics).  Returns
    [nref, halo + rows + halo, W]."""
    hops = -(-halo // rows)
    above = []
    below = []
    for i in range(1, hops + 1):
        h = min(rows, halo - (i - 1) * rows)
        up_perm = [(s, (s + i) % n_row) for s in range(n_row)]
        dn_perm = [(s, (s - i) % n_row) for s in range(n_row)]
        above.insert(0, jax.lax.ppermute(plane[:, rows - h:, :],
                                         axis_name, up_perm))
        below.append(jax.lax.ppermute(plane[:, :h, :],
                                      axis_name, dn_perm))
    ext = jnp.concatenate(above + [plane] + below, axis=1)
    # nearest-valid-row substitution for out-of-frame halo rows (and the
    # Rp grid-padding dummy rows at the bottom)
    j = jnp.arange(ext.shape[1])
    gidx = sidx * rows - halo + j
    tgt = jnp.clip(gidx, 0, valid_h - 1) - (sidx * rows - halo)
    tgt = jnp.clip(tgt, 0, ext.shape[1] - 1)
    return jnp.take(ext, tgt, axis=1)


@functools.lru_cache(maxsize=32)
def _build_program(mesh, R, Rp, C, simple_lf, do_lf, halo_mb):
    """Jitted sharded frame program for an Rp x C padded MB grid.

    Global input shapes (leading dims sharded by 'row'):
      qcoeff  [Rp, C, 25, 16] i16     u8b   [12, Rp, C] u8
      i16b    [10, Rp, C] i16         bmodes [Rp, C, 16] u8
      y_mv    [Rp, C, 16, 2] i32      uv_mv [Rp, C, 4, 2] i32
      ref_y   [3, Rp*16, C*16] u8     ref_u/v [3, Rp*8, C*8] u8
      taps    [8, 6] i32 (replicated)
    halo_mb: MB rows of reference halo exchanged per side (sized by the
    host from the frame's decoded MV field, bucketed via HALO_BUCKETS).
    Returns (y [Rp*16, C*16], u, v) uint8 planes, row-sharded, unfiltered
    borders (the ref ring stores visible-area planes; the program pads).
    """
    n_row = mesh.shape["row"]
    assert Rp % n_row == 0
    Rs = Rp // n_row
    Nl = Rs * C
    halo_y = halo_mb * 16
    halo_c = halo_mb * 8

    def per_shard(qcoeff, u8b, i16b, bmodes, y_mv, uv_mv,
                  ref_y, ref_u, ref_v, taps):
        sidx = jax.lax.axis_index("row")
        u32 = u8b.reshape(12, Nl).astype(jnp.int32)
        i16 = i16b.reshape(10, Nl)
        qc = qcoeff.reshape(Nl, 25, 16)
        intra = u32[U8_INTRA] != 0

        # 1. residuals (dequant + WHT + IDCT) — no cross-MB deps
        resid_y, resid_u, resid_v = tf.compute_residual_blocks(
            qc, u32[U8_Y2BIG] != 0,
            i16[I16_DQY1DC:I16_DQY1AC + 1].T,
            i16[I16_DQY2DC:I16_DQY2AC + 1].T,
            i16[I16_DQUVDC:I16_DQUVAC + 1].T, u32[U8_HASY2] != 0)

        # 2. inter MC on bounded-halo extended references: ppermute halo
        #    strips sized by the frame's MV reach (no full all-gather),
        #    then per-tile sub-pel prediction (SPLITMV and uniform MBs
        #    share the path — filter windows are position-independent)
        gy = _halo_exchange(ref_y, "row", n_row, Rs * 16, halo_y, sidx,
                            R * 16)
        gu = _halo_exchange(ref_u, "row", n_row, Rs * 8, halo_c, sidx,
                            R * 8)
        gv = _halo_exchange(ref_v, "row", n_row, Rs * 8, halo_c, sidx,
                            R * 8)
        gy = jnp.pad(gy, ((0, 0), (B, B), (B, B)), mode="edge")
        gu = jnp.pad(gu, ((0, 0), (B2, B2), (B2, B2)), mode="edge")
        gv = jnp.pad(gv, ((0, 0), (B2, B2), (B2, B2)), mode="edge")

        nidx = jnp.arange(Nl)
        g_r = nidx // C + sidx * Rs     # global MB row
        l_r = nidx // C                 # shard-local MB row
        l_c = nidx % C
        ref_idx = u32[U8_REF]
        ymv = y_mv.reshape(Nl, 16, 2)
        k = jnp.arange(16)
        ty0 = (B + halo_y + l_r[:, None] * 16 + (k[None, :] >> 2) * 4 +
               (ymv[:, :, 0] >> 3)).reshape(-1)
        tx0 = (B + l_c[:, None] * 16 + (k[None, :] & 3) * 4 +
               (ymv[:, :, 1] >> 3)).reshape(-1)
        tiles = P.mc_predict_tiles(
            gy, jnp.repeat(ref_idx, 16), jnp.stack([ty0, tx0], 1),
            (ymv[:, :, 1] & 7).reshape(-1), (ymv[:, :, 0] & 7).reshape(-1),
            taps)
        mc_y = tiles.reshape(Nl, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4) \
            .reshape(Nl, 16, 16)
        cmv = uv_mv.reshape(Nl, 4, 2)
        q = jnp.arange(4)
        qy0 = (B2 + halo_c + l_r[:, None] * 8 + (q[None, :] >> 1) * 4 +
               (cmv[:, :, 0] >> 3)).reshape(-1)
        qx0 = (B2 + l_c[:, None] * 8 + (q[None, :] & 1) * 4 +
               (cmv[:, :, 1] >> 3)).reshape(-1)
        qstarts = jnp.stack([qy0, qx0], 1)
        qxf = (cmv[:, :, 1] & 7).reshape(-1)
        qyf = (cmv[:, :, 0] & 7).reshape(-1)
        ridx4 = jnp.repeat(ref_idx, 4)
        mc_u = P.mc_predict_tiles(gu, ridx4, qstarts, qxf, qyf, taps) \
            .reshape(Nl, 2, 2, 4, 4).transpose(0, 1, 3, 2, 4) \
            .reshape(Nl, 8, 8)
        mc_v = P.mc_predict_tiles(gv, ridx4, qstarts, qxf, qyf, taps) \
            .reshape(Nl, 2, 2, 4, 4).transpose(0, 1, 3, 2, 4) \
            .reshape(Nl, 8, 8)
        inter_y = jnp.clip(mc_y + resid_y, 0, 255)
        inter_u = jnp.clip(mc_u + resid_u, 0, 255)
        inter_v = jnp.clip(mc_v + resid_v, 0, 255)

        # 3. intra wavefront, stitched across shards
        yb, ub, vb = sw.intra_recon_sharded(
            Rs, C, n_row, "row", inter_y, inter_u, inter_v,
            resid_y, resid_u, resid_v,
            u32[U8_MODE], u32[U8_UVMODE], intra,
            bmodes.reshape(Nl, 16).astype(jnp.int32))

        # 4. loop filter wavefront, stitched across shards
        if do_lf:
            yb, ub, vb = sw.loop_filter_sharded(
                Rs, C, n_row, "row", simple_lf, yb, ub, vb,
                u32[U8_FLEVEL], u32[U8_MBLIM], u32[U8_BLIM],
                u32[U8_LIM], u32[U8_HEV], u8b.reshape(12, Nl)[U8_NOSKIP] != 0)

        # 5. local plane assembly (this shard's 16*Rs pixel rows)
        y_pl = tf.mbs_to_plane(yb, Rs, C, 16).astype(jnp.uint8)
        u_pl = tf.mbs_to_plane(ub, Rs, C, 8).astype(jnp.uint8)
        v_pl = tf.mbs_to_plane(vb, Rs, C, 8).astype(jnp.uint8)
        return y_pl, u_pl, v_pl

    row2 = PSpec("row")
    in_specs = (row2, PSpec(None, "row"), PSpec(None, "row"), row2,
                row2, row2,
                PSpec(None, "row"), PSpec(None, "row"), PSpec(None, "row"),
                PSpec())
    out_specs = (row2, row2, row2)
    fn = shard_map(per_shard, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)
    return jax.jit(fn)


class ShardedFrame:
    """Row-sharded device frame (visible-area planes, no borders)."""

    def __init__(self, y, u, v, w, h):
        self.y, self.u, self.v = y, u, v
        self.w, self.h = w, h

    def visible(self):
        ch, cw = (self.h + 1) // 2, (self.w + 1) // 2
        return (np.asarray(self.y)[:self.h, :self.w],
                np.asarray(self.u)[:ch, :cw],
                np.asarray(self.v)[:ch, :cw])


class ShardedTPUDecoder(TPUDecoder):
    """VP8 decoder whose pixel pipeline is sharded over an MB-row mesh.

    Host entropy layer is RefDecoder's (C++-accelerated, inherited via
    TPUDecoder for the array-prep helpers); reconstruction, loop filter
    and the reference ring are shard_map programs / sharded arrays.
    Bit-exact vs the golden decoder for every shard count.
    """

    use_native = True

    def __init__(self, mesh=None, n_devices=None):
        super().__init__()
        self.mesh = mesh if mesh is not None else make_row_mesh(n_devices)
        self.n_row = self.mesh.shape["row"]

    def _alloc(self):
        RefDecoder._alloc(self)
        R, C = self.mb_rows, self.mb_cols
        self.Rp = -(-R // self.n_row) * self.n_row
        shard = NamedSharding(self.mesh, PSpec("row"))
        z = ShardedFrame(
            jax.device_put(np.zeros((self.Rp * 16, C * 16), np.uint8), shard),
            jax.device_put(np.zeros((self.Rp * 8, C * 8), np.uint8), shard),
            jax.device_put(np.zeros((self.Rp * 8, C * 8), np.uint8), shard),
            self.w, self.h)
        self.last = self.golden = self.altref = z

    def _reconstruct(self):
        self._detokenize_all()
        R, C = self.mb_rows, self.mb_cols
        Rp, N, Np = self.Rp, R * C, self.Rp * C

        # reuse TPUDecoder's host prep for metadata bundles and per-tile MVs
        (u8b, i16b, *_rest) = self._prep_arrays()
        taps = _rest[4]
        y_mv, uv_mv = self._prep_mvs()
        qcoeff = np.ascontiguousarray(self.qcoeff.reshape(N, 25, 16),
                                      dtype=np.int16)

        def padN(a, axis):
            if Np == N:
                return a
            widths = [(0, 0)] * a.ndim
            widths[axis] = (0, Np - N)
            return np.pad(a, widths)

        u8b = padN(u8b, 1)
        i16b = padN(i16b, 1)
        qcoeff = padN(qcoeff, 0)
        y_mv = padN(y_mv, 0)
        uv_mv = padN(uv_mv, 0)
        bm = _rest[3]
        if isinstance(bm, tuple):      # bucket-compacted (b_idx, b_rows)
            b_idx, b_rows = bm
            bm = np.zeros((N, 16), np.uint8)
            valid = b_idx < N
            bm[b_idx[valid]] = b_rows[valid]
        bmodes = padN(bm, 0)
        if Np != N:
            # dummy rows: intra DC with zero residuals, filter level 0 —
            # they read the real last row's strips and are cropped away
            u8b[U8_INTRA, N:] = 1
            u8b[U8_HASY2, N:] = 1

        # _prep_arrays zeroes MVs for out-of-band / SPLITMV MBs (the dense-
        # MC exclusion of the single-chip path); the sharded per-tile path
        # handles them directly via y_mv/uv_mv, which are already complete.

        # bounded-halo size from this frame's decoded MV field: the px
        # reach of every MB's MC window beyond its own shard, bucketed to
        # bound the number of compiled variants (worst case = 18 MB rows,
        # the ±255.75px coded-MV ceiling; typical content lands in 1-2)
        Rs = Rp // self.n_row
        g_r = (np.arange(N) // C)
        shard_lo = (g_r // Rs) * Rs * 16
        shard_hi = shard_lo + Rs * 16
        mv_up = (y_mv[:N, :, 0].min(axis=1) >> 3)
        mv_dn = (y_mv[:N, :, 0].max(axis=1) >> 3)
        top_read = g_r * 16 + mv_up - 2
        bot_read = g_r * 16 + 15 + mv_dn + 3
        need_y = max(int(np.max(shard_lo - top_read, initial=0)),
                     int(np.max(bot_read - shard_hi + 1, initial=0)))
        cmv_up = (uv_mv[:N, :, 0].min(axis=1) >> 3)
        cmv_dn = (uv_mv[:N, :, 0].max(axis=1) >> 3)
        ctop = g_r * 8 + cmv_up - 2
        cbot = g_r * 8 + 7 + cmv_dn + 3
        need_c = max(int(np.max(shard_lo // 2 - ctop, initial=0)),
                     int(np.max(cbot - shard_hi // 2 + 1, initial=0)))
        need_mb = max(1, -(-max(need_y, 2 * need_c) // 16))
        halo_mb = next((b for b in HALO_BUCKETS if b >= need_mb),
                       HALO_BUCKETS[-1])
        # cap at "every other shard" (= all-gather equivalence); 1-shard
        # meshes need no halo at all
        halo_mb = min(halo_mb, (self.n_row - 1) * Rs) \
            if self.n_row > 1 else 0

        prog = _build_program(self.mesh, R, Rp, C, bool(self.simple_filter),
                              self.filter_level > 0, halo_mb)
        shard = NamedSharding(self.mesh, PSpec("row"))
        shard2 = NamedSharding(self.mesh, PSpec(None, "row"))
        dev = jax.device_put(
            [qcoeff.reshape(Rp, C, 25, 16),
             bmodes.reshape(Rp, C, 16),
             y_mv.reshape(Rp, C, 16, 2).astype(np.int32),
             uv_mv.reshape(Rp, C, 4, 2).astype(np.int32)], shard)
        dev2 = jax.device_put(
            [u8b.reshape(12, Rp, C), i16b.reshape(10, Rp, C)], shard2)
        ref_y = jax.device_put(
            jnp.stack([self.last.y, self.golden.y, self.altref.y]), shard2)
        ref_u = jax.device_put(
            jnp.stack([self.last.u, self.golden.u, self.altref.u]), shard2)
        ref_v = jax.device_put(
            jnp.stack([self.last.v, self.golden.v, self.altref.v]), shard2)
        y, u, v = prog(dev[0], dev2[0], dev2[1], dev[1], dev[2], dev[3],
                       ref_y, ref_u, ref_v, jnp.asarray(taps))
        self.cur = ShardedFrame(y, u, v, self.w, self.h)

    def _swap_and_filter(self):
        # ring swap only: LF already ran inside the sharded program and
        # borders are re-padded there each frame
        cur = self.cur
        if self.frame_type == 0:
            self.golden = self.altref = self.last = cur
        else:
            if self.copy_to_arf == 1:
                self.altref = self.last
            elif self.copy_to_arf == 2:
                self.altref = self.golden
            if self.copy_to_gf == 1:
                self.golden = self.last
            elif self.copy_to_gf == 2:
                self.golden = self.altref
            if self.refresh_golden:
                self.golden = cur
            if self.refresh_alt:
                self.altref = cur
            if self.refresh_last:
                self.last = cur
        self.frame_to_show = cur
        if not self.refresh_entropy:
            self.fc = self.lfc.copy()
