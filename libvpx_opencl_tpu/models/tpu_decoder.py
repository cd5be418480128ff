"""TPU-native VP8 decoder.

Architecture (SURVEY.md §7 design stance):
  * host: container I/O, frame headers, mode/MV decode, token decode (the
    inherently serial entropy layer; per-partition parallel, C++-accelerated
    later) → per-frame ARRAYS, the struct-of-arrays replacement for the
    reference's per-MB BLOCKD graph (blockd.h:186-329);
  * device (one jitted XLA program per frame geometry):
      1. whole-frame batched dequant + WHT + IDCT        (no deps)
      2. whole-frame batched sub-pel MC                  (no deps)
      3. intra reconstruction as an offset-2 diagonal
         wavefront `lax.scan` (the dependency structure
         the reference schedules via priority levels,
         loopfilter_cl.c:545, and nsync-lagged threads,
         threading.c:313)
      4. loop filter as a second wavefront scan
      5. border extension
  * reference frames stay device-resident across frames (the CL fork's
    host<->GPU per-frame copies, loopfilter_cl.c:571-592, disappear).

Decoded output is bit-exact vs the reference vpxdec (verified by the MD5
oracle in tests/test_tpu_decoder.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import tables as T
from ..ops import loopfilter as lf
from ..ops import predict as P
from ..ops import transforms as tf
from . import refdec
from .refdec import (B_PRED, SPLITMV, INTRA_FRAME, BORDER, RefDecoder,
                     dequant_factors, _s16)

B = BORDER          # luma pad
B2 = BORDER // 2    # chroma pad


# ---------------------------------------------------------------------------
# wavefront geometry (host-side, cached per frame shape)

def _extend_borders(plane, pad, aw, ah):
    """vp8_yv12_extend_frame_borders (yv12extend.c:23-145)."""
    plane = plane.at[pad:pad + ah, :pad].set(plane[pad:pad + ah, pad:pad + 1])
    plane = plane.at[pad:pad + ah, pad + aw:].set(
        plane[pad:pad + ah, pad + aw - 1:pad + aw])
    plane = plane.at[:pad, :].set(plane[pad:pad + 1, :])
    plane = plane.at[pad + ah:, :].set(plane[pad + ah - 1:pad + ah, :])
    return plane


def _blk4_to_mb(blocks, g):
    """[N, g*g, 4, 4] raster 4x4 blocks -> [N, g*4, g*4] MB images."""
    n = blocks.shape[0]
    return blocks.reshape(n, g, g, 4, 4).transpose(0, 1, 3, 2, 4) \
        .reshape(n, g * 4, g * 4)


# The decode pipeline is split into FOUR device programs so that the
# bucket-padded (shape-variant) stages never force a recompile of the big
# wavefront program: a new coefficient/SPLITMV/out-of-band bucket costs a
# small-program compile only.  All intermediates stay device-resident.
#
# Per-MB metadata crosses the tunnel as two BUNDLES (u8 [12,N], i16 [10,N])
# instead of ~20 separate arrays: each device_put costs ~0.3ms of host time
# in this deployment, so transfer count matters as much as volume.

(U8_REF, U8_MODE, U8_UVMODE, U8_INTRA, U8_HASY2, U8_Y2BIG, U8_FLEVEL,
 U8_MBLIM, U8_BLIM, U8_LIM, U8_HEV, U8_NOSKIP) = range(12)
(I16_MVY, I16_MVX, I16_UVMVY, I16_UVMVX, I16_DQY1DC, I16_DQY1AC,
 I16_DQY2DC, I16_DQY2AC, I16_DQUVDC, I16_DQUVAC) = range(10)


def _unpack_nibbles(qc8, escb):
    """[rows, 8] u8 nibble-packed levels (+8 biased) + escape scatter
    ([E,2] i32 (flat idx, value)) -> [rows, 16] int16 levels."""
    rows = qc8.shape[0]
    qc8 = qc8.astype(jnp.int32)
    nib = jnp.stack([qc8 & 15, qc8 >> 4], axis=-1).reshape(rows, 16) - 8
    nib = nib.astype(jnp.int16)
    return nib.reshape(-1).at[escb[:, 0]].set(
        escb[:, 1].astype(jnp.int16), mode="drop",
        unique_indices=True).reshape(rows, 16)


def _residual_core(qcoeff, u8b, i16b):
    return tf.compute_residual_blocks(
        qcoeff, u8b[U8_Y2BIG] != 0,
        i16b[I16_DQY1DC:I16_DQY1AC + 1].T,
        i16b[I16_DQY2DC:I16_DQY2AC + 1].T,
        i16b[I16_DQUVDC:I16_DQUVAC + 1].T, u8b[U8_HASY2] != 0)


@jax.jit
def _residuals_dense(qc_vals, escb, u8b, i16b):
    N = u8b.shape[1]
    qcoeff = _unpack_nibbles(qc_vals, escb).reshape(N, 25, 16)
    return _residual_core(qcoeff, u8b, i16b)


@jax.jit
def _residuals_compact(qc_vals, qc_idx, escb, u8b, i16b):
    """Coefficients arrive block-compacted (most blocks are all-zero);
    densify with one scatter (padding rows carry an out-of-range index)."""
    N = u8b.shape[1]
    vals = _unpack_nibbles(qc_vals, escb)
    dense = jnp.zeros((N * 25, 16), jnp.int16)
    dense = dense.at[qc_idx].set(vals, mode="drop", unique_indices=True)
    return _residual_core(dense.reshape(N, 25, 16), u8b, i16b)


@jax.jit
def _residuals_bitmap(qc_vals, qc_bm, escb, u8b, i16b):
    """Coefficients arrive block-compacted with the block->row mapping as a
    BITMAP (bit b set when block b is non-zero): the row index of each
    non-zero block is its rank, rebuilt here with a cumulative sum, so the
    wire cost is 1 bit per block instead of a 4-byte index per row (the
    host->TPU tunnel is this deployment's bottleneck)."""
    N = u8b.shape[1]
    cap = N * 25
    Kp = qc_vals.shape[0]
    vals = _unpack_nibbles(qc_vals, escb)
    vals = jnp.concatenate([vals, jnp.zeros((1, 16), jnp.int16)])
    bits = jnp.unpackbits(qc_bm, bitorder="little")[:cap].astype(jnp.int32)
    pos = jnp.cumsum(bits) - 1
    rowidx = jnp.where(bits == 1, jnp.minimum(pos, Kp - 1), Kp)
    dense = jnp.take(vals, rowidx, axis=0)
    return _residual_core(dense.reshape(N, 25, 16), u8b, i16b)


@functools.partial(jax.jit, static_argnums=(0,))
def _expand_bmodes(N, b_idx, b_rows):
    """Scatter bucket-compacted B_PRED sub-block modes back to [N, 16]
    (padding entries carry index N and are dropped)."""
    full = jnp.zeros((N, 16), jnp.uint8)
    return full.at[b_idx].set(b_rows, mode="drop", unique_indices=True)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _mc_dense_device(R, C, ref_y, ref_u, ref_v, u8b, i16b, taps):
    """Dense gather-free inter prediction (ops/mc_dense.py).

    mv0/uvmv0 are pre-zeroed on the host for intra / SPLITMV / out-of-band
    MBs, so every dense window is in bounds; excluded MBs are overwritten
    by _mc_fixup_device. Returns per-MB block images [N,16,16]/[N,8,8]."""
    from ..ops import mc_dense as MD
    N = R * C
    ridx = u8b[U8_REF].astype(jnp.int32).reshape(R, C)
    mv0 = i16b[I16_MVY:I16_MVX + 1].T.astype(jnp.int32)
    uvmv0 = i16b[I16_UVMVY:I16_UVMVX + 1].T.astype(jnp.int32)
    tx_y = taps[mv0[:, 1] & 7].reshape(R, C, 6)
    ty_y = taps[mv0[:, 0] & 7].reshape(R, C, 6)
    mc_y_pl = MD.mc_dense_plane(ref_y, ridx, (mv0[:, 1] >> 3).reshape(R, C),
                                (mv0[:, 0] >> 3).reshape(R, C),
                                tx_y, ty_y, R, C, 16, B)
    tx_c = taps[uvmv0[:, 1] & 7].reshape(R, C, 6)
    ty_c = taps[uvmv0[:, 0] & 7].reshape(R, C, 6)
    dxc = (uvmv0[:, 1] >> 3).reshape(R, C)
    dyc = (uvmv0[:, 0] >> 3).reshape(R, C)
    mc_u_pl = MD.mc_dense_plane(ref_u, ridx, dxc, dyc, tx_c, ty_c,
                                R, C, 8, B2)
    mc_v_pl = MD.mc_dense_plane(ref_v, ridx, dxc, dyc, tx_c, ty_c,
                                R, C, 8, B2)

    def plane_to_mb(pl, bw):
        return pl.reshape(R, bw, C, bw).transpose(0, 2, 1, 3) \
            .reshape(N, bw, bw)

    return (plane_to_mb(mc_y_pl, 16), plane_to_mb(mc_u_pl, 8),
            plane_to_mb(mc_v_pl, 8))


@functools.partial(jax.jit, static_argnums=(0, 1))
def _mc_fixup_device(R, C, mc_y, mc_u, mc_v,
                     ref_y, ref_u, ref_v, u8b, taps, obb, spb, sqb):
    """Sparse MC fixups over the dense prediction:
      * out-of-band MBs (MV beyond the dense band bounds): whole-MB
        windowed-gather prediction (reconinter.c large-motion case);
      * SPLITMV sub-block MVs (reconinter.c:449-525): per-tile prediction.
    Worklists arrive as bucket-padded i32 bundles (obb [S,6]: mb, mv y/x,
    uvmv y/x, valid; spb/sqb [S,5]: mb, tile/quad, mv y/x, valid); this
    program recompiles per bucket size, cheaply (it contains no wavefront).
    """
    N = R * C
    ref_idx = u8b[U8_REF].astype(jnp.int32)
    if obb.shape[0] > 0:
        ob_mb = obb[:, 0]
        obmv = obb[:, 1:3]
        obuv = obb[:, 3:5]
        ob_valid = obb[:, 5] != 0
        o_r, o_c = ob_mb // C, ob_mb % C
        osy = B + o_r * 16 + (obmv[:, 0] >> 3)
        osx = B + o_c * 16 + (obmv[:, 1] >> 3)
        ob_y = P.mc_predict_blocks(ref_y, ref_idx[ob_mb],
                                   jnp.stack([osy, osx], 1),
                                   obmv[:, 1] & 7, obmv[:, 0] & 7, taps, 16)
        ocy = B2 + o_r * 8 + (obuv[:, 0] >> 3)
        ocx = B2 + o_c * 8 + (obuv[:, 1] >> 3)
        oc = jnp.stack([ocy, ocx], 1)
        ob_u = P.mc_predict_blocks(ref_u, ref_idx[ob_mb], oc,
                                   obuv[:, 1] & 7, obuv[:, 0] & 7, taps, 8)
        ob_v = P.mc_predict_blocks(ref_v, ref_idx[ob_mb], oc,
                                   obuv[:, 1] & 7, obuv[:, 0] & 7, taps, 8)
        osafe = jnp.where(ob_valid, ob_mb, N)
        mc_y = mc_y.at[osafe].set(ob_y, mode="drop", unique_indices=True)
        mc_u = mc_u.at[osafe].set(ob_u, mode="drop", unique_indices=True)
        mc_v = mc_v.at[osafe].set(ob_v, mode="drop", unique_indices=True)

    if spb.shape[0] > 0:
        n_ = spb[:, 0]
        k_ = spb[:, 1]
        smv = spb[:, 2:4]
        sp_valid = spb[:, 4] != 0
        ty0 = B + (n_ // C) * 16 + (k_ >> 2) * 4 + (smv[:, 0] >> 3)
        tx0 = B + (n_ % C) * 16 + (k_ & 3) * 4 + (smv[:, 1] >> 3)
        tiles = P.mc_predict_tiles(ref_y, ref_idx[n_],
                                   jnp.stack([ty0, tx0], 1),
                                   smv[:, 1] & 7, smv[:, 0] & 7, taps)
        a4 = jnp.arange(4)
        nsafe = jnp.where(sp_valid, n_, N)
        rows = ((k_ >> 2) * 4)[:, None, None] + a4[None, :, None]
        cols = ((k_ & 3) * 4)[:, None, None] + a4[None, None, :]
        mc_y = mc_y.at[nsafe[:, None, None], rows, cols].set(
            tiles, mode="drop", unique_indices=True)
        nq = sqb[:, 0]
        q_ = sqb[:, 1]
        qmv = sqb[:, 2:4]
        sq_valid = sqb[:, 4] != 0
        qy0 = B2 + (nq // C) * 8 + (q_ >> 1) * 4 + (qmv[:, 0] >> 3)
        qx0 = B2 + (nq % C) * 8 + (q_ & 1) * 4 + (qmv[:, 1] >> 3)
        qstarts = jnp.stack([qy0, qx0], 1)
        uq = P.mc_predict_tiles(ref_u, ref_idx[nq], qstarts, qmv[:, 1] & 7,
                                qmv[:, 0] & 7, taps)
        vq = P.mc_predict_tiles(ref_v, ref_idx[nq], qstarts, qmv[:, 1] & 7,
                                qmv[:, 0] & 7, taps)
        nqsafe = jnp.where(sq_valid, nq, N)
        qrows = ((q_ >> 1) * 4)[:, None, None] + a4[None, :, None]
        qcols = ((q_ & 1) * 4)[:, None, None] + a4[None, None, :]
        mc_u = mc_u.at[nqsafe[:, None, None], qrows, qcols].set(
            uq, mode="drop", unique_indices=True)
        mc_v = mc_v.at[nqsafe[:, None, None], qrows, qcols].set(
            vq, mode="drop", unique_indices=True)
    return mc_y, mc_u, mc_v


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _wavefront_device(R, C, simple_lf, do_lf, interp,
                      mc_y, mc_u, mc_v, resid_y_b, resid_u_b, resid_v_b,
                      u8b, bmodes, bflags):
    """Residual add → Pallas intra wavefront → Pallas LF wavefront →
    plane assembly + border extension.  Fixed shapes per frame geometry."""
    from ..ops import pallas_wavefront as PW
    HP, WP = R * 16 + 2 * B, C * 16 + 2 * B
    HPc, WPc = R * 8 + 2 * B2, C * 8 + 2 * B2
    u32 = u8b.astype(jnp.int32)
    mode = u32[U8_MODE]
    uv_mode = u32[U8_UVMODE]
    intra = u8b[U8_INTRA] != 0
    bmodes = bmodes.astype(jnp.int32)
    flevel = u32[U8_FLEVEL]
    mblim_a = u32[U8_MBLIM]
    blim_a = u32[U8_BLIM]
    lim_a = u32[U8_LIM]
    hev_a = u32[U8_HEV]
    noskip_a = u8b[U8_NOSKIP] != 0

    inter_y = jnp.clip(mc_y + resid_y_b, 0, 255)
    inter_u = jnp.clip(mc_u + resid_u_b, 0, 255)
    inter_v = jnp.clip(mc_v + resid_v_b, 0, 255)

    # intra wavefront (single Pallas kernel, frontier in VMEM scratch)
    d16 = lambda x: PW.to_diag(x, R, C)  # noqa: E731
    params_i = PW.pack_params([mode, uv_mode, intra.astype(jnp.int32)], R, C)
    bmd = jnp.stack([PW.vec_to_diag(bmodes[:, k], R, C) for k in range(16)],
                    axis=1)
    yd, ud, vd = PW.intra_recon_pallas(
        R, C, interp, bflags, d16(inter_y), d16(inter_u), d16(inter_v),
        d16(resid_y_b), d16(resid_u_b), d16(resid_v_b), params_i, bmd)

    # loop filter wavefront (Pallas kernel + deferred edit-strip compose)
    if do_lf:
        params_l = PW.pack_params([flevel, mblim_a, blim_a, lim_a, hev_a,
                                   noskip_a.astype(jnp.int32)], R, C)
        outs = PW.loop_filter_pallas(R, C, simple_lf, interp, yd, ud, vd,
                                     params_l)
        yd, ud, vd = PW.lf_compose(outs, R, C, simple_lf)
    yb = PW.from_diag(yd, R, C)
    ub = PW.from_diag(ud, R, C)
    vb = PW.from_diag(vd, R, C)

    # plane assembly + border extension
    cy = jnp.zeros((HP, WP), jnp.uint8)
    cu = jnp.zeros((HPc, WPc), jnp.uint8)
    cv = jnp.zeros((HPc, WPc), jnp.uint8)
    cy = jax.lax.dynamic_update_slice(
        cy, tf.mbs_to_plane(yb, R, C, 16).astype(jnp.uint8), (B, B))
    cu = jax.lax.dynamic_update_slice(
        cu, tf.mbs_to_plane(ub, R, C, 8).astype(jnp.uint8), (B2, B2))
    cv = jax.lax.dynamic_update_slice(
        cv, tf.mbs_to_plane(vb, R, C, 8).astype(jnp.uint8), (B2, B2))
    cy = _extend_borders(cy, B, C * 16, R * 16)
    cu = _extend_borders(cu, B2, C * 8, R * 8)
    cv = _extend_borders(cv, B2, C * 8, R * 8)
    return cy, cu, cv


def decode_frame_device(R, C, simple_lf, do_lf, interp,
                        ref_y, ref_u, ref_v, u8b, i16b,
                        qc_vals, qc_idx, escb, bmodes, taps, bflags,
                        obb, spb, sqb):
    """One frame on device, orchestrating the four sub-programs."""
    if qc_idx is None:
        resid = _residuals_dense(qc_vals, escb, u8b, i16b)
    elif qc_idx.dtype == jnp.uint8:
        resid = _residuals_bitmap(qc_vals, qc_idx, escb, u8b, i16b)
    else:
        resid = _residuals_compact(qc_vals, qc_idx, escb, u8b, i16b)
    mc = _mc_dense_device(R, C, ref_y, ref_u, ref_v, u8b, i16b, taps)
    if obb.shape[0] > 0 or spb.shape[0] > 0:
        mc = _mc_fixup_device(R, C, *mc, ref_y, ref_u, ref_v, u8b, taps,
                              obb, spb, sqb)
    return _wavefront_device(R, C, simple_lf, do_lf, interp, *mc, *resid,
                             u8b, bmodes, bflags)


# ---------------------------------------------------------------------------
# host integration

@functools.partial(jax.jit, static_argnums=(3, 4))
def _pack_visible(y, u, v, w, h):
    """Crop + concatenate the visible pixels into ONE u8 buffer so readback
    is a single host transfer (3 round trips → 1 over the tunnel)."""
    ch, cw = (h + 1) // 2, (w + 1) // 2
    return jnp.concatenate([
        jax.lax.dynamic_slice(y, (B, B), (h, w)).reshape(-1),
        jax.lax.dynamic_slice(u, (B2, B2), (ch, cw)).reshape(-1),
        jax.lax.dynamic_slice(v, (B2, B2), (ch, cw)).reshape(-1)])


class DeviceFrame:
    """Device-resident frame with the FrameBuffer interface pieces the
    decoder lifecycle uses."""

    def __init__(self, y, u, v, w, h):
        self.y, self.u, self.v = y, u, v
        self.w, self.h = w, h
        self._packed = None

    def packed(self):
        """Packed visible pixels (device u8 1-D array, lazily built).
        Callers may .copy_to_host_async() it to overlap the transfer."""
        if self._packed is None:
            self._packed = _pack_visible(self.y, self.u, self.v,
                                         self.w, self.h)
        return self._packed

    def visible(self):
        ch, cw = (self.h + 1) // 2, (self.w + 1) // 2
        buf = np.asarray(self.packed())
        ny, nc = self.h * self.w, ch * cw
        return (buf[:ny].reshape(self.h, self.w),
                buf[ny:ny + nc].reshape(ch, cw),
                buf[ny + nc:].reshape(ch, cw))


class FrameFuture:
    """frame_to_show handle while the dispatch worker is still uploading /
    enqueueing the frame: resolves to the DeviceFrame on first pixel access
    so the host entropy thread never blocks on the tunnel."""

    def __init__(self, fut):
        self._fut = fut

    def _f(self):
        return self._fut.result()

    @property
    def y(self):
        return self._f().y

    @property
    def u(self):
        return self._f().u

    @property
    def v(self):
        return self._f().v

    @property
    def w(self):
        return self._f().w

    @property
    def h(self):
        return self._f().h

    def packed(self):
        return self._f().packed()

    def visible(self):
        return self._f().visible()


class TPUDecoder(RefDecoder):
    """VP8 decoder with the pixel pipeline on the TPU.

    Reuses RefDecoder's host entropy layer (headers, mode/MV, detokenize —
    C++-accelerated by default) and replaces reconstruction + loop filter +
    borders with device programs per frame geometry.

    Host pipeline: the entropy thread (this object's caller) hands each
    frame's prepared numpy arrays to a single ordered dispatch worker that
    does the device uploads + program dispatch + reference-ring swap — the
    TPU twin of the reference's decode/loop-filter thread overlap
    (threading.c:252-478): upload of frame N overlaps entropy decode of
    frame N+1 and device compute of frame N-1.
    """

    use_native = True

    _taps_dev = None
    _dispatch_pool = None
    _pending = None

    def _alloc(self):
        self._sync()
        super()._alloc()
        if self._taps_dev is None:
            self._taps_dev = {}
        if self._dispatch_pool is None:
            import concurrent.futures as cf
            self._dispatch_pool = cf.ThreadPoolExecutor(max_workers=1)
        R, C = self.mb_rows, self.mb_cols
        HP, WP = R * 16 + 2 * B, C * 16 + 2 * B
        HPc, WPc = R * 8 + 2 * B2, C * 8 + 2 * B2
        z = DeviceFrame(jnp.zeros((HP, WP), jnp.uint8),
                        jnp.zeros((HPc, WPc), jnp.uint8),
                        jnp.zeros((HPc, WPc), jnp.uint8), self.w, self.h)
        self.last = self.golden = self.altref = z

    def _sync(self):
        """Join the dispatch worker (before any main-thread access to the
        device reference ring: _alloc, concealment, get/set_reference)."""
        if self._pending is not None:
            try:
                self._pending.result()
            finally:
                # clear even on failure: a dispatch-worker exception must
                # surface exactly once, leaving the reference ring at the
                # last committed frame so the stream can continue
                self._pending = None

    def conceal_missing_frame(self):
        self._sync()
        return super().conceal_missing_frame()

    def _reconstruct(self):
        self._detokenize_all()
        np_args = self._prep_arrays()
        meta = (self.mb_rows, self.mb_cols, bool(self.simple_filter),
                self.filter_level > 0, self.frame_type,
                getattr(self, "copy_to_arf", 0),
                getattr(self, "copy_to_gf", 0),
                getattr(self, "refresh_golden", 0),
                getattr(self, "refresh_alt", 0),
                getattr(self, "refresh_last", 1),
                bool(self.use_bilinear), self.w, self.h)
        self._pending = self._dispatch_pool.submit(self._worker_dispatch,
                                                   np_args, meta)

    def _worker_dispatch(self, np_args, meta):
        """Dispatch-worker thread: upload, run the device programs, build
        the DeviceFrame, apply the reference-ring swap (handles only)."""
        (R, C, simple_lf, do_lf, frame_type, copy_to_arf, copy_to_gf,
         refresh_golden, refresh_alt, refresh_last, use_bilinear,
         w, h) = meta
        (u8b, i16b, qc_vals, qc_idx, escb, bmodes, taps,
         bflags, obb, spb, sqb) = np_args
        tdev = self._taps_dev.get(use_bilinear)
        if tdev is None:
            tdev = jnp.asarray(np.asarray(taps, np.int32))
            self._taps_dev[use_bilinear] = tdev
        up = [u8b, i16b, qc_vals, escb, bmodes, bflags, obb, spb, sqb]
        if qc_idx is not None:
            up.append(qc_idx)
        dev = jax.device_put(up)
        qc_idx_d = dev.pop() if qc_idx is not None else None
        (u8b, i16b, qc_vals, escb, bmodes, bflags, obb, spb, sqb) = dev
        if isinstance(bmodes, (tuple, list)):
            bmodes = _expand_bmodes(R * C, *bmodes)
        ref_y = jnp.stack([self.last.y, self.golden.y, self.altref.y])
        ref_u = jnp.stack([self.last.u, self.golden.u, self.altref.u])
        ref_v = jnp.stack([self.last.v, self.golden.v, self.altref.v])
        cy, cu, cv = decode_frame_device(
            R, C, simple_lf, do_lf, jax.default_backend() == "cpu",
            ref_y, ref_u, ref_v, u8b, i16b, qc_vals, qc_idx_d, escb,
            bmodes, tdev, bflags, obb, spb, sqb)
        cur = DeviceFrame(cy, cu, cv, w, h)
        if frame_type == 0:
            self.golden = self.altref = self.last = cur
        else:
            if copy_to_arf == 1:
                self.altref = self.last
            elif copy_to_arf == 2:
                self.altref = self.golden
            if copy_to_gf == 1:
                self.golden = self.last
            elif copy_to_gf == 2:
                self.golden = self.altref
            if refresh_golden:
                self.golden = cur
            if refresh_alt:
                self.altref = cur
            if refresh_last:
                self.last = cur
        return cur

    def _swap_and_filter(self):
        # device-side swap runs on the dispatch worker; here only the
        # entropy-context restore (sequential with the entropy thread)
        self.frame_to_show = FrameFuture(self._pending)
        if not self.refresh_entropy:
            self.fc = self.lfc.copy()

    # -- host array prep ---------------------------------------------------

    def _prep_arrays(self):
        R, C = self.mb_rows, self.mb_cols
        N = R * C
        mode = self.mode[1:, 1:].reshape(N).astype(np.uint8)
        uv_mode = self.uv_mode.reshape(N).astype(np.uint8)
        ref_frame = self.ref_frame[1:, 1:].reshape(N)
        intra = (ref_frame == INTRA_FRAME)
        ref_idx = np.clip(ref_frame - 1, 0, 2).astype(np.uint8)
        # B_PRED sub-block modes: bucket-compacted (usually few B_PRED MBs
        # per inter frame; [N,16] u8 is 130KB of tunnel per frame at 1080p),
        # expanded on device by _expand_bmodes.
        bp_mbs = np.nonzero(mode == B_PRED)[0]
        nbp = len(bp_mbs)
        if nbp < N // 8:
            Bp = 256
            while Bp < nbp:
                Bp *= 8
            b_idx = np.full(Bp, N, np.int32)
            b_idx[:nbp] = bp_mbs
            b_rows = np.zeros((Bp, 16), np.uint8)
            b_rows[:nbp] = self.bmode[1:, 1:].reshape(N, 16)[bp_mbs]
            bmodes = (b_idx, b_rows)
        else:
            bmodes = self.bmode[1:, 1:].reshape(N, 16).astype(np.uint8)
        qcoeff = np.ascontiguousarray(self.qcoeff.reshape(N, 25, 16),
                                      dtype=np.int16)
        # coefficient transfer packing: 4-bit nibbles (levels are almost
        # always in [-8, 7]) with a sparse escape list for the rest, and
        # block-compaction when most blocks are all-zero.  Bucket-padded to
        # keep the compiled-shape set small.  Cuts the per-frame upload 4x —
        # the host->TPU tunnel is the decode bottleneck in this deployment.
        # The compaction scan itself is in C++ (vp8e_pack_coeffs): the numpy
        # any/flatnonzero/fancy-index chain was ~20ms/frame at 1080p, the
        # single biggest host cost on the decode critical path.
        qflat = qcoeff.reshape(N * 25, 16)
        cap = N * 25
        qc_vals = qc_idx = escb = None
        lib = None
        if self.use_native:
            from ..utils import native
            lib = native.get_lib()
        if lib is not None:
            from ..utils.native import pack_coeffs_native
            packed = pack_coeffs_native(lib, qflat)
            if packed is not None:
                bitmap, nibK, eidx, eval_ = packed
                K = len(nibK)
                Kp = max(1024, cap // 8)
                while Kp < K:
                    Kp *= 2
                Kp = min(Kp, cap)
                qc_vals = np.empty((Kp, 8), np.uint8)
                qc_vals[:K] = nibK          # padding rows never gathered
                qc_idx = bitmap.copy()      # u8 dtype selects bitmap format
                E = len(eidx)
                Ep = 1024
                while Ep < E:
                    Ep *= 8
                escb = np.zeros((Ep, 2), np.int32)
                escb[:E, 0] = eidx
                escb[:E, 1] = eval_
                escb[E:, 0] = Kp * 16
        if qc_vals is None:
            nzb = np.flatnonzero(qflat.any(axis=1))
            K = len(nzb)
            if K >= cap // 4:
                sel, qc_idx = qflat, None
            else:
                Kp = max(1024, cap // 8)
                while Kp < K:
                    Kp *= 2
                Kp = min(Kp, cap)
                sel = np.zeros((Kp, 16), np.int16)
                qc_idx = np.full(Kp, cap, np.int32)
                sel[:K] = qflat[nzb]
                qc_idx[:K] = nzb
            nib = np.clip(sel + 8, 0, 15).astype(np.uint8)
            qc_vals = nib[:, 0::2] | (nib[:, 1::2] << 4)      # [rows, 8] u8
            esc_r, esc_c = np.nonzero((sel < -8) | (sel > 7))
            E = len(esc_r)
            Ep = 1024
            while Ep < E:
                Ep *= 8
            escb = np.zeros((Ep, 2), np.int32)
            escb[:E, 0] = esc_r * 16 + esc_c
            escb[:E, 1] = sel[esc_r, esc_c]
            escb[E:, 0] = sel.shape[0] * 16
        y2_big = np.ascontiguousarray(self.eobs.reshape(N, 25)[:, 24] > 1)
        has_y2 = np.logical_and(mode != B_PRED, mode != SPLITMV)

        # per-MB dequant vectors (mb_init_dequantizer, decodframe.c:67-109):
        # at most 4 segment variants, gathered by segment id
        segs = self.seg_map.reshape(N)
        base_dq = dequant_factors(self.base_qindex, self.y1dc_d, self.y2dc_d,
                                  self.y2ac_d, self.uvdc_d, self.uvac_d)
        if self.segmentation_enabled:
            seg_dq = {}
            per_seg = [self._mb_dequant_seg(s, base_dq, seg_dq)
                       for s in range(4)]
            tab = np.asarray(per_seg, np.int32)  # [4, 3, 2]
            dq_y1 = tab[segs, 0]
            dq_y2 = tab[segs, 1]
            dq_uv = tab[segs, 2]
        else:
            dq_y1 = np.broadcast_to(np.asarray(base_dq[0], np.int32),
                                    (N, 2)).copy()
            dq_y2 = np.broadcast_to(np.asarray(base_dq[1], np.int32),
                                    (N, 2)).copy()
            dq_uv = np.broadcast_to(np.asarray(base_dq[2], np.int32),
                                    (N, 2)).copy()

        y_mv, uv_mv = self._prep_mvs()

        taps = P.BILINEAR_AS_SIXTAP if self.use_bilinear else P.SIXTAP_TABLE

        # loop filter per-MB params, all table gathers
        flevel = np.zeros(N, np.uint8)
        hev_a = np.zeros(N, np.uint8)
        mblim_a = np.zeros(N, np.uint8)
        blim_a = np.zeros(N, np.uint8)
        lim_a = np.zeros(N, np.uint8)
        noskip_a = np.zeros(N, bool)
        if self.filter_level:
            lim, blim, mblim = self._lf_limits()
            lvl = self._lf_levels()
            mode_lut = np.zeros(10, np.int32)
            for k, v in self._MODE_LF_LUT.items():
                mode_lut[k] = v
            hev_lut = np.asarray([self._hev_threshold(f) for f in range(64)],
                                 np.int32)
            mi = mode_lut[mode]
            flevel = lvl[segs, ref_frame, mi].astype(np.uint8)
            hev_a = hev_lut[flevel].astype(np.uint8)
            mblim_a = mblim[flevel].astype(np.uint8)
            blim_a = blim[flevel].astype(np.uint8)
            lim_a = lim[flevel].astype(np.uint8)
            noskip_a = ~(has_y2 & (self.skip.reshape(N) != 0))

        # SPLITMV fixup worklists, bucket-padded so device shapes stay in a
        # small set of compiled variants
        split_mbs = np.nonzero(mode == SPLITMV)[0]
        ns = len(split_mbs)

        def bucket(n):
            # coarse buckets keep the compiled-variant count at <=3 per
            # geometry (each new shape costs a full XLA compile)
            for b in (2048, max(4096, N), 16 * N):
                if n <= b:
                    return b
            return 16 * N

        if ns:
            S = bucket(ns * 16)
            spb = np.zeros((S, 5), np.int32)
            k = ns * 16
            spb[:k, 0] = np.repeat(split_mbs, 16)
            spb[:k, 1] = np.tile(np.arange(16), ns)
            spb[:k, 2:4] = y_mv[spb[:k, 0], spb[:k, 1]]
            spb[:k, 4] = 1
            S2 = bucket(ns * 4)
            sqb = np.zeros((S2, 5), np.int32)
            k = ns * 4
            sqb[:k, 0] = np.repeat(split_mbs, 4)
            sqb[:k, 1] = np.tile(np.arange(4), ns)
            sqb[:k, 2:4] = uv_mv[sqb[:k, 0], sqb[:k, 1]]
            sqb[:k, 4] = 1
        else:
            spb = np.zeros((0, 5), np.int32)
            sqb = np.zeros((0, 5), np.int32)

        mv0 = np.ascontiguousarray(y_mv[:, 0, :], dtype=np.int32)
        uvmv0 = np.ascontiguousarray(uv_mv[:, 0, :], dtype=np.int32)
        dq_y1 = dq_y1.astype(np.int16)
        dq_y2 = dq_y2.astype(np.int16)
        dq_uv = dq_uv.astype(np.int16)

        # dense-MC exclusion mask + out-of-band fixup worklist
        # (mc_dense.py handles |MV| within the band bounds and windows inside
        # the bordered plane; everything else runs the windowed-gather path)
        from ..ops import mc_dense as MD
        HP, WP = R * 16 + 2 * B, C * 16 + 2 * B
        HPc, WPc = R * 8 + 2 * B2, C * 8 + 2 * B2
        nidx = np.arange(N)
        rr, cc = nidx // C, nidx % C
        ok_y = MD.window_in_bounds(mv0[:, 1] >> 3, mv0[:, 0] >> 3, rr, cc,
                                   R, C, 16, B, HP, WP)
        ok_c = MD.window_in_bounds(uvmv0[:, 1] >> 3, uvmv0[:, 0] >> 3, rr,
                                   cc, R, C, 8, B2, HPc, WPc)
        inter_m = ~intra
        is_split = mode == SPLITMV
        ob_mask = inter_m & ~is_split & ~(ok_y & ok_c)
        dense_m = (inter_m & ~is_split & ~ob_mask)[:, None]
        ob_mbs = np.nonzero(ob_mask)[0]
        nob = len(ob_mbs)
        if nob:
            S = 128
            while S < nob:
                S *= 8
            obb = np.zeros((S, 6), np.int32)
            obb[:nob, 0] = ob_mbs
            obb[:nob, 1:3] = mv0[ob_mbs]
            obb[:nob, 3:5] = uvmv0[ob_mbs]
            obb[:nob, 5] = 1
        else:
            obb = np.zeros((0, 6), np.int32)
        mv0 = np.where(dense_m, mv0, 0).astype(np.int16)
        uvmv0 = np.where(dense_m, uvmv0, 0).astype(np.int16)

        # per-diagonal B_PRED presence flags (scalar-prefetched by the
        # Pallas intra kernel to gate the 16-step sub-block recursion)
        Dp = 2 * (R - 1) + C
        bflags = np.zeros(Dp, np.int32)
        isb = (mode == B_PRED) & intra
        bflags[2 * rr[isb] + cc[isb]] = 1

        # metadata bundles: two uploads instead of ~20
        u8b = np.empty((12, N), np.uint8)
        u8b[U8_REF] = ref_idx
        u8b[U8_MODE] = mode
        u8b[U8_UVMODE] = uv_mode
        u8b[U8_INTRA] = intra
        u8b[U8_HASY2] = has_y2
        u8b[U8_Y2BIG] = y2_big
        u8b[U8_FLEVEL] = flevel
        u8b[U8_MBLIM] = mblim_a
        u8b[U8_BLIM] = blim_a
        u8b[U8_LIM] = lim_a
        u8b[U8_HEV] = hev_a
        u8b[U8_NOSKIP] = noskip_a
        i16b = np.empty((10, N), np.int16)
        i16b[I16_MVY] = mv0[:, 0]
        i16b[I16_MVX] = mv0[:, 1]
        i16b[I16_UVMVY] = uvmv0[:, 0]
        i16b[I16_UVMVX] = uvmv0[:, 1]
        i16b[I16_DQY1DC:I16_DQY1AC + 1] = dq_y1.T
        i16b[I16_DQY2DC:I16_DQY2AC + 1] = dq_y2.T
        i16b[I16_DQUVDC:I16_DQUVAC + 1] = dq_uv.T
        return (u8b, i16b, qc_vals, qc_idx, escb, bmodes,
                np.asarray(taps, np.int32), bflags, obb, spb, sqb)

    def _mb_dequant_seg(self, seg, base_dq, cache):
        """Per-segment dequant variant (mb_init_dequantizer decodframe.c:74-89)."""
        if self.mb_segment_abs_delta:
            q = int(self.segment_feature_data[0, seg])
        else:
            q = min(127, max(0, self.base_qindex +
                             int(self.segment_feature_data[0, seg])))
        if q not in cache:
            cache[q] = dequant_factors(q, self.y1dc_d, self.y2dc_d,
                                       self.y2ac_d, self.uvdc_d, self.uvac_d)
        return cache[q]

    def _prep_mvs(self):
        """Clamped per-tile MVs (the host half of vp8_build_inter_predictors_mb
        reconinter.c:384-593: UMV clamping + chroma MV derivation).
        Vectorized for the common non-SPLITMV case; SPLITMV MBs (rare) loop.
        """
        R, C = self.mb_rows, self.mb_cols
        N = R * C
        mode = self.mode[1:, 1:].reshape(N)
        inter = self.ref_frame[1:, 1:].reshape(N) != INTRA_FRAME
        mrow = self.mv[1:, 1:, 0].reshape(N).astype(np.int64)
        mcol = self.mv[1:, 1:, 1].reshape(N).astype(np.int64)
        nclamp = self.need_clamp.reshape(N) != 0
        cidx = np.arange(N) % C
        ridx = np.arange(N) // C
        m2l = -(cidx * 16) << 3
        m2r = ((C - 1 - cidx) * 16) << 3
        m2t = -(ridx * 16) << 3
        m2b = ((R - 1 - ridx) * 16) << 3
        fullmask = 0xFFFFFFF8 if self.full_pixel else 0xFFFFFFFF

        def fpmask_v(v):
            w = (v & fullmask & 0xFFFF).astype(np.int64)
            return np.where(w >= 0x8000, w - 0x10000, w)

        def clamp_umv_v(row, col):
            col = np.where(col < m2l - (19 << 3), m2l - (16 << 3),
                           np.where(col > m2r + (18 << 3), m2r + (16 << 3),
                                    col))
            row = np.where(row < m2t - (19 << 3), m2t - (16 << 3),
                           np.where(row > m2b + (18 << 3), m2b + (16 << 3),
                                    row))
            return row, col

        crow, ccol = clamp_umv_v(mrow, mcol)
        crow = np.where(nclamp, crow, mrow)
        ccol = np.where(nclamp, ccol, mcol)
        # chroma derivation (reconinter.c:418-424): toward-zero halving
        def half_tz(v):
            w = v + np.where(v >= 0, 1, -1)
            return np.where(w >= 0, w // 2, -((-w) // 2))

        urow = fpmask_v(half_tz(crow))
        ucol = fpmask_v(half_tz(ccol))

        y_mv = np.zeros((N, 16, 2), np.int32)
        uv_mv = np.zeros((N, 4, 2), np.int32)
        y_mv[:, :, 0] = np.where(inter, crow, 0)[:, None]
        y_mv[:, :, 1] = np.where(inter, ccol, 0)[:, None]
        uv_mv[:, :, 0] = np.where(inter, urow, 0)[:, None]
        uv_mv[:, :, 1] = np.where(inter, ucol, 0)[:, None]

        # SPLITMV MBs: per-sub-block MVs (loop; typically few per frame)
        for n in np.nonzero(mode == SPLITMV)[0]:
            r, c = int(n) // C, int(n) % C
            pr, pc = r + 1, c + 1
            l2, r2, t2, b2 = int(m2l[n]), int(m2r[n]), int(m2t[n]), int(m2b[n])
            nc = bool(nclamp[n])

            def clamp_umv(mv):
                row, col = mv
                if col < l2 - (19 << 3):
                    col = l2 - (16 << 3)
                elif col > r2 + (18 << 3):
                    col = r2 + (16 << 3)
                if row < t2 - (19 << 3):
                    row = t2 - (16 << 3)
                elif row > b2 + (18 << 3):
                    row = b2 + (16 << 3)
                return row, col

            def clamp_uvmv(mv):
                row, col = mv
                col = ((l2 - (16 << 3)) >> 1) if 2 * col < l2 - (19 << 3) \
                    else col
                col = ((r2 + (16 << 3)) >> 1) if 2 * col > r2 + (18 << 3) \
                    else col
                row = ((t2 - (16 << 3)) >> 1) if 2 * row < t2 - (19 << 3) \
                    else row
                row = ((b2 + (16 << 3)) >> 1) if 2 * row > b2 + (18 << 3) \
                    else row
                return row, col

            def fpmask(v):
                return _s16(v & fullmask & 0xFFFF)

            bmv = [(int(self.bmv[pr, pc, i, 0]), int(self.bmv[pr, pc, i, 1]))
                   for i in range(16)]
            for i in range(16):
                y_mv[n, i] = clamp_umv(bmv[i]) if nc else bmv[i]
            for i in range(2):
                for jq in range(2):
                    yoffs = i * 8 + jq * 2
                    tr = sum(bmv[yoffs + k][0] for k in (0, 1, 4, 5))
                    tc = sum(bmv[yoffs + k][1] for k in (0, 1, 4, 5))
                    tr = tr + 4 + (-8 if tr < 0 else 0)
                    tc = tc + 4 + (-8 if tc < 0 else 0)
                    mr = fpmask(tr // 8 if tr >= 0 else -((-tr) // 8))
                    mc = fpmask(tc // 8 if tc >= 0 else -((-tc) // 8))
                    if nc:
                        mr, mc = clamp_uvmv((mr, mc))
                    uv_mv[n, i * 2 + jq] = (mr, mc)
        return y_mv, uv_mv


def decode_ivf_tpu(path_or_bytes, limit=None):
    from ..utils.ivf import read_ivf
    stream = read_ivf(path_or_bytes)
    dec = TPUDecoder()
    count = 0
    for payload, _pts in stream.frames:
        show, planes = dec.decode_frame(payload)
        if show:
            yield planes
            count += 1
            if limit and count >= limit:
                return
