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


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def decode_frame_device(R, C, simple_lf, do_lf,
                        ref_y, ref_u, ref_v, ref_idx,
                        qc_vals, qc_idx, y2_big, dq_y1, dq_y2, dq_uv, has_y2,
                        intra, mode, uv_mode, bmodes,
                        mv0, uvmv0, taps,
                        sp_mb, sp_tile, sp_mv, sp_valid,
                        sq_mb, sq_quad, sq_mv, sq_valid,
                        flevel, mblim_a, blim_a, lim_a, hev_a, noskip_a):
    """One frame: residuals → MC → intra wavefront → LF wavefront → extend."""
    from . import wavefront as wf
    N = R * C
    HP, WP = R * 16 + 2 * B, C * 16 + 2 * B
    HPc, WPc = R * 8 + 2 * B2, C * 8 + 2 * B2
    sch = wf.schedule(R, C)
    # widen the narrow transfer dtypes on-device
    ref_idx = ref_idx.astype(jnp.int32)
    mode = mode.astype(jnp.int32)
    uv_mode = uv_mode.astype(jnp.int32)
    bmodes = bmodes.astype(jnp.int32)
    mv0 = mv0.astype(jnp.int32)
    uvmv0 = uvmv0.astype(jnp.int32)
    flevel = flevel.astype(jnp.int32)
    mblim_a = mblim_a.astype(jnp.int32)
    blim_a = blim_a.astype(jnp.int32)
    lim_a = lim_a.astype(jnp.int32)
    hev_a = hev_a.astype(jnp.int32)

    # 1. residuals (as per-MB block images)
    # coefficients arrive block-compacted (most blocks are all-zero);
    # densify with one scatter (padding rows carry an out-of-range index)
    if qc_idx is None:
        qcoeff = qc_vals.reshape(N, 25, 16)
    else:
        dense = jnp.zeros((N * 25, 16), jnp.int16)
        dense = dense.at[qc_idx].set(qc_vals, mode="drop",
                                     unique_indices=True)
        qcoeff = dense.reshape(N, 25, 16)
    ry, ru, rv = tf.compute_residuals(qcoeff, y2_big, dq_y1, dq_y2, dq_uv,
                                      has_y2)
    resid_y_b = _blk4_to_mb(ry, 4)
    resid_u_b = _blk4_to_mb(ru, 2)
    resid_v_b = _blk4_to_mb(rv, 2)

    # 2. batched inter prediction — uniform-MV fast path: one (bw+5)^2
    # gather per MB; SPLITMV sub-block MVs fixed up by a second, sparse pass
    mb = jnp.arange(N)
    mb_r, mb_c = mb // C, mb % C
    sy = B + mb_r * 16 + (mv0[:, 0] >> 3)
    sx = B + mb_c * 16 + (mv0[:, 1] >> 3)
    mc_y = P.mc_predict_blocks(ref_y, ref_idx, jnp.stack([sy, sx], 1),
                               mv0[:, 1] & 7, mv0[:, 0] & 7, taps, 16)
    cmv0 = uvmv0
    csy = B2 + mb_r * 8 + (cmv0[:, 0] >> 3)
    csx = B2 + mb_c * 8 + (cmv0[:, 1] >> 3)
    cstarts = jnp.stack([csy, csx], 1)
    mc_u = P.mc_predict_blocks(ref_u, ref_idx, cstarts, cmv0[:, 1] & 7,
                               cmv0[:, 0] & 7, taps, 8)
    mc_v = P.mc_predict_blocks(ref_v, ref_idx, cstarts, cmv0[:, 1] & 7,
                               cmv0[:, 0] & 7, taps, 8)

    # SPLITMV fixup (sparse; sp_* arrays are bucket-padded on the host)
    if sp_mb.shape[0] > 0:
        n_ = sp_mb
        k_ = sp_tile
        smv = sp_mv.astype(jnp.int32)
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
        nq = sq_mb
        q_ = sq_quad
        qmv = sq_mv.astype(jnp.int32)
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

    inter_y = jnp.clip(mc_y + resid_y_b, 0, 255)
    inter_u = jnp.clip(mc_u + resid_u_b, 0, 255)
    inter_v = jnp.clip(mc_v + resid_v_b, 0, 255)

    # 3+4. intra wavefront over diagonal-major block stores
    yb, ub, vb = wf.intra_recon_blocks(R, C, sch, inter_y, inter_u, inter_v,
                                       resid_y_b, resid_u_b, resid_v_b,
                                       mode, uv_mode, intra, bmodes)

    # 5. loop filter wavefront
    if do_lf:
        yb, ub, vb = wf.loop_filter_blocks(R, C, sch, simple_lf, yb, ub, vb,
                                           flevel, mblim_a, blim_a, lim_a,
                                           hev_a, noskip_a)

    # 6. plane assembly + border extension
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


# ---------------------------------------------------------------------------
# host integration

class DeviceFrame:
    """Device-resident frame with the FrameBuffer interface pieces the
    decoder lifecycle uses."""

    def __init__(self, y, u, v, w, h):
        self.y, self.u, self.v = y, u, v
        self.w, self.h = w, h

    def visible(self):
        ch, cw = (self.h + 1) // 2, (self.w + 1) // 2
        y, u, v = jax.device_get((self.y[B:B + self.h, B:B + self.w],
                                  self.u[B2:B2 + ch, B2:B2 + cw],
                                  self.v[B2:B2 + ch, B2:B2 + cw]))
        return y, u, v


class TPUDecoder(RefDecoder):
    """VP8 decoder with the pixel pipeline on the TPU.

    Reuses RefDecoder's host entropy layer (headers, mode/MV, detokenize —
    C++-accelerated by default) and replaces reconstruction + loop filter +
    borders with one jitted device program per frame geometry.
    """

    use_native = True

    def _alloc(self):
        super()._alloc()
        R, C = self.mb_rows, self.mb_cols
        HP, WP = R * 16 + 2 * B, C * 16 + 2 * B
        HPc, WPc = R * 8 + 2 * B2, C * 8 + 2 * B2
        z = DeviceFrame(jnp.zeros((HP, WP), jnp.uint8),
                        jnp.zeros((HPc, WPc), jnp.uint8),
                        jnp.zeros((HPc, WPc), jnp.uint8), self.w, self.h)
        self.last = self.golden = self.altref = z

    def _reconstruct(self):
        self._detokenize_all()
        args = self._prep_arrays()
        cy, cu, cv = decode_frame_device(
            self.mb_rows, self.mb_cols, bool(self.simple_filter),
            self.filter_level > 0, *args)
        self.cur = DeviceFrame(cy, cu, cv, self.w, self.h)

    def _swap_and_filter(self):
        # swap logic only — LF/extension already ran on device
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

    # -- host array prep ---------------------------------------------------

    def _prep_arrays(self):
        R, C = self.mb_rows, self.mb_cols
        N = R * C
        mode = self.mode[1:, 1:].reshape(N).astype(np.uint8)
        uv_mode = self.uv_mode.reshape(N).astype(np.uint8)
        ref_frame = self.ref_frame[1:, 1:].reshape(N)
        intra = (ref_frame == INTRA_FRAME)
        ref_idx = np.clip(ref_frame - 1, 0, 2).astype(np.uint8)
        bmodes = self.bmode[1:, 1:].reshape(N, 16).astype(np.uint8)
        qcoeff = np.ascontiguousarray(self.qcoeff.reshape(N, 25, 16),
                                      dtype=np.int16)
        # block-compact the coefficients for transfer (most blocks are zero);
        # bucket-padded to keep the compiled-shape set small
        qflat = qcoeff.reshape(N * 25, 16)
        nzb = np.flatnonzero(qflat.any(axis=1))
        K = len(nzb)
        cap = N * 25
        if K >= cap // 2:
            qc_vals, qc_idx = qflat, None
        else:
            Kp = max(1024, cap // 8)
            while Kp < K:
                Kp *= 2
            Kp = min(Kp, cap)
            qc_vals = np.zeros((Kp, 16), np.int16)
            qc_idx = np.full(Kp, cap, np.int32)
            qc_vals[:K] = qflat[nzb]
            qc_idx[:K] = nzb
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
            sp_mb = np.zeros(S, np.int32)
            sp_tile = np.zeros(S, np.int32)
            sp_mv = np.zeros((S, 2), np.int16)
            sp_valid = np.zeros(S, bool)
            sp_mb[:ns * 16] = np.repeat(split_mbs, 16)
            sp_tile[:ns * 16] = np.tile(np.arange(16), ns)
            sp_mv[:ns * 16] = y_mv[sp_mb[:ns * 16], sp_tile[:ns * 16]]
            sp_valid[:ns * 16] = True
            S2 = bucket(ns * 4)
            sq_mb = np.zeros(S2, np.int32)
            sq_quad = np.zeros(S2, np.int32)
            sq_mv = np.zeros((S2, 2), np.int16)
            sq_valid = np.zeros(S2, bool)
            sq_mb[:ns * 4] = np.repeat(split_mbs, 4)
            sq_quad[:ns * 4] = np.tile(np.arange(4), ns)
            sq_mv[:ns * 4] = uv_mv[sq_mb[:ns * 4], sq_quad[:ns * 4]]
            sq_valid[:ns * 4] = True
        else:
            sp_mb = np.zeros(0, np.int32)
            sp_tile = np.zeros(0, np.int32)
            sp_mv = np.zeros((0, 2), np.int16)
            sp_valid = np.zeros(0, bool)
            sq_mb = np.zeros(0, np.int32)
            sq_quad = np.zeros(0, np.int32)
            sq_mv = np.zeros((0, 2), np.int16)
            sq_valid = np.zeros(0, bool)

        mv0 = np.ascontiguousarray(y_mv[:, 0, :], dtype=np.int16)
        uvmv0 = np.ascontiguousarray(uv_mv[:, 0, :], dtype=np.int16)
        dq_y1 = dq_y1.astype(np.int16)
        dq_y2 = dq_y2.astype(np.int16)
        dq_uv = dq_uv.astype(np.int16)

        ref_y = jnp.stack([self.last.y, self.golden.y, self.altref.y])
        ref_u = jnp.stack([self.last.u, self.golden.u, self.altref.u])
        ref_v = jnp.stack([self.last.v, self.golden.v, self.altref.v])
        j = jnp.asarray
        return (ref_y, ref_u, ref_v, j(ref_idx), j(qc_vals),
                None if qc_idx is None else j(qc_idx), j(y2_big),
                j(dq_y1), j(dq_y2), j(dq_uv), j(has_y2), j(intra), j(mode),
                j(uv_mode), j(bmodes), j(mv0), j(uvmv0),
                j(np.asarray(taps, np.int32)),
                j(sp_mb), j(sp_tile), j(sp_mv), j(sp_valid),
                j(sq_mb), j(sq_quad), j(sq_mv),
                j(sq_valid), j(flevel), j(mblim_a),
                j(blim_a), j(lim_a), j(hev_a), j(noskip_a))

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
