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

@functools.lru_cache(maxsize=16)
def diagonals(R, C):
    """Offset-2 anti-diagonals: MB (r, c) is scheduled at level d = 2r + c
    (the reference CL loop filter's priority-level scheme,
    loopfilter_cl.c:417-439,545). Returns (diag_r, diag_c) [D, M] int32
    with sentinel 10**6 for empty lanes."""
    D = 2 * (R - 1) + C
    M = min(R, C // 2 + 1)
    diag_r = np.full((D, M), 10**6, dtype=np.int32)
    diag_c = np.full((D, M), 10**6, dtype=np.int32)
    for d in range(D):
        lane = 0
        rlo = max(0, (d - C + 1 + 1) // 2)
        rhi = min(R - 1, d // 2)
        for r in range(rlo, rhi + 1):
            c = d - 2 * r
            if 0 <= c < C:
                diag_r[d, lane] = r
                diag_c[d, lane] = c
                lane += 1
    return diag_r, diag_c


# ---------------------------------------------------------------------------
# device pipeline

def _set_intra_borders(plane, pad, aw, ah):
    """setup_intra_recon (setupintrarecon.c): 127 above, 129 left."""
    plane = plane.at[pad - 1, pad - 1:pad + aw + 4].set(127)
    plane = plane.at[pad:pad + ah, pad - 1].set(129)
    return plane


def _extend_borders(plane, pad, aw, ah):
    """vp8_yv12_extend_frame_borders (yv12extend.c:23-145)."""
    plane = plane.at[pad:pad + ah, :pad].set(plane[pad:pad + ah, pad:pad + 1])
    plane = plane.at[pad:pad + ah, pad + aw:].set(
        plane[pad:pad + ah, pad + aw - 1:pad + aw])
    plane = plane.at[:pad, :].set(plane[pad:pad + 1, :])
    plane = plane.at[pad + ah:, :].set(plane[pad + ah - 1:pad + ah, :])
    return plane


def _recon_step(R, C, planes, xs, resid_y, resid_u, resid_v,
                mode, uv_mode, intra, bmodes):
    """One wavefront level of intra reconstruction."""
    cy, cu, cv = planes
    diag_r, diag_c = xs

    def lane(r, c):
        valid = r < R
        rc = jnp.where(valid, r, 0)
        cc = jnp.where(valid, c, 0)
        n = rc * C + cc
        y0 = B + rc * 16
        x0 = B + cc * 16
        qy0 = B2 + rc * 8
        qx0 = B2 + cc * 8
        # ---- luma ----
        above_ext = jax.lax.dynamic_slice(cy, (y0 - 1, x0 - 1),
                                          (1, 21))[0].astype(jnp.int32)
        # above-right for the last MB column: replicate x0+15 (the
        # vp8_extend_mb_row semantics, extend.c:160-186)
        last_col = cc == C - 1
        tail = jnp.where(last_col,
                         jnp.full((4,), 1, jnp.int32) * above_ext[16],
                         above_ext[17:21])
        above_ext = above_ext.at[17:21].set(tail)
        left_col = jax.lax.dynamic_slice(cy, (y0, x0 - 1),
                                         (16, 1))[:, 0].astype(jnp.int32)
        tl = above_ext[0]
        rblk = jax.lax.dynamic_slice(resid_y, (rc * 16, cc * 16), (16, 16))
        pred16 = P.pred_nxn(mode[n], above_ext[1:17], left_col, tl,
                            rc != 0, cc != 0, 16)
        rec16 = jnp.clip(pred16 + rblk, 0, 255)
        # B_PRED workspace [17, 21]
        ws = jnp.zeros((17, 21), jnp.int32)
        ws = ws.at[0, :].set(above_ext)
        ws = ws.at[1:17, 0].set(left_col)
        ws = ws.at[4, 17:21].set(above_ext[17:21])
        ws = ws.at[8, 17:21].set(above_ext[17:21])
        ws = ws.at[12, 17:21].set(above_ext[17:21])

        def bstep(k, ws):
            ir = k >> 2
            ic = k & 3
            above8 = jax.lax.dynamic_slice(ws, (4 * ir, 1 + 4 * ic),
                                           (1, 8))[0]
            left4 = jax.lax.dynamic_slice(ws, (1 + 4 * ir, 4 * ic),
                                          (4, 1))[:, 0]
            tl4 = jax.lax.dynamic_slice(ws, (4 * ir, 4 * ic), (1, 1))[0, 0]
            blk = P.bpred_4x4(bmodes[n, k], above8, left4, tl4)
            rsub = jax.lax.dynamic_slice(rblk, (4 * ir, 4 * ic), (4, 4))
            blk = jnp.clip(blk + rsub, 0, 255)
            return jax.lax.dynamic_update_slice(ws, blk,
                                                (1 + 4 * ir, 1 + 4 * ic))

        ws = jax.lax.fori_loop(0, 16, bstep, ws)
        recB = ws[1:17, 1:17]
        yblk = jnp.where(mode[n] == B_PRED, recB, rec16)
        # ---- chroma ----
        def chroma(cpl, resid_pl):
            a = jax.lax.dynamic_slice(cpl, (qy0 - 1, qx0 - 1),
                                      (1, 9))[0].astype(jnp.int32)
            l = jax.lax.dynamic_slice(cpl, (qy0, qx0 - 1),
                                      (8, 1))[:, 0].astype(jnp.int32)
            rb = jax.lax.dynamic_slice(resid_pl, (rc * 8, cc * 8), (8, 8))
            pd = P.pred_nxn(uv_mode[n], a[1:9], l, a[0], rc != 0, cc != 0, 8)
            return jnp.clip(pd + rb, 0, 255)

        ublk = chroma(cu, resid_u)
        vblk = chroma(cv, resid_v)
        write = valid & intra[n]
        return yblk, ublk, vblk, write, rc, cc

    yb, ub, vb, write, rr, cc = jax.vmap(lane)(diag_r, diag_c)
    # scatter (out-of-bounds rows are dropped for non-writing lanes)
    ar16 = jnp.arange(16)
    y0 = jnp.where(write, B + rr * 16, cy.shape[0])
    x0 = B + cc * 16
    rows = y0[:, None, None] + ar16[None, :, None]
    cols = x0[:, None, None] + ar16[None, None, :]
    cy = cy.at[rows, cols].set(yb.astype(cy.dtype), mode="drop",
                               unique_indices=True)
    ar8 = jnp.arange(8)
    qy0 = jnp.where(write, B2 + rr * 8, cu.shape[0])
    qx0 = B2 + cc * 8
    rows8 = qy0[:, None, None] + ar8[None, :, None]
    cols8 = qx0[:, None, None] + ar8[None, None, :]
    cu = cu.at[rows8, cols8].set(ub.astype(cu.dtype), mode="drop",
                                 unique_indices=True)
    cv = cv.at[rows8, cols8].set(vb.astype(cv.dtype), mode="drop",
                                 unique_indices=True)
    return (cy, cu, cv), None


def _lf_patch_y(patch, ml, bl, il, hv, left_ok, top_ok, no_skip, active,
                simple):
    """Apply the 8 ordered edge groups of one MB to a [.., 24, 24] luma
    patch (vp8_loop_filter_frame per-MB body, loopfilter.c:245-305)."""
    def vert(patch, col, mb_edge, apply, blimit):
        pix8 = patch[..., 4:20, col - 4:col + 4]
        if simple:
            out = lf.simple_filter_edge(pix8, blimit[..., None], apply[..., None])
        else:
            out = lf.filter_edge(pix8, blimit[..., None], il[..., None],
                                 hv[..., None], mb_edge, apply[..., None])
        return patch.at[..., 4:20, col - 4:col + 4].set(out)

    def horz(patch, row, mb_edge, apply, blimit):
        pix8 = jnp.swapaxes(patch[..., row - 4:row + 4, 4:20], -1, -2)
        if simple:
            out = lf.simple_filter_edge(pix8, blimit[..., None], apply[..., None])
        else:
            out = lf.filter_edge(pix8, blimit[..., None], il[..., None],
                                 hv[..., None], mb_edge, apply[..., None])
        return patch.at[..., row - 4:row + 4, 4:20].set(
            jnp.swapaxes(out, -1, -2))

    patch = vert(patch, 4, True, active & left_ok, ml)
    for col in (8, 12, 16):
        patch = vert(patch, col, False, active & no_skip, bl)
    patch = horz(patch, 4, True, active & top_ok, ml)
    for row in (8, 12, 16):
        patch = horz(patch, row, False, active & no_skip, bl)
    return patch


def _lf_patch_uv(patch, ml, bl, il, hv, left_ok, top_ok, no_skip, active):
    """Chroma edges on a [.., 16, 16] patch (normal filter only —
    the simple filter is luma-only, loopfilter.c:288-303)."""
    def vert(patch, col, mb_edge, apply, blimit):
        pix8 = patch[..., 4:12, col - 4:col + 4]
        out = lf.filter_edge(pix8, blimit[..., None], il[..., None],
                             hv[..., None], mb_edge, apply[..., None])
        return patch.at[..., 4:12, col - 4:col + 4].set(out)

    def horz(patch, row, mb_edge, apply, blimit):
        pix8 = jnp.swapaxes(patch[..., row - 4:row + 4, 4:12], -1, -2)
        out = lf.filter_edge(pix8, blimit[..., None], il[..., None],
                             hv[..., None], mb_edge, apply[..., None])
        return patch.at[..., row - 4:row + 4, 4:12].set(
            jnp.swapaxes(out, -1, -2))

    patch = vert(patch, 4, True, active & left_ok, ml)
    patch = vert(patch, 8, False, active & no_skip, bl)
    patch = horz(patch, 4, True, active & top_ok, ml)
    patch = horz(patch, 8, False, active & no_skip, bl)
    return patch


def _lf_step(R, C, simple, planes, xs, flevel, mblim_a, blim_a, lim_a,
             hev_a, noskip_a):
    cy, cu, cv = planes
    diag_r, diag_c = xs

    def gather(r, c):
        valid = r < R
        rc = jnp.where(valid, r, 0)
        cc = jnp.where(valid, c, 0)
        n = rc * C + cc
        yp = jax.lax.dynamic_slice(cy, (B + rc * 16 - 4, B + cc * 16 - 4),
                                   (24, 24)).astype(jnp.int32)
        up = jax.lax.dynamic_slice(cu, (B2 + rc * 8 - 4, B2 + cc * 8 - 4),
                                   (16, 16)).astype(jnp.int32)
        vp = jax.lax.dynamic_slice(cv, (B2 + rc * 8 - 4, B2 + cc * 8 - 4),
                                   (16, 16)).astype(jnp.int32)
        return (yp, up, vp, n, rc, cc, valid)

    yp, up, vp, n, rr, cc, valid = jax.vmap(gather)(diag_r, diag_c)
    fl = flevel[n]
    active = valid & (fl > 0)
    ml, bl, il, hv = mblim_a[n], blim_a[n], lim_a[n], hev_a[n]
    no_skip = noskip_a[n]
    left_ok = cc > 0
    top_ok = rr > 0
    yp = _lf_patch_y(yp, ml, bl, il, hv, left_ok, top_ok, no_skip, active,
                     simple)
    if not simple:
        up = _lf_patch_uv(up, ml, bl, il, hv, left_ok, top_ok, no_skip,
                          active)
        vp = _lf_patch_uv(vp, ml, bl, il, hv, left_ok, top_ok, no_skip,
                          active)
    # scatter back
    a24 = jnp.arange(24)
    y0 = jnp.where(active, B + rr * 16 - 4, cy.shape[0])
    x0 = B + cc * 16 - 4
    rows = y0[:, None, None] + a24[None, :, None]
    cols = x0[:, None, None] + a24[None, None, :]
    cy = cy.at[rows, cols].set(yp.astype(cy.dtype), mode="drop",
                               unique_indices=True)
    if not simple:
        a16 = jnp.arange(16)
        qy0 = jnp.where(active, B2 + rr * 8 - 4, cu.shape[0])
        qx0 = B2 + cc * 8 - 4
        rows8 = qy0[:, None, None] + a16[None, :, None]
        cols8 = qx0[:, None, None] + a16[None, None, :]
        cu = cu.at[rows8, cols8].set(up.astype(cu.dtype), mode="drop",
                                     unique_indices=True)
        cv = cv.at[rows8, cols8].set(vp.astype(cv.dtype), mode="drop",
                                     unique_indices=True)
    return (cy, cu, cv), None


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def decode_frame_device(R, C, simple_lf, do_lf,
                        ref_y, ref_u, ref_v, ref_idx,
                        qcoeff, eobs, dq_y1, dq_y2, dq_uv, has_y2,
                        intra, mode, uv_mode, bmodes,
                        y_mv, uv_mv, taps,
                        sp_mb, sp_tile, sp_valid, sq_mb, sq_quad, sq_valid,
                        flevel, mblim_a, blim_a, lim_a, hev_a, noskip_a):
    """One frame: residuals → MC → intra wavefront → LF wavefront → extend."""
    N = R * C
    HP, WP = R * 16 + 2 * B, C * 16 + 2 * B
    HPc, WPc = R * 8 + 2 * B2, C * 8 + 2 * B2

    # 1. residuals
    ry, ru, rv = tf.compute_residuals(qcoeff, eobs, dq_y1, dq_y2, dq_uv,
                                      has_y2)
    resid_y = tf.blocks_to_plane(ry, R, C, 16)
    resid_u = tf.blocks_to_plane(ru, R, C, 8)
    resid_v = tf.blocks_to_plane(rv, R, C, 8)

    # 2. batched inter prediction — uniform-MV fast path: one (bw+5)^2
    # gather per MB; SPLITMV sub-block MVs fixed up by a second, sparse pass
    mb = jnp.arange(N)
    mb_r, mb_c = mb // C, mb % C
    mv0 = y_mv[:, 0, :]
    sy = B + mb_r * 16 + (mv0[:, 0] >> 3)
    sx = B + mb_c * 16 + (mv0[:, 1] >> 3)
    blocks = P.mc_predict_blocks(ref_y, ref_idx, jnp.stack([sy, sx], 1),
                                 mv0[:, 1] & 7, mv0[:, 0] & 7, taps, 16)
    pred_y = tf.mbs_to_plane(blocks, R, C, 16)
    cmv0 = uv_mv[:, 0, :]
    csy = B2 + mb_r * 8 + (cmv0[:, 0] >> 3)
    csx = B2 + mb_c * 8 + (cmv0[:, 1] >> 3)
    cstarts = jnp.stack([csy, csx], 1)
    ublocks = P.mc_predict_blocks(ref_u, ref_idx, cstarts, cmv0[:, 1] & 7,
                                  cmv0[:, 0] & 7, taps, 8)
    vblocks = P.mc_predict_blocks(ref_v, ref_idx, cstarts, cmv0[:, 1] & 7,
                                  cmv0[:, 0] & 7, taps, 8)
    pred_u = tf.mbs_to_plane(ublocks, R, C, 8)
    pred_v = tf.mbs_to_plane(vblocks, R, C, 8)

    # SPLITMV fixup (sparse; sp_* arrays are bucket-padded on the host)
    if sp_mb.shape[0] > 0:
        n_ = sp_mb
        k_ = sp_tile
        smv = y_mv[n_, k_]
        ty0 = B + (n_ // C) * 16 + (k_ >> 2) * 4 + (smv[:, 0] >> 3)
        tx0 = B + (n_ % C) * 16 + (k_ & 3) * 4 + (smv[:, 1] >> 3)
        tiles = P.mc_predict_tiles(ref_y, ref_idx[n_],
                                   jnp.stack([ty0, tx0], 1),
                                   smv[:, 1] & 7, smv[:, 0] & 7, taps)
        a4 = jnp.arange(4)
        rows = jnp.where(sp_valid, (n_ // C) * 16 + (k_ >> 2) * 4,
                         R * 16)[:, None, None] + a4[None, :, None]
        cols = ((n_ % C) * 16 + (k_ & 3) * 4)[:, None, None] + \
            a4[None, None, :]
        pred_y = pred_y.at[rows, cols].set(tiles, mode="drop",
                                           unique_indices=True)
        # chroma quadrants
        nq = sq_mb
        q_ = sq_quad
        qmv = uv_mv[nq, q_]
        qy0 = B2 + (nq // C) * 8 + (q_ >> 1) * 4 + (qmv[:, 0] >> 3)
        qx0 = B2 + (nq % C) * 8 + (q_ & 1) * 4 + (qmv[:, 1] >> 3)
        qstarts = jnp.stack([qy0, qx0], 1)
        uq = P.mc_predict_tiles(ref_u, ref_idx[nq], qstarts, qmv[:, 1] & 7,
                                qmv[:, 0] & 7, taps)
        vq = P.mc_predict_tiles(ref_v, ref_idx[nq], qstarts, qmv[:, 1] & 7,
                                qmv[:, 0] & 7, taps)
        qrows = jnp.where(sq_valid, (nq // C) * 8 + (q_ >> 1) * 4,
                          R * 8)[:, None, None] + a4[None, :, None]
        qcols = ((nq % C) * 8 + (q_ & 1) * 4)[:, None, None] + \
            a4[None, None, :]
        pred_u = pred_u.at[qrows, qcols].set(uq, mode="drop",
                                             unique_indices=True)
        pred_v = pred_v.at[qrows, qcols].set(vq, mode="drop",
                                             unique_indices=True)

    inter_y = jnp.clip(pred_y + resid_y, 0, 255).astype(jnp.uint8)
    inter_u = jnp.clip(pred_u + resid_u, 0, 255).astype(jnp.uint8)
    inter_v = jnp.clip(pred_v + resid_v, 0, 255).astype(jnp.uint8)

    # 3. canvas assembly
    cy = jnp.zeros((HP, WP), jnp.uint8)
    cu = jnp.zeros((HPc, WPc), jnp.uint8)
    cv = jnp.zeros((HPc, WPc), jnp.uint8)
    cy = _set_intra_borders(cy, B, C * 16, R * 16)
    cu = _set_intra_borders(cu, B2, C * 8, R * 8)
    cv = _set_intra_borders(cv, B2, C * 8, R * 8)
    cy = jax.lax.dynamic_update_slice(cy, inter_y, (B, B))
    cu = jax.lax.dynamic_update_slice(cu, inter_u, (B2, B2))
    cv = jax.lax.dynamic_update_slice(cv, inter_v, (B2, B2))

    # 4. intra wavefront
    diag_r_np, diag_c_np = diagonals(R, C)
    diag_r, diag_c = jnp.asarray(diag_r_np), jnp.asarray(diag_c_np)
    step = functools.partial(_recon_step, R, C, resid_y=resid_y,
                             resid_u=resid_u, resid_v=resid_v, mode=mode,
                             uv_mode=uv_mode, intra=intra, bmodes=bmodes)
    (cy, cu, cv), _ = jax.lax.scan(lambda p, x: step(p, x), (cy, cu, cv),
                                   (diag_r, diag_c))

    # 5. loop filter wavefront
    if do_lf:
        lstep = functools.partial(_lf_step, R, C, simple_lf, flevel=flevel,
                                  mblim_a=mblim_a, blim_a=blim_a,
                                  lim_a=lim_a, hev_a=hev_a,
                                  noskip_a=noskip_a)
        (cy, cu, cv), _ = jax.lax.scan(lambda p, x: lstep(p, x),
                                       (cy, cu, cv), (diag_r, diag_c))

    # 6. border extension
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
        y = np.asarray(self.y[B:B + self.h, B:B + self.w])
        ch, cw = (self.h + 1) // 2, (self.w + 1) // 2
        u = np.asarray(self.u[B2:B2 + ch, B2:B2 + cw])
        v = np.asarray(self.v[B2:B2 + ch, B2:B2 + cw])
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
        mode = self.mode[1:, 1:].reshape(N).astype(np.int32)
        uv_mode = self.uv_mode.reshape(N).astype(np.int32)
        ref_frame = self.ref_frame[1:, 1:].reshape(N)
        intra = (ref_frame == INTRA_FRAME)
        ref_idx = np.clip(ref_frame - 1, 0, 2).astype(np.int32)
        bmodes = self.bmode[1:, 1:].reshape(N, 16).astype(np.int32)
        qcoeff = np.ascontiguousarray(self.qcoeff.reshape(N, 25, 16),
                                      dtype=np.int16)
        eobs = self.eobs.reshape(N, 25).astype(np.int32)
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
        flevel = np.zeros(N, np.int32)
        hev_a = np.zeros(N, np.int32)
        mblim_a = np.zeros(N, np.int32)
        blim_a = np.zeros(N, np.int32)
        lim_a = np.zeros(N, np.int32)
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
            flevel = lvl[segs, ref_frame, mi].astype(np.int32)
            hev_a = hev_lut[flevel]
            mblim_a = mblim[flevel].astype(np.int32)
            blim_a = blim[flevel].astype(np.int32)
            lim_a = lim[flevel].astype(np.int32)
            noskip_a = ~(has_y2 & (self.skip.reshape(N) != 0))

        # SPLITMV fixup worklists, bucket-padded so device shapes stay in a
        # small set of compiled variants
        split_mbs = np.nonzero(mode == SPLITMV)[0]
        ns = len(split_mbs)

        def bucket(n):
            b = 16
            while b < n:
                b *= 2
            return b

        if ns:
            S = bucket(ns * 16)
            sp_mb = np.zeros(S, np.int32)
            sp_tile = np.zeros(S, np.int32)
            sp_valid = np.zeros(S, bool)
            sp_mb[:ns * 16] = np.repeat(split_mbs, 16)
            sp_tile[:ns * 16] = np.tile(np.arange(16), ns)
            sp_valid[:ns * 16] = True
            S2 = bucket(ns * 4)
            sq_mb = np.zeros(S2, np.int32)
            sq_quad = np.zeros(S2, np.int32)
            sq_valid = np.zeros(S2, bool)
            sq_mb[:ns * 4] = np.repeat(split_mbs, 4)
            sq_quad[:ns * 4] = np.tile(np.arange(4), ns)
            sq_valid[:ns * 4] = True
        else:
            sp_mb = np.zeros(0, np.int32)
            sp_tile = np.zeros(0, np.int32)
            sp_valid = np.zeros(0, bool)
            sq_mb = np.zeros(0, np.int32)
            sq_quad = np.zeros(0, np.int32)
            sq_valid = np.zeros(0, bool)

        ref_y = jnp.stack([self.last.y, self.golden.y, self.altref.y])
        ref_u = jnp.stack([self.last.u, self.golden.u, self.altref.u])
        ref_v = jnp.stack([self.last.v, self.golden.v, self.altref.v])
        j = jnp.asarray
        return (ref_y, ref_u, ref_v, j(ref_idx), j(qcoeff), j(eobs),
                j(dq_y1), j(dq_y2), j(dq_uv), j(has_y2), j(intra), j(mode),
                j(uv_mode), j(bmodes), j(y_mv), j(uv_mv),
                j(np.asarray(taps, np.int32)),
                j(sp_mb), j(sp_tile), j(sp_valid), j(sq_mb), j(sq_quad),
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
