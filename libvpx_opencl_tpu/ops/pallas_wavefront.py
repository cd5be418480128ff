"""Pallas TPU wavefront kernels: intra reconstruction + loop filter.

The offset-2 diagonal wavefront (the dependency structure the reference
schedules as OpenCL priority levels, loopfilter_cl.c:545, and nsync-lagged
decode threads, threading.c:313) runs as ONE Pallas kernel with the grid
iterating over diagonals and the inter-MB dependency frontier carried in
VMEM scratch across grid steps.  This removes the per-step XLA dispatch,
carry-copy, and (crucially) every data-dependent gather of the lax.scan
formulation in models/wavefront.py.

Lane layout: lane = MB ROW (m = r), so diagonal d contains MB (r, c=d-2r)
at lane r.  All neighbor exchange is then same-lane or a static roll by 1:

            written by        at     read at   slot
  above     (r-1, c)  lane r-1  d-2     d      hist[d&1]   (roll +1)
  above-rt  (r-1, c+1) lane r-1 d-1     d      hist[(d+1)&1] (roll +1)
  left      (r,   c-1) lane r   d-1     d      single slot (read-then-write)
  top-left  (r-1, c-1) lane r-1 d-3     d      corner[d%3] (roll +1)

Slots are selected with masks over static slices (this environment's
Mosaic backend rejects dynamic VMEM indexing).  Invalid lanes write
garbage frontier entries, which is safe: every read whose producer is not
a real MB is masked by the frame-edge rules (above=127 / left=129,
reconintra.c:36-56).

In-kernel data layout is [rows, cols, LANES] so every pixel op vectorizes
across the diagonal's macroblocks.

Bit-exact vs models/wavefront.py (itself MD5-verified against the
reference vpxdec) — see tests/test_pallas_decode.py.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import loopfilter as lfops

B_PRED_M = 4


# ---------------------------------------------------------------------------
# shared helpers

def _slot2_read(buf, s2):
    """buf [2, ...]: masked read of slot s2 (no dynamic VMEM indexing)."""
    return jnp.where(s2 == 0, buf[0], buf[1])


def _lane_up(x, axis=-1):
    """value of lane r-1 at lane r (static roll; lane 0 gets garbage,
    always masked by row-0 rules)."""
    return pltpu.roll(x, 1, axis=x.ndim - 1 if axis == -1 else axis)


def _pred_nxn_lanes(mode, above, left, tl, up_ok, left_ok, n):
    """reconintra.c:136-470 vectorized over lanes.

    mode/tl/up_ok/left_ok [M]; above/left [n, M]. Returns [n, n, M]."""
    up_i = up_ok.astype(jnp.int32)
    left_i = left_ok.astype(jnp.int32)
    total = jnp.sum(above, axis=0) * up_i + jnp.sum(left, axis=0) * left_i
    shift = (n.bit_length() - 2) + up_i + left_i
    dc = jnp.where(up_ok | left_ok,
                   (total + jnp.left_shift(1, shift - 1)) >> shift, 128)
    dc_blk = jnp.broadcast_to(dc[None, None, :], (n, n, dc.shape[0]))
    v_blk = jnp.broadcast_to(above[None, :, :], (n, n, above.shape[1]))
    h_blk = jnp.broadcast_to(left[:, None, :], (n, n, left.shape[1]))
    tm_blk = jnp.clip(left[:, None, :] + above[None, :, :]
                      - tl[None, None, :], 0, 255)
    out = jnp.where(mode == 1, v_blk, dc_blk)
    out = jnp.where(mode == 2, h_blk, out)
    out = jnp.where(mode == 3, tm_blk, out)
    return out


def _bpred_4x4_lanes(bmode, A8, L4, tl):
    """vp8_intra4x4_predict_c (reconintra4x4.c:17-289) over lanes.

    bmode [M]; A8 [8, M]; L4 [4, M]; tl [M]. Returns [4, 4, M]."""
    def e3(a, b, c):
        return (a + 2 * b + c + 2) >> 2

    def h2(a, b):
        return (a + b + 1) >> 1

    def rows(rlist):
        return jnp.stack([jnp.stack(r, 0) for r in rlist], 0)

    A = [A8[i] for i in range(8)]
    L = [L4[i] for i in range(4)]
    M = tl.shape[0]
    dc = (A[0] + A[1] + A[2] + A[3] + L[0] + L[1] + L[2] + L[3] + 4) >> 3
    b_dc = jnp.broadcast_to(dc[None, None, :], (4, 4, M))
    b_tm = jnp.clip(jnp.stack(L, 0)[:, None, :]
                    + jnp.stack(A[:4], 0)[None, :, :] - tl[None, None, :],
                    0, 255)
    ap = [e3(tl, A[0], A[1]), e3(A[0], A[1], A[2]),
          e3(A[1], A[2], A[3]), e3(A[2], A[3], A[4])]
    b_ve = jnp.broadcast_to(jnp.stack(ap, 0)[None, :, :], (4, 4, M))
    lp = [e3(tl, L[0], L[1]), e3(L[0], L[1], L[2]),
          e3(L[1], L[2], L[3]), e3(L[2], L[3], L[3])]
    b_he = jnp.broadcast_to(jnp.stack(lp, 0)[:, None, :], (4, 4, M))
    d = [e3(A[i], A[i + 1], A[i + 2]) for i in range(6)] + \
        [e3(A[6], A[7], A[7])]
    b_ld = rows([[d[0], d[1], d[2], d[3]], [d[1], d[2], d[3], d[4]],
                 [d[2], d[3], d[4], d[5]], [d[3], d[4], d[5], d[6]]])
    pp = [L[3], L[2], L[1], L[0], tl, A[0], A[1], A[2], A[3]]
    ed = [e3(pp[i], pp[i + 1], pp[i + 2]) for i in range(7)]
    hd = [h2(pp[i], pp[i + 1]) for i in range(8)]
    b_rd = rows([[ed[3], ed[4], ed[5], ed[6]], [ed[2], ed[3], ed[4], ed[5]],
                 [ed[1], ed[2], ed[3], ed[4]], [ed[0], ed[1], ed[2], ed[3]]])
    b_vr = rows([[hd[4], hd[5], hd[6], hd[7]], [ed[3], ed[4], ed[5], ed[6]],
                 [ed[2], hd[4], hd[5], hd[6]], [ed[1], ed[3], ed[4], ed[5]]])
    b_hd = rows([[hd[3], ed[3], ed[4], ed[5]], [hd[2], ed[2], hd[3], ed[3]],
                 [hd[1], ed[1], hd[2], ed[2]], [hd[0], ed[0], hd[1], ed[1]]])
    evl = [e3(A[i], A[i + 1], A[i + 2]) for i in range(6)]
    hvl = [h2(A[i], A[i + 1]) for i in range(5)]
    b_vl = rows([[hvl[0], hvl[1], hvl[2], hvl[3]],
                 [evl[0], evl[1], evl[2], evl[3]],
                 [hvl[1], hvl[2], hvl[3], evl[4]],
                 [evl[1], evl[2], evl[3], evl[5]]])
    q = L
    b_hu = rows([[h2(q[0], q[1]), e3(q[0], q[1], q[2]),
                  h2(q[1], q[2]), e3(q[1], q[2], q[3])],
                 [h2(q[1], q[2]), e3(q[1], q[2], q[3]),
                  h2(q[2], q[3]), e3(q[2], q[3], q[3])],
                 [h2(q[2], q[3]), e3(q[2], q[3], q[3]), q[3], q[3]],
                 [q[3], q[3], q[3], q[3]]])
    out = b_dc
    for i, blk in enumerate([b_tm, b_ve, b_he, b_ld, b_rd, b_vr, b_vl,
                             b_hd, b_hu], start=1):
        out = jnp.where(bmode == i, blk, out)
    return out


# B_PRED sub-mode order must match the decoder's numbering (tables: B_DC=0,
# B_TM=1, B_VE=2, B_HE=3, B_LD=4, B_RD=5, B_VR=6, B_VL=7, B_HD=8, B_HU=9)
# — same order as ops/predict.py bpred_4x4's switch list.


# ---------------------------------------------------------------------------
# intra reconstruction kernel

def _intra_kernel(R, C, flags_ref,
                  inter_y_ref, inter_u_ref, inter_v_ref,
                  resid_y_ref, resid_u_ref, resid_v_ref,
                  params_ref, bmodes_ref,
                  y_ref, u_ref, v_ref,
                  hist_y, left_y, corner_y,
                  hist_u, left_u, corner_u,
                  hist_v, left_v, corner_v, ws):
    d = pl.program_id(0)
    M = R
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)[0]
    c = d - 2 * lane
    valid = (c >= 0) & (c < C)
    left_ok = valid & (c > 0)
    up_ok = valid & (lane > 0)
    s2 = d & 1
    s3 = d % 3

    @pl.when(d == 0)
    def _():
        for buf in (hist_y, left_y, corner_y, hist_u, left_u, corner_u,
                    hist_v, left_v, corner_v):
            buf[...] = jnp.zeros(buf.shape, buf.dtype)

    mode = params_ref[0, 0]
    uv_mode = params_ref[0, 1]
    intra = params_ref[0, 2] != 0

    def corner_read(cbuf):
        cc = jnp.where(s3 == 0, cbuf[0],
                       jnp.where(s3 == 1, cbuf[1], cbuf[2]))
        return _lane_up(cc)[0]                      # [M]

    def side_inputs(hist, left_buf, cbuf, n):
        above_raw = _lane_up(_slot2_read(hist, s2))  # [n, M]
        above = jnp.where(up_ok[None, :], above_raw, 127)
        left = jnp.where(left_ok[None, :], left_buf[...], 129)
        tlr = corner_read(cbuf)
        tl = jnp.where(lane == 0, 127, jnp.where(c == 0, 129, tlr))
        return above, left, tl

    above_y, left_yv, tl_y = side_inputs(hist_y, left_y, corner_y, 16)
    pred = _pred_nxn_lanes(mode, above_y, left_yv, tl_y, up_ok & (lane > 0),
                           left_ok, 16)
    # NB: up_ok already includes lane>0
    rec = jnp.clip(pred + resid_y_ref[0], 0, 255)
    yblk = jnp.where(intra[None, None, :], rec, inter_y_ref[0])
    y_ref[0] = yblk

    # ---- B_PRED lanes (gated per diagonal by the prefetched flag) ----
    @pl.when(flags_ref[d] != 0)
    def _():
        # above-right 4px: first 4 of (r-1, c+1)'s bottom row (slot d-1)
        ar_raw = _lane_up(_slot2_read(hist_y, 1 - s2))[0:4]   # [4, M]
        ar_edge = jnp.broadcast_to(above_y[15][None, :], (4, M))
        arpx = jnp.where(lane[None, :] == 0, 127,
                         jnp.where(c[None, :] >= C - 1, ar_edge, ar_raw))
        ws[0:1, 0:1] = tl_y[None, None, :]
        ws[0:1, 1:17] = above_y[None]
        ws[0:1, 17:21] = arpx[None]
        ws[4:5, 17:21] = arpx[None]
        ws[8:9, 17:21] = arpx[None]
        ws[12:13, 17:21] = arpx[None]
        ws[1:17, 0:1] = left_yv[:, None, :]
        rblk = resid_y_ref[0]
        for k in range(16):
            ir, ic = k >> 2, k & 3
            A8 = ws[4 * ir, 1 + 4 * ic:9 + 4 * ic]
            L4 = ws[1 + 4 * ir:5 + 4 * ir, 4 * ic]
            tl4 = ws[4 * ir, 4 * ic]
            blk = _bpred_4x4_lanes(bmodes_ref[0, k], A8, L4, tl4)
            blk = jnp.clip(blk + rblk[4 * ir:4 * ir + 4,
                                      4 * ic:4 * ic + 4], 0, 255)
            ws[1 + 4 * ir:5 + 4 * ir, 1 + 4 * ic:5 + 4 * ic] = blk
        is_b = (mode == B_PRED_M) & intra
        y_ref[0] = jnp.where(is_b[None, None, :], ws[1:17, 1:17], y_ref[0])

    # ---- chroma ----
    def chroma(hist, left_buf, cbuf, inter_ref, resid_ref, out_ref):
        above, left, tl = side_inputs(hist, left_buf, cbuf, 8)
        p = _pred_nxn_lanes(uv_mode, above, left, tl, up_ok, left_ok, 8)
        recc = jnp.clip(p + resid_ref[0], 0, 255)
        out_ref[0] = jnp.where(intra[None, None, :], recc, inter_ref[0])

    chroma(hist_u, left_u, corner_u, inter_u_ref, resid_u_ref, u_ref)
    chroma(hist_v, left_v, corner_v, inter_v_ref, resid_v_ref, v_ref)

    # ---- frontier updates (read final outputs incl. B_PRED overwrite) ----
    def update(hist, left_buf, cbuf, out_ref, n):
        final = out_ref[0]
        bottom = final[n - 1]                      # [n(cols), M]
        right = final[:, n - 1]                    # [n(rows), M]
        br = final[n - 1, n - 1][None]             # [1, M]
        hist[0] = jnp.where(s2 == 0, bottom, hist[0])
        hist[1] = jnp.where(s2 == 1, bottom, hist[1])
        left_buf[...] = right
        cbuf[0] = jnp.where(s3 == 0, br, cbuf[0])
        cbuf[1] = jnp.where(s3 == 1, br, cbuf[1])
        cbuf[2] = jnp.where(s3 == 2, br, cbuf[2])

    M = R
    update(hist_y, left_y, corner_y, y_ref, 16)
    update(hist_u, left_u, corner_u, u_ref, 8)
    update(hist_v, left_v, corner_v, v_ref, 8)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def intra_recon_pallas(R, C, interpret,
                       flags, inter_y, inter_u, inter_v,
                       resid_y, resid_u, resid_v, params, bmodes):
    """Wavefront intra reconstruction.

    flags [D] int32 (any-B_PRED per diagonal, scalar-prefetched);
    inter_*/resid_* [D, n, n, M] int32 diag-major blocks (M = R lanes);
    params [D, 8, M] int32 rows (mode, uv_mode, intra, ...);
    bmodes [D, 16, M] int32.
    Returns y [D,16,16,M], u, v [D,8,8,M] int32 reconstructions.
    """
    D = inter_y.shape[0]
    M = R

    def spec(n):
        return pl.BlockSpec((1, n, n, M), lambda d, *_: (d, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(D,),
        in_specs=[spec(16), spec(8), spec(8), spec(16), spec(8), spec(8),
                  pl.BlockSpec((1, 8, M), lambda d, *_: (d, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 16, M), lambda d, *_: (d, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(spec(16), spec(8), spec(8)),
        scratch_shapes=[
            pltpu.VMEM((2, 16, M), jnp.int32),  # hist_y
            pltpu.VMEM((16, M), jnp.int32),     # left_y
            pltpu.VMEM((3, 1, M), jnp.int32),   # corner_y
            pltpu.VMEM((2, 8, M), jnp.int32),
            pltpu.VMEM((8, M), jnp.int32),
            pltpu.VMEM((3, 1, M), jnp.int32),
            pltpu.VMEM((2, 8, M), jnp.int32),
            pltpu.VMEM((8, M), jnp.int32),
            pltpu.VMEM((3, 1, M), jnp.int32),
            pltpu.VMEM((17, 21, M), jnp.int32),  # B_PRED workspace
        ])
    return pl.pallas_call(
        functools.partial(_intra_kernel, R, C),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((D, 16, 16, M), jnp.int32),
                   jax.ShapeDtypeStruct((D, 8, 8, M), jnp.int32),
                   jax.ShapeDtypeStruct((D, 8, 8, M), jnp.int32)),
        interpret=interpret,
    )(flags, inter_y, inter_u, inter_v, resid_y, resid_u, resid_v,
      params, bmodes)


# ---------------------------------------------------------------------------
# raster <-> diag-major layout (static slices only; no gathers)

def diag_depth(R, C):
    return 2 * (R - 1) + C


def to_diag(blocks, R, C):
    """[R*C, n, n] raster MB blocks -> [D, n, n, M=R] diag-major.

    Zero-copy skew trick: target T[m, d] = A[m, d-2m].  Flattened,
    T_flat[m*D + d] = T_flat[m*(D+2) + (d-2m)], i.e. T is just A with its
    rows padded to width D+2 and the flat buffer re-strided to width D.
    Negative d-2m lands in the previous row's zero padding (D+2-2(R-1) > C),
    so invalid lanes read zeros — one pad + two reshapes, no slicing loop."""
    n = blocks.shape[1]
    D = diag_depth(R, C)
    b = blocks.reshape(R, C, n * n)
    b = jnp.pad(b, ((0, 0), (0, D + 2 - C), (0, 0)))
    t = b.reshape(R * (D + 2), n * n)[:R * D].reshape(R, D, n, n)
    return t.transpose(1, 2, 3, 0)


def from_diag(x, R, C):
    """[D, n, n, M=R] diag-major -> [R*C, n, n] raster (inverse skew)."""
    n = x.shape[1]
    D = diag_depth(R, C)
    t = x.transpose(3, 0, 1, 2).reshape(R * D, n * n)
    s = jnp.pad(t, ((0, 2 * R), (0, 0))).reshape(R, D + 2, n * n)
    return s[:, :C].reshape(R * C, n, n)


def vec_to_diag(vals, R, C, dtype=jnp.int32):
    """[R*C] per-MB values -> [D, M=R] (same skew trick as to_diag)."""
    D = diag_depth(R, C)
    v = vals.reshape(R, C).astype(dtype)
    v = jnp.pad(v, ((0, 0), (0, D + 2 - C)))
    t = v.reshape(R * (D + 2))[:R * D].reshape(R, D)
    return t.transpose(1, 0)


def pack_params(cols, R, C):
    """list of [R*C] arrays -> [D, 8, M] int32 (rows 0..len-1 used)."""
    D = diag_depth(R, C)
    M = R
    rows = [vec_to_diag(c, R, C) for c in cols]
    while len(rows) < 8:
        rows.append(jnp.zeros((D, M), jnp.int32))
    return jnp.stack(rows, 1)


# ---------------------------------------------------------------------------
# loop filter kernel

def _edge_filter(patch, span, pos, orient, mb_edge, simple,
                 apply_m, mblim, blim, lim, hev_t):
    """Filter one edge in the patch scratch ref.

    patch: VMEM ref [(bw+4), (bw+4), M]; span = (lo, hi) rows (V) / cols (H)
    along the edge; pos = patch coordinate of the edge (4/8/12/16);
    orient 'v' or 'h'. Static slices only."""
    lo, hi = span

    def get(i):
        if orient == 'v':
            return patch[lo:hi, pos - 4 + i, :]
        return patch[pos - 4 + i, lo:hi, :]

    def put(i, val):
        if orient == 'v':
            patch[lo:hi, pos - 4 + i:pos - 3 + i, :] = val[:, None, :]
        else:
            patch[pos - 4 + i:pos - 3 + i, lo:hi, :] = val[None, :, :]

    p3, p2, p1, p0 = get(0), get(1), get(2), get(3)
    q0, q1, q2, q3 = get(4), get(5), get(6), get(7)
    am = apply_m[None, :]
    if simple:
        lm = blim if not mb_edge else mblim
        mask = (jnp.abs(p0 - q0) * 2 + jnp.abs(p1 - q1) // 2
                <= lm[None, :]) & am
        op0, oq0 = lfops.simple_filter(mask, p1, p0, q0, q1)
        put(3, op0)
        put(4, oq0)
        return
    lm = mblim if mb_edge else blim
    mask = lfops.filter_mask(lim[None, :], lm[None, :],
                             p3, p2, p1, p0, q0, q1, q2, q3) & am
    hev = lfops.hev_mask(hev_t[None, :], p1, p0, q0, q1)
    if mb_edge:
        np2, np1, np0, nq0, nq1, nq2 = lfops.mbfilter(
            mask, hev, p2, p1, p0, q0, q1, q2)
        put(1, np2)
        put(6, nq2)
    else:
        np1, np0, nq0, nq1 = lfops.filter4(mask, hev, p1, p0, q0, q1)
    put(2, np1)
    put(3, np0)
    put(4, nq0)
    put(5, nq1)


def _lf_kernel(R, C, simple, dummy_flags_ref,
               y_in_ref, u_in_ref, v_in_ref, params_ref,
               by_ref, ly_ref, uy_ref,
               bu_ref, lu_ref, uu_ref,
               bv_ref, lv_ref, uv_ref,
               hist_y, lstrip_y, hist_u, lstrip_u, hist_v, lstrip_v,
               patch):
    del dummy_flags_ref
    d = pl.program_id(0)
    M = R
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)[0]
    c = d - 2 * lane
    valid = (c >= 0) & (c < C)
    left_ok = valid & (c > 0)
    up_ok = valid & (lane > 0)
    s2 = d & 1

    @pl.when(d == 0)
    def _():
        for buf in (hist_y, lstrip_y, hist_u, lstrip_u, hist_v, lstrip_v):
            buf[...] = jnp.zeros(buf.shape, buf.dtype)

    flevel = params_ref[0, 0]
    mblim = params_ref[0, 1]
    blim = params_ref[0, 2]
    lim = params_ref[0, 3]
    hev_t = params_ref[0, 4]
    noskip = params_ref[0, 5] != 0
    active = valid & (flevel > 0)

    def run_plane(in_ref, hist, lstrip, b_ref, l_ref, u_ref_, bw,
                  do_filter):
        # build patch: [bw+4, bw+4, M] (top 4 rows = above strip,
        # left 4 cols = left strip)
        patch[4:bw + 4, 4:bw + 4, :] = in_ref[0]
        above = _lane_up(_slot2_read(hist, s2)[:, :bw], axis=2)  # [4,bw,M]
        patch[0:4, 4:bw + 4, :] = jnp.where(up_ok[None, None, :], above, 0)
        patch[4:bw + 4, 0:4, :] = jnp.where(left_ok[None, None, :],
                                            lstrip[:bw], 0)
        if do_filter:
            span = (4, bw + 4)
            _edge_filter(patch, span, 4, 'v', True, simple, active & left_ok,
                         mblim, blim, lim, hev_t)
            for pos in range(8, bw + 4, 4):
                _edge_filter(patch, span, pos, 'v', False, simple,
                             active & noskip, mblim, blim, lim, hev_t)
            _edge_filter(patch, span, 4, 'h', True, simple, active & up_ok,
                         mblim, blim, lim, hev_t)
            for pos in range(8, bw + 4, 4):
                _edge_filter(patch, span, pos, 'h', False, simple,
                             active & noskip, mblim, blim, lim, hev_t)
        b_ref[0] = patch[4:bw + 4, 4:bw + 4, :]
        l_ref[0] = patch[4:bw + 4, 0:4, :]
        u_ref_[0] = patch[0:4, 4:bw + 4, :]
        # frontier updates
        new_strip = patch[bw:bw + 4, 4:bw + 4, :]       # own bottom 4 rows
        hist[0] = jnp.where(s2 == 0, new_strip, hist[0, :, :bw])
        hist[1] = jnp.where(s2 == 1, new_strip, hist[1, :, :bw])
        # patch previous entry (this MB's left neighbor) cols bw-4..bw with
        # the L-strip's bottom 4 rows — the (r-1,c+1)->(r-1,c) edit seen by
        # the below reader (loopfilter.c raster order)
        lpatch = patch[bw:bw + 4, 0:4, :]
        old0 = hist[0, :, bw - 4:bw]
        old1 = hist[1, :, bw - 4:bw]
        sel0 = (s2 == 1) & left_ok[None, None, :]
        sel1 = (s2 == 0) & left_ok[None, None, :]
        hist[0, :, bw - 4:bw, :] = jnp.where(sel0, lpatch, old0)
        hist[1, :, bw - 4:bw, :] = jnp.where(sel1, lpatch, old1)
        lstrip[:bw] = patch[4:bw + 4, bw:bw + 4, :]     # own last 4 cols

    run_plane(y_in_ref, hist_y, lstrip_y, by_ref, ly_ref, uy_ref, 16, True)
    run_plane(u_in_ref, hist_u, lstrip_u, bu_ref, lu_ref, uu_ref, 8,
              not simple)
    run_plane(v_in_ref, hist_v, lstrip_v, bv_ref, lv_ref, uv_ref, 8,
              not simple)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def loop_filter_pallas(R, C, simple, interpret,
                       y_blocks, u_blocks, v_blocks, params):
    """Wavefront loop filter over diag-major blocks.

    y/u/v [D, n, n, M] int32; params [D, 8, M] int32 rows
    (flevel, mblim, blim, lim, hev, noskip).
    Returns (By, Ly, Uy, Bu, Lu, Uu, Bv, Lv, Uv) diag-major int32; compose
    with lf_compose."""
    D = y_blocks.shape[0]
    M = R

    def spec(a, b):
        return pl.BlockSpec((1, a, b, M), lambda d, *_: (d, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(D,),
        in_specs=[spec(16, 16), spec(8, 8), spec(8, 8),
                  pl.BlockSpec((1, 8, M), lambda d, *_: (d, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(spec(16, 16), spec(16, 4), spec(4, 16),
                   spec(8, 8), spec(8, 4), spec(4, 8),
                   spec(8, 8), spec(8, 4), spec(4, 8)),
        scratch_shapes=[
            pltpu.VMEM((2, 4, 16, M), jnp.int32),   # hist_y
            pltpu.VMEM((16, 4, M), jnp.int32),      # lstrip_y
            pltpu.VMEM((2, 4, 8, M), jnp.int32),
            pltpu.VMEM((8, 4, M), jnp.int32),
            pltpu.VMEM((2, 4, 8, M), jnp.int32),
            pltpu.VMEM((8, 4, M), jnp.int32),
            pltpu.VMEM((20, 20, M), jnp.int32),     # patch workspace
        ])
    shapes = [(16, 16), (16, 4), (4, 16), (8, 8), (8, 4), (4, 8),
              (8, 8), (8, 4), (4, 8)]
    return pl.pallas_call(
        functools.partial(_lf_kernel, R, C, simple),
        grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct((D, a, b, M), jnp.int32)
                        for a, b in shapes),
        interpret=interpret,
    )(jnp.zeros((D,), jnp.int32), y_blocks, u_blocks, v_blocks, params)


def lf_compose(outs, R, C, simple):
    """Overlay deferred edit strips: B + L(right nbr) + U(below nbr).

    outs = the 9 diag-major arrays from loop_filter_pallas. Returns
    (y, u, v) diag-major [D, n, n, M] final filtered blocks."""
    By, Ly, Uy, Bu, Lu, Uu, Bv, Lv, Uv = outs
    D = By.shape[0]
    M = R
    dgrid = np.arange(D)[:, None]
    lgrid = np.arange(M)[None, :]
    cgrid = dgrid - 2 * lgrid
    has_right = jnp.asarray((cgrid + 1 < C) & (cgrid >= 0) & (lgrid < R))
    has_down = jnp.asarray((lgrid + 1 < R) & (cgrid >= 0) & (cgrid < C))

    def compose(Bst, Lst, Ust, bw):
        # right neighbor (r, c+1) = diag d+1, same lane
        lstrip = jnp.roll(Lst, -1, axis=0)
        right_cols = jnp.where(has_right[:, None, None, :], lstrip,
                               Bst[:, :, bw - 4:bw, :])
        out = jnp.concatenate([Bst[:, :, :bw - 4, :], right_cols], axis=2)
        # below neighbor (r+1, c) = diag d+2, lane r+1
        ustrip = jnp.roll(jnp.roll(Ust, -2, axis=0), -1, axis=3)
        down_rows = jnp.where(has_down[:, None, None, :], ustrip,
                              out[:, bw - 4:bw, :, :])
        return jnp.concatenate([out[:, :bw - 4, :, :], down_rows], axis=1)

    y = compose(By, Ly, Uy, 16)
    if simple:
        return y, Bu, Bv
    return y, compose(Bu, Lu, Uu, 8), compose(Bv, Lv, Uv, 8)
