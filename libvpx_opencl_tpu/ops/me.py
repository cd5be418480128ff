"""Device motion estimation: whole-frame batched SAD search.

TPU plan for the reference's mcomp.c diamond/hex/full searches
(SURVEY.md §2.4 "Motion estimation"): TPUs prefer regular dense compute, so
every MB runs the same dense window search as one batched array program —
a step-2 grid over +-16 full-pel, a +-1 full-pel refine, then half- and
quarter-pel refines through the production MC filter kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import predict as P

RNG = 16  # full-pel search radius

# sad_per_bit16lut (rdopt.c:152-185): SAD-domain rate weight per qindex
SAD_PER_BIT16 = np.array(
    [2] * 16 + [3] * 14 + [4] * 12 + [5] * 12 + [6] * 12 + [7] * 12 +
    [8] * 12 + [9] * 12 + [10] * 8 + [11] * 6 + [12] * 6 + [13] * 4 +
    [14] * 2, np.int32)


def _mv_penalty(mvcost, d8_r, d8_c, sadpb):
    """mvsad_err_cost (mcomp.c:62-75): component-cost lookup on the
    1/4-pel grid, scaled by sad-per-bit."""
    ir = jnp.clip(jnp.abs(d8_r) >> 1, 0, 1023)
    ic = jnp.clip(jnp.abs(d8_c) >> 1, 0, 1023)
    c = jnp.take(mvcost[0], ir) + jnp.take(mvcost[1], ic)
    return (c * sadpb + 128) >> 8


def full_search(ref_plane, src_blocks, centers, mb_pos, mv_pen=None,
                step=2):
    """Full-pel window search: step-1 exhaustive (vp8_full_search_sad
    mcomp.c:1295 — a step-2 grid misses the delta-function SAD minima of
    textured content, the round-3 quality cliff) or step-2 + refine for
    the fast ladder.

    ref_plane [H, W] uint8 padded; src_blocks [N, 16, 16] int32;
    centers [N, 2] full-pel search centers (dy, dx) relative to the MB
    position, pre-clamped by the caller; mb_pos [N, 2] padded top-left
    plane coords of each MB.  Returns (mv_fp [N,2] full-pel offsets
    relative to MB, sad [N]).
    """
    n = src_blocks.shape[0]
    # gather (2*RNG+16)^2 windows centered on `centers`
    w = 2 * RNG + 16

    def gather(py, px):
        return jax.lax.dynamic_slice(ref_plane, (py, px), (w, w))

    wy = mb_pos[:, 0] + centers[:, 0] - RNG
    wx = mb_pos[:, 1] + centers[:, 1] - RNG
    win = jax.vmap(gather)(wy, wx).astype(jnp.int32)

    def grid_sads(win, step, lo, hi):
        cands = list(range(lo, hi + 1, step))
        rows = []
        for dy in cands:
            strip = win[:, dy + RNG:dy + RNG + 16, :]  # [N,16,w]
            cols = jnp.stack([strip[:, :, dx + RNG:dx + RNG + 16]
                              for dx in cands], axis=1)  # [N,k,16,16]
            sad = jnp.sum(jnp.abs(cols - src_blocks[:, None]), axis=(2, 3))
            rows.append(sad)
        return jnp.stack(rows, axis=1), cands  # [N,k,k]

    import os as _os
    if (step == 1 and jax.default_backend() == "tpu"
            and _os.environ.get("VP8TPU_PALLAS_ME") == "1"):
        # alternative VMEM-resident Pallas backend (integer-identical
        # SADs).  Off by default: measured on v5e at 720p the XLA grid
        # runs 42 ms vs 537 ms for the correlation-form kernel — XLA's
        # fusion already streams the candidate strips well (see
        # ops/me_pallas.py docstring for the measurement).
        from . import me_pallas
        sads = me_pallas.sad_grid_pallas(win, src_blocks, RNG)
        cands = list(range(-RNG, RNG + 1))
    else:
        sads, cands = grid_sads(win, step, -RNG, RNG)
    k = len(cands)
    if mv_pen is not None:
        # MV-rate costing over the whole grid (vp8_full_search_sad's
        # mvsad_err_cost per candidate, mcomp.c:1432-1495)
        mvcost, pred8, sadpb = mv_pen
        cand_arr = jnp.asarray(cands)
        d8_r = (centers[:, 0:1] + cand_arr[None, :]) * 8 - pred8[:, 0:1]
        d8_c = (centers[:, 1:2] + cand_arr[None, :]) * 8 - pred8[:, 1:2]
        ir = jnp.clip(jnp.abs(d8_r) >> 1, 0, 1023)
        ic = jnp.clip(jnp.abs(d8_c) >> 1, 0, 1023)
        pen_r = jnp.take(mvcost[0], ir)          # [N, k]
        pen_c = jnp.take(mvcost[1], ic)          # [N, k]
        spb = sadpb if jnp.ndim(sadpb) == 0 else sadpb[:, None, None]
        sads = sads + (((pen_r[:, :, None] + pen_c[:, None, :]) * spb +
                        128) >> 8)
    flat = sads.reshape(n, k * k)
    best = jnp.argmin(flat, axis=1)
    bdy = jnp.asarray(cands)[best // k]
    bdx = jnp.asarray(cands)[best % k]
    best_sad = jnp.min(flat, axis=1)
    bmv = jnp.stack([bdy, bdx], axis=1)
    if step == 1:
        # exhaustive grid already contains every +-1 neighbor (same SAD
        # + same penalty formula), so the refine below cannot find a
        # strictly better candidate — skip its 8 gather passes
        return bmv + centers, best_sad
    # +-1 refine (9 candidates, clamped inside the window)
    for ddy in (-1, 0, 1):
        for ddx in (-1, 0, 1):
            if ddy == 0 and ddx == 0:
                continue
            cy = jnp.clip(bdy + ddy, -RNG, RNG)
            cx = jnp.clip(bdx + ddx, -RNG, RNG)
            idx_r = (cy + RNG)[:, None, None] + jnp.arange(16)[None, :, None]
            idx_c = (cx + RNG)[:, None, None] + jnp.arange(16)[None, None, :]
            cand = win[jnp.arange(n)[:, None, None], idx_r, idx_c]
            sad = jnp.sum(jnp.abs(cand - src_blocks), axis=(1, 2))
            if mv_pen is not None:
                mvcost, pred8, sadpb = mv_pen
                sad = sad + _mv_penalty(
                    mvcost, (centers[:, 0] + cy) * 8 - pred8[:, 0],
                    (centers[:, 1] + cx) * 8 - pred8[:, 1], sadpb)
            better = sad < best_sad
            best_sad = jnp.where(better, sad, best_sad)
            bmv = jnp.where(better[:, None], jnp.stack([cy, cx], 1), bmv)
    return bmv + centers, best_sad


def subpel_refine(ref_plane, src_blocks, mb_pos, mv_fp, best_sad, taps,
                  bounds, mv_pen=None):
    """Half- then quarter-pel refine via the production MC kernel.

    mv_fp [N,2] full-pel; bounds (lo_r, hi_r, lo_c, hi_c) [N] arrays in
    1/8-pel units. Returns (mv [N,2] eighth-pel with even components, sad)."""
    n = src_blocks.shape[0]
    mv = mv_fp * 8
    lo_r, hi_r, lo_c, hi_c = bounds
    ref3 = ref_plane[None]
    zero_ref = jnp.zeros(n, jnp.int32)
    for sub in (4, 2):
        offs = [(-sub, 0), (sub, 0), (0, -sub), (0, sub),
                (-sub, -sub), (-sub, sub), (sub, -sub), (sub, sub)]
        cand_mvs = []
        for ddy, ddx in offs:
            c = mv + jnp.asarray([ddy, ddx])
            c = jnp.stack([jnp.clip(c[:, 0], lo_r, hi_r),
                           jnp.clip(c[:, 1], lo_c, hi_c)], 1)
            cand_mvs.append(c)
        allc = jnp.concatenate(cand_mvs, axis=0)  # [8N, 2]
        starts = jnp.stack([jnp.tile(mb_pos[:, 0], 8) + (allc[:, 0] >> 3),
                            jnp.tile(mb_pos[:, 1], 8) + (allc[:, 1] >> 3)], 1)
        preds = P.mc_predict_blocks(ref3, jnp.tile(zero_ref, 8), starts,
                                    allc[:, 1] & 7, allc[:, 0] & 7, taps, 16)
        sads = jnp.sum(jnp.abs(preds - jnp.tile(src_blocks, (8, 1, 1))),
                       axis=(1, 2)).reshape(8, n)
        if mv_pen is not None:
            mvcost, pred8, sadpb = mv_pen
            cmv8 = jnp.stack(cand_mvs, axis=0)  # [8, N, 2]
            sads = sads + _mv_penalty(
                mvcost, cmv8[:, :, 0] - pred8[None, :, 0],
                cmv8[:, :, 1] - pred8[None, :, 1], sadpb)
        bi = jnp.argmin(sads, axis=0)
        bs = jnp.min(sads, axis=0)
        cmv = jnp.stack(cand_mvs, axis=0)  # [8, N, 2]
        picked = cmv[bi, jnp.arange(n)]
        better = bs < best_sad
        best_sad = jnp.where(better, bs, best_sad)
        mv = jnp.where(better[:, None], picked, mv)
    return mv, best_sad


def near_mv_lattice(mvf, R, C, above_mv=None, row_off=0,
                    n_rows_total=None):
    """Batched vp8_find_near_mvs (findnearmv.c:24-140, decodemv.c:348-407)
    under the device-decision approximation that every in-frame neighbor
    is an inter MB coded with the given motion field (sign bias 0, no
    SPLITMV neighbors).  The pack layer recomputes the exact lattice from
    final modes; this one prices NEAREST/NEAR/ZERO candidates during the
    batched decision.

    mvf [N, 2] int32 eighth-pel.  Row-sharded callers pass `above_mv`
    [C, 2] (the neighbor shard's last MV row; zeros + masked out when
    row_off == 0), `row_off` (global index of local row 0) and
    `n_rows_total` so the vp8_clamp_mv2 bounds stay frame-global.
    Returns (nearest, near, best) [N, 2] clamped MVs and cnt [N, 4] for
    MODE_CONTEXTS indexing."""
    if n_rows_total is None:
        n_rows_total = R
    mv = mvf.reshape(R, C, 2)
    zero2 = jnp.zeros((R, C, 2), jnp.int32)
    if above_mv is None:
        above_row = zero2[0]
    else:
        above_row = above_mv.reshape(C, 2)
    amv = jnp.concatenate([above_row[None], mv[:-1]], 0)
    lmv = jnp.concatenate([zero2[:, :1], mv[:, :-1]], 1)
    al_row0 = jnp.concatenate([zero2[0, :1], above_row[:-1]], 0)
    almv = jnp.concatenate(
        [al_row0[None],
         jnp.concatenate([zero2[1:, :1], mv[:-1, :-1]], 1)], 0)
    grow = jnp.arange(R)[:, None] + row_off
    va = jnp.broadcast_to(grow > 0, (R, C))
    vl = jnp.broadcast_to(jnp.arange(C)[None, :] > 0, (R, C))
    val = va & vl

    def nz(m):
        return (m != 0).any(-1)

    i32 = jnp.int32
    # above neighbor (weight 2)
    a_nz = va & nz(amv)
    near1 = jnp.where(a_nz[..., None], amv, 0)
    near2 = zero2
    cnt0 = jnp.where(va & ~a_nz, 2, 0).astype(i32)
    cnt1 = jnp.where(a_nz, 2, 0).astype(i32)
    cnt2 = jnp.zeros((R, C), i32)
    cnt3 = jnp.zeros((R, C), i32)
    nmv = a_nz.astype(i32)
    # left neighbor (weight 2)
    l_nz = vl & nz(lmv)
    same_l = l_nz & (nmv == 1) & (lmv == near1).all(-1)
    cnt1 = cnt1 + jnp.where(same_l, 2, 0)
    new_l = l_nz & ~same_l
    to2 = new_l & (nmv == 1)
    to1 = new_l & (nmv == 0)
    near2 = jnp.where(to2[..., None], lmv, near2)
    near1 = jnp.where(to1[..., None], lmv, near1)
    cnt2 = cnt2 + jnp.where(to2, 2, 0)
    cnt1 = cnt1 + jnp.where(to1, 2, 0)
    cnt0 = cnt0 + jnp.where(vl & ~l_nz, 2, 0)
    nmv = nmv + new_l.astype(i32)
    # above-left neighbor (weight 1) — compared against the most recently
    # entered MV only (near_mvs[nmv]), like the reference
    al_nz = val & nz(almv)
    cur_top = jnp.where((nmv == 2)[..., None], near2, near1)
    same_al = al_nz & (nmv > 0) & (almv == cur_top).all(-1)
    cnt1 = cnt1 + (same_al & (nmv == 1)).astype(i32)
    cnt2 = cnt2 + (same_al & (nmv == 2)).astype(i32)
    new_al = al_nz & ~same_al
    t1 = new_al & (nmv == 0)
    t2 = new_al & (nmv == 1)
    t3 = new_al & (nmv == 2)
    near1 = jnp.where(t1[..., None], almv, near1)
    near2 = jnp.where(t2[..., None], almv, near2)
    cnt1 = cnt1 + t1.astype(i32)
    cnt2 = cnt2 + t2.astype(i32)
    cnt3 = cnt3 + t3.astype(i32)
    cnt0 = cnt0 + jnp.where(val & ~al_nz, 1, 0)
    # "if cnt[3] && near_mvs[nmv] == near_mvs[1]: cnt[1] += 1"
    cnt1 = cnt1 + (t3 & (almv == near1).all(-1)).astype(i32)
    cnt3 = jnp.zeros((R, C), i32)      # SPLITMV neighbor count: none
    # order NEAREST/NEAR by count
    swap = cnt2 > cnt1
    n1 = jnp.where(swap[..., None], near2, near1)
    n2 = jnp.where(swap[..., None], near1, near2)
    c1 = jnp.where(swap, cnt2, cnt1)
    c2 = jnp.where(swap, cnt1, cnt2)
    best = jnp.where((c1 >= cnt0)[..., None], n1, 0)
    # vp8_clamp_mv2 bounds (MARGIN = 16<<3), frame-global rows
    rows = jnp.arange(R)[:, None] + row_off
    cols = jnp.arange(C)[None, :]
    lo_r = (-(rows * 16) << 3) - 128
    hi_r = (((n_rows_total - 1 - rows) * 16) << 3) + 128
    lo_c = (-(cols * 16) << 3) - 128
    hi_c = (((C - 1 - cols) * 16) << 3) + 128

    def clamp(m):
        return jnp.stack([jnp.clip(m[..., 0], lo_r, hi_r),
                          jnp.clip(m[..., 1], lo_c, hi_c)], -1)

    N = R * C
    cnt = jnp.stack([cnt0, c1, c2, cnt3], -1).reshape(N, 4)
    return (clamp(n1).reshape(N, 2), clamp(n2).reshape(N, 2),
            clamp(best).reshape(N, 2), cnt)


def intra_mode_preds(src_plane, mb_pos, n_rows, n_cols, bw, row_off=0):
    """Batched DC/V/H/TM 16x16/8x8 predictions from SOURCE neighbors
    (decision approximation; reconstruction later uses true recon
    neighbors in the wavefront).  Returns [N, 4, bw, bw] int32.

    row_off: global MB-row index of local row 0 (row-sharded callers —
    the 127-fill boundary condition applies only at the true frame
    top)."""
    n = mb_pos.shape[0]

    def gather(py, px):
        above = jax.lax.dynamic_slice(src_plane, (py - 1, px - 1),
                                      (1, bw + 1))[0]
        left = jax.lax.dynamic_slice(src_plane, (py, px - 1),
                                     (bw, 1))[:, 0]
        return above.astype(jnp.int32), left.astype(jnp.int32)

    above_x, left_x = jax.vmap(gather)(mb_pos[:, 0], mb_pos[:, 1])
    tl = above_x[:, 0]
    above = above_x[:, 1:]
    r0 = ((jnp.arange(n) // n_cols) + row_off) == 0
    c0 = (jnp.arange(n) % n_cols) == 0
    above = jnp.where(r0[:, None], 127, above)
    left_x = jnp.where(c0[:, None], 129, left_x)
    tl = jnp.where(r0 | c0, jnp.where(r0, 127, 129), tl)
    up_av = (~r0).astype(jnp.int32)
    lf_av = (~c0).astype(jnp.int32)
    total = jnp.sum(above, 1) * up_av + jnp.sum(left_x, 1) * lf_av
    shift = {16: 3, 8: 2}[bw] + up_av + lf_av
    dc = jnp.where(up_av | lf_av,
                   (total + jnp.left_shift(1, shift - 1)) >> shift, 128)
    pred_dc = dc[:, None, None] + jnp.zeros((n, bw, bw), jnp.int32)
    pred_v = jnp.tile(above[:, None, :], (1, bw, 1))
    pred_h = jnp.tile(left_x[:, :, None], (1, 1, bw))
    pred_tm = jnp.clip(left_x[:, :, None] + above[:, None, :]
                       - tl[:, None, None], 0, 255)
    return jnp.stack([pred_dc, pred_v, pred_h, pred_tm], axis=1)


def intra_mode_costs(src_plane, src_blocks, mb_pos, n_rows, n_cols, bw):
    """Batched DC/V/H/TM SAD cost vs SOURCE neighbors. [N, 4]."""
    preds = intra_mode_preds(src_plane, mb_pos, n_rows, n_cols, bw)
    return jnp.sum(jnp.abs(preds - src_blocks[:, None]), axis=(2, 3))
