"""TPU-native VP8 encoder.

Device pipeline (the encoder twin of tpu_decoder, covering the reference's
hot encoder path — SURVEY.md §2.4 ME/FDCT/quant/SIMD rows):

  A. decision program: whole-frame batched motion search (ops/me.py dense
     step-2 grid + full-pel refine + half/quarter-pel refine through the
     production MC kernel) and batched intra DC/V/H/TM costs; per-MB
     inter/intra choice as array ops;
  B. encode program: batched MC predictions for the chosen MVs, then the
     encode wavefront (wavefront.encode_recon_blocks) — intra predictions
     from true reconstructed neighbors, FDCT/WHT + quantization, and
     decoder-exact in-loop reconstruction;
  C. loop filter wavefront (shared with the decoder) + border extension →
     device-resident reference frames for the next frame's search.

The host packs the bitstream (mode/MV/token entropy layer shared with the
golden Encoder) — mv→mode mapping against the near-MV lattice happens at
pack time once all per-MB decisions are final.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import me as ME
from ..ops import predict as P
from ..ops import rd_device as RD
from ..ops import tables as T
from ..ops import transforms as tf
from . import refdec, wavefront as wf
from .encoder import Encoder, _default_token_costs, _uv_mv
from .refdec import (DC_PRED, V_PRED, H_PRED, TM_PRED, ZEROMV, NEWMV,
                     NEARESTMV, NEARMV, INTRA_FRAME, LAST_FRAME, BORDER,
                     dequant_factors)
from .tpu_decoder import B, B2, DeviceFrame, _extend_borders

_TCB = None


@functools.partial(jax.jit, static_argnums=(0, 1))
def _blockify(R, C, y_pl, u_pl, v_pl):
    """Source planes (uint8, device) -> per-MB int32 blocks on device.
    Replaces the redundant host-side int32 block upload (at 720p: ~5.5
    MB/frame over the host->TPU link for data already present as the
    uint8 planes)."""
    iy = jax.lax.dynamic_slice(y_pl, (B, B), (R * 16, C * 16)) \
        .astype(jnp.int32)
    iu = jax.lax.dynamic_slice(u_pl, (B2, B2), (R * 8, C * 8)) \
        .astype(jnp.int32)
    iv = jax.lax.dynamic_slice(v_pl, (B2, B2), (R * 8, C * 8)) \
        .astype(jnp.int32)
    yb = iy.reshape(R, 16, C, 16).transpose(0, 2, 1, 3) \
        .reshape(R * C, 16, 16)
    ub = iu.reshape(R, 8, C, 8).transpose(0, 2, 1, 3).reshape(R * C, 8, 8)
    vb = iv.reshape(R, 8, C, 8).transpose(0, 2, 1, 3).reshape(R * C, 8, 8)
    return yb, ub, vb


def _tcb_tables():
    """Banded device token-cost tables under the default coefficient
    probabilities (the golden encoder's _tc model).  Types: 0 Y-with-Y2,
    1 Y2, 2 UV, 3 Y-without-Y2 (B_PRED/SPLITMV)."""
    global _TCB
    if _TCB is None:
        tc = _default_token_costs()
        _TCB = tuple(RD.banded_token_costs(tc, t) for t in range(4))
    return _TCB


def _uv_inter_rd(R, C, ref_u, ref_v, ub, vb, mv8, taps, dqu, qidx, tcb2,
                 row_off=0):
    """Chroma rate/dist of an inter candidate: derive the chroma MV
    (reconinter.c:418-424), MC-predict, cost (rd_inter16x16_uv role).
    row_off: global MB-row of local row 0 (row-sharded callers)."""
    N = R * C
    mb = jnp.arange(N)
    mb_r, mb_c = mb // C + row_off, mb % C
    w_r = mv8[:, 0] + jnp.where(mv8[:, 0] >= 0, 1, -1)
    w_c = mv8[:, 1] + jnp.where(mv8[:, 1] >= 0, 1, -1)
    uv_r = jnp.sign(w_r) * (jnp.abs(w_r) // 2)
    uv_c = jnp.sign(w_c) * (jnp.abs(w_c) // 2)
    csy = B2 + mb_r * 8 + (uv_r >> 3)
    csx = B2 + mb_c * 8 + (uv_c >> 3)
    cstarts = jnp.stack([csy, csx], 1)
    zero = jnp.zeros(N, jnp.int32)
    pu = P.mc_predict_blocks(ref_u[None], zero, cstarts, uv_c & 7,
                             uv_r & 7, taps, 8)
    pv = P.mc_predict_blocks(ref_v[None], zero, cstarts, uv_c & 7,
                             uv_r & 7, taps, 8)
    return RD.rd_uv(ub - pu, vb - pv, dqu, qidx, tcb2)


def _uv_intra_rd(R, C, src_u_pl, src_v_pl, ub, vb, dqu, qidx, tcb2,
                 uvmode_cost, rdmult, rddiv, row_off=0):
    """RD-pick the chroma intra mode (rd_pick_intra_mbuv_mode role).
    Returns (best mode [N], its rate incl. signaling [N], dist [N])."""
    N = R * C
    mb = jnp.arange(N)
    cpos = jnp.stack([B2 + (mb // C + row_off) * 8, B2 + (mb % C) * 8], 1)
    ipu = jnp.moveaxis(
        ME.intra_mode_preds(src_u_pl, cpos, R, C, 8, row_off=row_off),
        1, 0)
    ipv = jnp.moveaxis(
        ME.intra_mode_preds(src_v_pl, cpos, R, C, 8, row_off=row_off),
        1, 0)
    dqub = jnp.broadcast_to(dqu[None], (4, N, 2))
    qxb = jnp.broadcast_to(qidx[None], (4, N))
    ruv, duv = RD.rd_uv(ub[None] - ipu, vb[None] - ipv, dqub, qxb, tcb2)
    ruv = ruv + uvmode_cost[:, None]
    rd_ = RD.rdc(ruv, duv / 4.0, rdmult, rddiv)
    best = jnp.argmin(rd_, axis=0)
    ar = jnp.arange(N)
    return best.astype(jnp.int32), ruv[best, ar], duv[best, ar]


def _bpred_rd(R, C, src_y_pl, yb, dq1, qidx, tcb3, bmode_cost,
              rdmult, rddiv):
    """Approximate B_PRED candidate rate/dist from SOURCE neighbors
    (rd_pick_intra4x4mby_modes role, rdopt.c; decision only — the encode
    wavefront re-chooses bmodes from true reconstructed neighbors).
    Per-subblock best-of-10 under ctx-0 token rates, then the MB rate is
    re-costed with within-MB chained contexts.  Returns (rate, dist) [N]."""
    N = R * C
    # neighbor pixels for EVERY 4x4 sub-block position at once via
    # static strided slices of the padded source plane (the vmapped
    # per-block dynamic_slice formulation gathered 3x16*N tiny windows
    # — pure TPU gather overhead; identical pixel values)
    SR, SC = 4 * R, 4 * C                       # sub-block grid
    rows_a = src_y_pl[B - 1:B - 1 + 16 * R:4, :].astype(jnp.int32)
    # above8: cols [x0, x0+8) for x0 = B + 4j -> two adjacent 4-tiles
    cols = rows_a[:, B:B + 16 * C + 4]          # one extra tile right
    tiles = cols[:, :4 * (SC + 1)].reshape(SR, SC + 1, 4)
    a8g = jnp.concatenate([tiles[:, :SC], tiles[:, 1:SC + 1]], axis=2)
    # l4: rows [y0, y0+4) at col x0-1
    colw = src_y_pl[B:B + 16 * R, B - 1:B - 1 + 16 * C:4] \
        .astype(jnp.int32)                       # [16R, SC]
    l4g = colw.reshape(SR, 4, SC).transpose(0, 2, 1)   # [SR, SC, 4]
    tlg = rows_a[:, B - 1:B - 1 + 16 * C:4]             # [SR, SC]
    # raster sub-block grid -> MB-major (mb, k) order: pure reshape
    def to_mb_major(x):
        t = x.reshape(R, 4, C, 4, *x.shape[2:])
        return jnp.moveaxis(t, 2, 1).reshape(N * 16, *x.shape[2:])

    a8 = to_mb_major(a8g)
    l4 = to_mb_major(l4g)
    tl = to_mb_major(tlg)
    preds = jnp.stack(jax.vmap(P.bpred_4x4_all)(a8, l4, tl), 0)  # [10,NB,4,4]
    NB = N * 16
    src4 = RD._mb_blocks(yb).reshape(NB, 4, 4)
    resid = src4[None] - preds
    coefs = tf.fdct4x4_batch(resid.reshape(10 * NB, 4, 4)) \
        .reshape(10, NB, 16)
    dqb = jnp.repeat(dq1, 16, axis=0)                 # [NB, 2]
    qxb = jnp.repeat(qidx, 16, axis=0)
    q, _ = tf.regular_quant_batch(coefs, dqb[None], qxb[None],
                                  jnp.zeros((), bool))
    dqv = jnp.concatenate([dqb[:, 0:1],
                           jnp.repeat(dqb[:, 1:2], 15, axis=1)],
                          1).astype(jnp.float32)
    dist10 = jnp.sum((coefs.astype(jnp.float32) -
                      q.astype(jnp.float32) * dqv[None]) ** 2, -1)
    rate10, _ = RD.block_rate(q, tcb3, 0, jnp.zeros((10, NB), jnp.int32))
    rd10 = RD.rdc(rate10 + bmode_cost[:, None], dist10 / 4.0,
                  rdmult, rddiv)
    bm = jnp.argmin(rd10, axis=0)                     # [NB]
    ar = jnp.arange(NB)
    q_best = q[bm, ar]                                # [NB, 16]
    dist_best = dist10[bm, ar]
    # within-MB chained contexts for the final MB rate
    scan = jnp.arange(16)
    eobs = jnp.max(jnp.where(q_best[..., RD.ZZ] != 0, scan + 1, 0), -1)
    nz = (eobs > 0).astype(jnp.int32).reshape(N, 4, 4)
    ctx = (jnp.concatenate([jnp.zeros_like(nz[:, :1]), nz[:, :-1]], 1) +
           jnp.concatenate([jnp.zeros_like(nz[:, :, :1]), nz[:, :, :-1]],
                           2)).reshape(NB)
    rate_f, _ = RD.block_rate(q_best, tcb3, 0, ctx)
    b_rate = (rate_f + bmode_cost[bm]).reshape(N, 16).sum(-1)
    b_dist = dist_best.reshape(N, 16).sum(-1)
    return b_rate, b_dist


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _decide_rd_inter(R, C, n_refs, me_step, use_bpred,
                     refs_y, refs_u, refs_v,
                     src_y_pl,
                     src_u_pl, src_v_pl, yb, ub, vb, centers, taps,
                     lo_r, hi_r, lo_c, hi_c, mvcost, prev8, sadpb,
                     tcb0, tcb1, tcb2, tcb3, dq1, dq2, dqu, qidx,
                     rdmult, rddiv, ymode_cost, uvmode_cost, bmode_cost,
                     ci0, ci1, modectx, c0tab, c1tab):
    """Program A (RD form): per-reference motion search + token-cost RD
    mode decision over {DC,V,H,TM} intra and
    {ZEROMV, NEARESTMV, NEARMV, NEWMV} x {LAST, GOLDEN, ALTREF} — the
    vp8_rd_pick_inter_mode reference-frame candidate loop (rdopt.c:1714)
    batched over every MB at once.  NEAREST/NEAR candidates and their
    mode-signaling costs come from a device near-MV lattice built over the
    LAST search field (ME.near_mv_lattice; with sign bias 0 the lattice is
    identical for every target reference).  Intra predictions come from
    source neighbors (decision approximation; the encode wavefront
    reconstructs from true neighbors).

    refs_y [nr,H,W], refs_u/refs_v [nr,Hc,Wc]; ci1 [nr] per-ref header
    cost; modectx [6,4] MODE_CONTEXTS; c0tab/c1tab [256] bit-cost tables.
    Returns (mv [N,2], ref_k [N] -1=intra else 0..nr-1, ymode, uvmode)."""
    N = R * C
    mb = jnp.arange(N)
    mb_r, mb_c = mb // C, mb % C
    mb_pos = jnp.stack([B + mb_r * 16, B + mb_c * 16], 1)
    pen = (mvcost, prev8, sadpb)
    bounds = (lo_r, hi_r, lo_c, hi_c)
    mvs = []
    for k in range(n_refs):
        mv_fp, sad_fp = ME.full_search(refs_y[k], yb, centers, mb_pos,
                                       mv_pen=pen, step=me_step)
        mv8k, _ = ME.subpel_refine(refs_y[k], yb, mb_pos, mv_fp, sad_fp,
                                   taps, bounds, mv_pen=pen)
        mvs.append(mv8k)
    nearest, near, best_mv, cnt = ME.near_mv_lattice(mvs[0], R, C)
    p0 = modectx[cnt[:, 0], 0]
    p1 = modectx[cnt[:, 1], 1]
    p2 = modectx[cnt[:, 2], 2]
    p3 = modectx[cnt[:, 3], 3]
    czero = jnp.take(c0tab, p0)
    cnearest = jnp.take(c1tab, p0) + jnp.take(c0tab, p1)
    cnear = cnearest - jnp.take(c0tab, p1) + jnp.take(c1tab, p1) + \
        jnp.take(c0tab, p2)
    cnew = cnear - jnp.take(c0tab, p2) + jnp.take(c1tab, p2) + \
        jnp.take(c0tab, p3)

    # Y candidates: 4 intra + (zero, nearest, near, new) per reference
    ipreds = jnp.moveaxis(ME.intra_mode_preds(src_y_pl, mb_pos, R, C, 16),
                          1, 0)                       # [4,N,16,16]
    zero2 = jnp.zeros((N, 2), jnp.int32)
    cand_mvs = []
    for k in range(n_refs):
        cand_mvs += [zero2, nearest, near, mvs[k]]
    Kin = 4 * n_refs
    allmv = jnp.stack(cand_mvs, 0)                     # [Kin, N, 2]
    flat_mv = allmv.reshape(Kin * N, 2)
    flat_ref = jnp.repeat(jnp.arange(n_refs, dtype=jnp.int32), 4 * N)
    pos_t = jnp.tile(mb_pos, (Kin, 1))
    starts = jnp.stack([pos_t[:, 0] + (flat_mv[:, 0] >> 3),
                        pos_t[:, 1] + (flat_mv[:, 1] >> 3)], 1)
    pred_in = P.mc_predict_blocks(refs_y, flat_ref, starts,
                                  flat_mv[:, 1] & 7, flat_mv[:, 0] & 7,
                                  taps, 16).reshape(Kin, N, 16, 16)
    preds = jnp.concatenate([ipreds, pred_in], 0)
    K = 4 + Kin
    dq1b = jnp.broadcast_to(dq1[None], (K, N, 2))
    dq2b = jnp.broadcast_to(dq2[None], (K, N, 2))
    qxb = jnp.broadcast_to(qidx[None], (K, N))
    ry, dy, _ = RD.rd_y16(yb[None] - preds, dq1b, dq2b, qxb, tcb0, tcb1)

    # UV: best intra mode (shared by intra candidates) + per-candidate MC
    uvbest, ruv_i, duv_i = _uv_intra_rd(R, C, src_u_pl, src_v_pl, ub, vb,
                                        dqu, qidx, tcb2, uvmode_cost,
                                        rdmult, rddiv)
    w_r = flat_mv[:, 0] + jnp.where(flat_mv[:, 0] >= 0, 1, -1)
    w_c = flat_mv[:, 1] + jnp.where(flat_mv[:, 1] >= 0, 1, -1)
    uv_r = jnp.sign(w_r) * (jnp.abs(w_r) // 2)
    uv_c = jnp.sign(w_c) * (jnp.abs(w_c) // 2)
    mb_r_t = jnp.tile(mb_r, (Kin,))
    mb_c_t = jnp.tile(mb_c, (Kin,))
    cstarts = jnp.stack([B2 + mb_r_t * 8 + (uv_r >> 3),
                         B2 + mb_c_t * 8 + (uv_c >> 3)], 1)
    pu = P.mc_predict_blocks(refs_u, flat_ref, cstarts, uv_c & 7,
                             uv_r & 7, taps, 8).reshape(Kin, N, 8, 8)
    pv = P.mc_predict_blocks(refs_v, flat_ref, cstarts, uv_c & 7,
                             uv_r & 7, taps, 8).reshape(Kin, N, 8, 8)
    dqub = jnp.broadcast_to(dqu[None], (Kin, N, 2))
    qxb_in = jnp.broadcast_to(qidx[None], (Kin, N))
    ruv_in, duv_in = RD.rd_uv(ub[None] - pu, vb[None] - pv, dqub,
                              qxb_in, tcb2)

    # NEWMV signaling cost per reference (vp8_mv_bit_cost vs the lattice
    # best_ref_mv, weight 96)
    def mv_rate(mv8):
        dr = jnp.clip(jnp.abs(mv8[:, 0] - best_mv[:, 0]) >> 1, 0, 1023)
        dc_ = jnp.clip(jnp.abs(mv8[:, 1] - best_mv[:, 1]) >> 1, 0, 1023)
        return ((jnp.take(mvcost[0], dr) + jnp.take(mvcost[1], dc_))
                * 96) >> 7

    mode_costs = [czero, cnearest, cnear, cnew]
    rate_rows = [ci0 + ymode_cost[m] + ry[m] + ruv_i for m in range(4)]
    dist_rows = [dy[m] / 4.0 + duv_i / 4.0 for m in range(4)]
    for k in range(n_refs):
        for j in range(4):
            i = 4 * k + j
            extra = mv_rate(mvs[k]) if j == 3 else 0
            rate_rows.append(ci1[k] + mode_costs[j] + extra +
                             ry[4 + i] + ruv_in[i])
            dist_rows.append(dy[4 + i] / 4.0 + duv_in[i] / 4.0)
    if use_bpred:
        # B_PRED candidate (fixed inter-frame bmode probs); pruned from
        # the traced graph entirely on the fast speed ladder (sf.bpred)
        br, bd = _bpred_rd(R, C, src_y_pl, yb, dq1, qidx, tcb3, bmode_cost,
                           rdmult, rddiv)
        rate_rows.append(ci0 + ymode_cost[4] + br + ruv_i)
        dist_rows.append(bd / 4.0 + duv_i / 4.0)
    rate = jnp.stack(rate_rows, 0)
    dist = jnp.stack(dist_rows, 0)
    rdall = RD.rdc(rate, dist, rdmult, rddiv)
    best = jnp.argmin(rdall, axis=0)
    is_bpred = (best == (4 + Kin)) if use_bpred \
        else jnp.zeros_like(best, dtype=bool)
    ymode = jnp.where(is_bpred, 4,
                      jnp.argmin(rdall[:4], axis=0)).astype(jnp.int32)
    inter = (best >= 4) & ~is_bpred
    ref_k = jnp.where(inter, (best - 4) // 4, -1).astype(jnp.int32)
    ar = jnp.arange(N)
    mv_out = jnp.where(inter[:, None],
                       allmv[jnp.clip(best - 4, 0, Kin - 1), ar], 0)
    return mv_out, ref_k, ymode, uvbest


@functools.partial(jax.jit, static_argnums=(0, 1))
def _decide_rd_key(R, C, src_y_pl, src_u_pl, src_v_pl, yb, ub, vb,
                   tcb0, tcb1, tcb2, dq1, dq2, dqu, qidx, rdmult, rddiv,
                   ymode_cost, uvmode_cost):
    """Keyframe RD decision over {DC,V,H,TM} (vp8_rd_pick_intra_mode
    role, rdopt.c:2374)."""
    N = R * C
    mb = jnp.arange(N)
    mb_pos = jnp.stack([B + (mb // C) * 16, B + (mb % C) * 16], 1)
    ipreds = jnp.moveaxis(ME.intra_mode_preds(src_y_pl, mb_pos, R, C, 16),
                          1, 0)
    dq1b = jnp.broadcast_to(dq1[None], (4, N, 2))
    dq2b = jnp.broadcast_to(dq2[None], (4, N, 2))
    qxb = jnp.broadcast_to(qidx[None], (4, N))
    ry, dy, _ = RD.rd_y16(yb[None] - ipreds, dq1b, dq2b, qxb, tcb0, tcb1)
    uvbest, ruv_i, duv_i = _uv_intra_rd(R, C, src_u_pl, src_v_pl, ub, vb,
                                        dqu, qidx, tcb2, uvmode_cost,
                                        rdmult, rddiv)
    rate = ymode_cost[:, None] + ry + ruv_i[None]
    dist = dy / 4.0 + duv_i[None] / 4.0
    rdall = RD.rdc(rate, dist, rdmult, rddiv)
    ymode = jnp.argmin(rdall, axis=0).astype(jnp.int32)
    return ymode, uvbest


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _encode_device(R, C, use_trellis, refs_y, refs_u, refs_v, refk,
                   src_y_blocks, src_u_blocks, src_v_blocks,
                   mode, uv_mode, intra, mv8, taps, dq_y1, dq_y2, dq_uv,
                   qidx, tcb0, tcb1, tcb2, tcb3, bmode_cost,
                   rdmult, rddiv):
    """Program B: MC preds (per-MB reference selection) + encode
    wavefront.  use_trellis statically prunes the whole-frame optimize_b
    pass (SpeedFeatures.trellis, the vp8_optimize_mby role) from the
    traced graph on the fast ladder."""
    N = R * C
    sch = wf.schedule(R, C)
    mb = jnp.arange(N)
    mb_r, mb_c = mb // C, mb % C
    rk = jnp.clip(refk, 0, refs_y.shape[0] - 1)
    # luma MC
    sy = B + mb_r * 16 + (mv8[:, 0] >> 3)
    sx = B + mb_c * 16 + (mv8[:, 1] >> 3)
    zero = jnp.zeros(N, jnp.int32)
    pred_y = P.mc_predict_blocks(refs_y, rk, jnp.stack([sy, sx], 1),
                                 mv8[:, 1] & 7, mv8[:, 0] & 7, taps, 16)
    # chroma MV derivation (reconinter.c:418-424)
    w_r = mv8[:, 0] + jnp.where(mv8[:, 0] >= 0, 1, -1)
    w_c = mv8[:, 1] + jnp.where(mv8[:, 1] >= 0, 1, -1)
    uv_r = jnp.sign(w_r) * (jnp.abs(w_r) // 2)
    uv_c = jnp.sign(w_c) * (jnp.abs(w_c) // 2)
    csy = B2 + mb_r * 8 + (uv_r >> 3)
    csx = B2 + mb_c * 8 + (uv_c >> 3)
    cstarts = jnp.stack([csy, csx], 1)
    pred_u = P.mc_predict_blocks(refs_u, rk, cstarts, uv_c & 7,
                                 uv_r & 7, taps, 8)
    pred_v = P.mc_predict_blocks(refs_v, rk, cstarts, uv_c & 7,
                                 uv_r & 7, taps, 8)
    # chroma intra mode: RD-chosen by the decision program for intra MBs
    uv_mode = jnp.where(intra, uv_mode, DC_PRED)

    if not use_trellis:
        # fast ladder: the wavefront's in-lane regular quant IS the final
        # quant (no optimize_b), so the whole-frame ext section is a
        # no-op — prune it from the graph entirely
        qcoeff, eobs, ry, ru, rv, bmodes = wf.encode_recon_blocks(
            R, C, sch, src_y_blocks, src_u_blocks, src_v_blocks,
            pred_y, pred_u, pred_v, mode, uv_mode, intra, dq_y1, dq_y2,
            dq_uv, qidx, None, None, None, tcb3, bmode_cost, rdmult,
            rddiv)
        return (qcoeff.astype(jnp.int16), eobs.astype(jnp.int32), uv_mode,
                ry, ru, rv, bmodes)

    # whole-frame trellis (optimize_b) for inter MBs: their predictions
    # don't depend on the wavefront carry, so transform+quant+trellis run
    # batched here; the wavefront substitutes these levels and derives
    # the decoder-exact reconstruction from them.  Intra MBs quantize
    # in-lane (their predictions come from the reconstruction carry).
    coefs_y = tf.fdct4x4_batch(RD._mb_blocks(src_y_blocks - pred_y))         .reshape(N, 16, 16)
    y2c = tf.walsh4x4_batch(coefs_y[:, :, 0])
    qy0, _ = tf.regular_quant_batch(coefs_y, dq_y1[:, None, :],
                                    qidx[:, None], jnp.ones((), bool))
    qy20, _ = tf.regular_quant_batch(y2c, dq_y2, qidx, jnp.zeros((), bool))
    scan16 = jnp.arange(16)
    ZZi = jnp.asarray(np.asarray(RD.ZZ))
    eob_y = jnp.max(jnp.where(qy0[..., ZZi] != 0, scan16 + 1, 0), -1)
    nzy = (jnp.maximum(eob_y, 1) > 1).astype(jnp.int32).reshape(N, 4, 4)
    ctx_y = (jnp.concatenate([jnp.zeros_like(nzy[:, :1]), nzy[:, :-1]], 1) +
             jnp.concatenate([jnp.zeros_like(nzy[:, :, :1]), nzy[:, :, :-1]],
                             2)).reshape(N, 16)
    qy_t, ey_t = RD.trellis_batch(coefs_y, qy0, dq_y1[:, None, :], tcb0,
                                  1, 4.0, ctx_y, rdmult, rddiv)
    ey_t = jnp.maximum(ey_t, 1)
    qy2_t, ey2_t = RD.trellis_batch(y2c, qy20, dq_y2, tcb1, 0, 16.0,
                                    jnp.zeros(N, jnp.int32), rdmult, rddiv)
    ublk = (src_u_blocks - pred_u).reshape(N, 2, 4, 2, 4)         .transpose(0, 1, 3, 2, 4).reshape(N, 4, 4, 4)
    vblk = (src_v_blocks - pred_v).reshape(N, 2, 4, 2, 4)         .transpose(0, 1, 3, 2, 4).reshape(N, 4, 4, 4)
    coefs_uv = tf.fdct4x4_batch(jnp.concatenate([ublk, vblk], 1))         .reshape(N, 8, 16)
    quv0, _ = tf.regular_quant_batch(coefs_uv, dq_uv[:, None, :],
                                     qidx[:, None], jnp.zeros((), bool))
    eob_uv = jnp.max(jnp.where(quv0[..., ZZi] != 0, scan16 + 1, 0), -1)
    nzuv = (eob_uv > 0).astype(jnp.int32).reshape(N, 2, 2, 2)
    ctx_uv = (jnp.concatenate([jnp.zeros_like(nzuv[:, :, :1]),
                               nzuv[:, :, :-1]], 2) +
              jnp.concatenate([jnp.zeros_like(nzuv[:, :, :, :1]),
                               nzuv[:, :, :, :-1]], 3)).reshape(N, 8)
    quv_t, euv_t = RD.trellis_batch(coefs_uv, quv0, dq_uv[:, None, :],
                                    tcb2, 0, 2.0, ctx_uv, rdmult, rddiv)
    q_ext = jnp.concatenate([qy_t, quv_t, qy2_t[:, None]], 1)  # [N,25,16]
    e_ext = jnp.concatenate([ey_t, euv_t, ey2_t[:, None]], 1)  # [N,25]
    use_ext = ~intra

    qcoeff, eobs, ry, ru, rv, bmodes = wf.encode_recon_blocks(
        R, C, sch, src_y_blocks, src_u_blocks, src_v_blocks,
        pred_y, pred_u, pred_v, mode, uv_mode, intra, dq_y1, dq_y2, dq_uv,
        qidx, q_ext, e_ext, use_ext, tcb3, bmode_cost, rdmult, rddiv)
    return (qcoeff.astype(jnp.int16), eobs.astype(jnp.int32), uv_mode,
            ry, ru, rv, bmodes)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _lf_device(R, C, do_lf, ry, ru, rv, flevel, mblim_a, blim_a, lim_a,
               hev_a, noskip_a):
    """Program C: loop filter + plane assembly + border extension."""
    sch = wf.schedule(R, C)
    if do_lf:
        ry, ru, rv = wf.loop_filter_blocks(
            R, C, sch, False, ry, ru, rv, flevel, mblim_a, blim_a, lim_a,
            hev_a, noskip_a)
    HP, WP = R * 16 + 2 * B, C * 16 + 2 * B
    HPc, WPc = R * 8 + 2 * B2, C * 8 + 2 * B2
    cy = jnp.zeros((HP, WP), jnp.uint8)
    cu = jnp.zeros((HPc, WPc), jnp.uint8)
    cv = jnp.zeros((HPc, WPc), jnp.uint8)
    cy = jax.lax.dynamic_update_slice(
        cy, tf.mbs_to_plane(ry, R, C, 16).astype(jnp.uint8), (B, B))
    cu = jax.lax.dynamic_update_slice(
        cu, tf.mbs_to_plane(ru, R, C, 8).astype(jnp.uint8), (B2, B2))
    cv = jax.lax.dynamic_update_slice(
        cv, tf.mbs_to_plane(rv, R, C, 8).astype(jnp.uint8), (B2, B2))
    cy = _extend_borders(cy, B, C * 16, R * 16)
    cu = _extend_borders(cu, B2, C * 8, R * 8)
    cv = _extend_borders(cv, B2, C * 8, R * 8)
    return cy, cu, cv


class TPUEncoder(Encoder):
    """VP8 encoder with the pixel pipeline on the TPU (decision + transform
    + reconstruction + loop filter device-side; entropy packing host-side).
    """

    # device-program dispatch hooks: the sharded multi-chip encoder
    # (parallel/sharded_encode.ShardedTPUEncoder) overrides these with
    # shard_map'd equivalents of identical global-view signatures
    _decide_key_fn = staticmethod(_decide_rd_key)
    _decide_inter_fn = staticmethod(_decide_rd_inter)
    _encode_fn = staticmethod(_encode_device)
    _lf_fn = staticmethod(_lf_device)

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        R, C = self.R, self.C
        HP, WP = R * 16 + 2 * B, C * 16 + 2 * B
        HPc, WPc = R * 8 + 2 * B2, C * 8 + 2 * B2
        z = DeviceFrame(jnp.zeros((HP, WP), jnp.uint8),
                        jnp.zeros((HPc, WPc), jnp.uint8),
                        jnp.zeros((HPc, WPc), jnp.uint8), self.w, self.h)
        # device reference ring (last/golden/altref share the zero frame
        # until refreshed — update_reference_frames onyx_if.c:2980 role)
        self.ref_last = z
        self.ref_gold = z
        self.ref_alt = z
        self.prev_mv = np.zeros((R * C, 2), np.int32)

    def encode_frame(self, y, u, v, keyframe=None, refresh_last=True,
                     refresh_golden=None, commit=True, show=True,
                     refresh_alt=False):
        if keyframe is None:
            keyframe = self.frame_count == 0
        if keyframe:
            self._reset_key_frame_state()
            self.prev_mv = np.zeros((self.R * self.C, 2), np.int32)
        self.refresh_last_flag = bool(refresh_last) or keyframe
        if refresh_golden is None:
            refresh_golden = bool(
                self.golden_interval and
                self.frame_count % self.golden_interval == 0)
        self.refresh_golden = bool(refresh_golden) or keyframe
        self.refresh_alt = bool(refresh_alt) or keyframe
        self.show_frame = bool(show) or keyframe
        R, C = self.R, self.C
        N = R * C
        # source planes, aligned + padded like the golden encoder
        src = refdec.FrameBuffer(self.w, self.h)
        sy_, su_, sv_ = src.visible()
        sy_[:] = y
        su_[:] = u
        sv_[:] = v
        bb, bb2 = BORDER, BORDER // 2
        src.y[bb:bb + src.ah, bb + self.w:bb + src.aw] = \
            src.y[bb:bb + src.ah, bb + self.w - 1:bb + self.w]
        src.y[bb + self.h:bb + src.ah, bb:bb + src.aw] = \
            src.y[bb + self.h - 1:bb + self.h, bb:bb + src.aw]
        cw, ch = (self.w + 1) // 2, (self.h + 1) // 2
        for p in (src.u, src.v):
            p[bb2:bb2 + src.ah // 2, bb2 + cw:bb2 + src.aw // 2] = \
                p[bb2:bb2 + src.ah // 2, bb2 + cw - 1:bb2 + cw]
            p[bb2 + ch:bb2 + src.ah // 2, bb2:bb2 + src.aw // 2] = \
                p[bb2 + ch - 1:bb2 + ch, bb2:bb2 + src.aw // 2]

        j = jnp.asarray
        src_y_pl = j(src.y)
        src_u_pl = j(src.u)
        src_v_pl = j(src.v)
        yb, ub, vb = _blockify(R, C, src_y_pl, src_u_pl, src_v_pl)
        taps = j(np.asarray(P.SIXTAP_TABLE, np.int32))

        mbr = np.arange(N) // C
        mbc = np.arange(N) % C
        lo_r = j(((-(mbr * 16) - 16) * 8).astype(np.int32))
        hi_r = j((((R - 1 - mbr) * 16 + 16) * 8).astype(np.int32))
        lo_c = j(((-(mbc * 16) - 16) * 8).astype(np.int32))
        hi_c = j((((C - 1 - mbc) * 16 + 16) * 8).astype(np.int32))

        dqs = dequant_factors(self.qindex, 0, 0, 0, 0, 0)
        self.dq_y1, self.dq_y2, self.dq_uv = dqs
        if self.seg_map_enc is not None:
            # per-segment quantizers (the decoder applies per-segment
            # dequant, mb_init_dequantizer decodframe.c:74-89 — the device
            # quantizer must match or the closed loop drifts)
            per = [dequant_factors(
                min(127, max(0, self.qindex + self.seg_q_deltas[s])),
                0, 0, 0, 0, 0) for s in range(4)]
            tab = np.asarray(per, np.int32)            # [4, 3, 2]
            segs = self.seg_map_enc.reshape(N)
            dq1 = j(tab[segs, 0])
            dq2 = j(tab[segs, 1])
            dqu = j(tab[segs, 2])
        else:
            dq1 = j(np.tile(np.asarray(dqs[0], np.int32), (N, 1)))
            dq2 = j(np.tile(np.asarray(dqs[1], np.int32), (N, 1)))
            dqu = j(np.tile(np.asarray(dqs[2], np.int32), (N, 1)))

        # per-MB quantizer index (zbin factor + RD), segment-aware
        if self.seg_map_enc is not None:
            qdel = np.asarray(self.seg_q_deltas, np.int32)
            qx_np = np.clip(self.qindex + qdel[self.seg_map_enc.reshape(N)],
                            0, 127).astype(np.int32)
        else:
            qx_np = np.full(N, self.qindex, np.int32)
        qidx = j(qx_np)

        # RD decision constants (vp8_initialize_rd_consts behavior)
        from . import rdopt
        rdm, rdd, _epb = rdopt.rd_consts(self.qindex)
        rdm_f = jnp.float32(rdm)
        rdd_f = jnp.float32(rdd)
        tcb0, tcb1, tcb2, tcb3 = _tcb_tables()
        bmode_cost_d = jnp.asarray(np.asarray(rdopt.BMODE_COST, np.int32))

        from .refdec import GOLDEN_FRAME, ALTREF_FRAME
        if keyframe:
            mv8 = np.zeros((N, 2), np.int32)
            intra = np.ones(N, bool)
            refk = np.full(N, -1, np.int32)
            ref_ids = [LAST_FRAME]
            ymode_d, uvb_d = self._decide_key_fn(
                R, C, src_y_pl, src_u_pl, src_v_pl, yb, ub, vb,
                tcb0, tcb1, tcb2, dq1, dq2, dqu, qidx, rdm_f, rdd_f,
                j(np.asarray(rdopt.KF_YMODE_COST[:4], np.int32)),
                j(np.asarray(rdopt.KF_UV_MODE_COST, np.int32)))
            ymode = np.asarray(ymode_d).astype(np.int32)
            uvmode = np.asarray(uvb_d).astype(np.int32)
        else:
            # reference set (rdopt.c:1714 candidate refs; identity dedup
            # like the golden encoder's refs list)
            ref_frames = [(self.ref_last, LAST_FRAME)]
            if self.sf.multi_ref:
                if self.ref_gold is not self.ref_last:
                    ref_frames.append((self.ref_gold, GOLDEN_FRAME))
                if (self.ref_alt is not self.ref_last and
                        self.ref_alt is not self.ref_gold):
                    ref_frames.append((self.ref_alt, ALTREF_FRAME))
            n_refs = len(ref_frames)
            ref_ids = [rid for _, rid in ref_frames]
            refs_y = jnp.stack([f.y for f, _ in ref_frames])
            refs_u = jnp.stack([f.u for f, _ in ref_frames])
            refs_v = jnp.stack([f.v for f, _ in ref_frames])

            lo = np.stack([-(mbr * 16) - 16, -(mbc * 16) - 16], 1)
            hi = np.stack([(R - 1 - mbr) * 16 + 16, (C - 1 - mbc) * 16 + 16],
                          1)
            centers = np.clip(self.prev_mv >> 3, lo, hi)
            # MV-rate cost tables + per-MB predictor (the previous frame's
            # MV stands in for best_ref_mv during the search; the in-program
            # lattice best_mv prices the NEWMV candidates) + sad-per-bit
            mvcost = j(np.stack([rdopt.MV_COST[0], rdopt.MV_COST[1]])
                       .astype(np.int32))
            pred8 = j(self.prev_mv.astype(np.int32))
            sadpb = jnp.int32(int(ME.SAD_PER_BIT16[self.qindex]))
            # per-ref header signaling costs (intra/last/gf tree)
            c_in = rdopt.cost1(self.prob_intra)
            ci0 = jnp.int32(rdopt.cost0(self.prob_intra))
            ci1_list = []
            for rid in ref_ids:
                if rid == LAST_FRAME:
                    ci1_list.append(c_in + rdopt.cost0(self.prob_last))
                elif rid == GOLDEN_FRAME:
                    ci1_list.append(c_in + rdopt.cost1(self.prob_last) +
                                    rdopt.cost0(self.prob_gf))
                else:
                    ci1_list.append(c_in + rdopt.cost1(self.prob_last) +
                                    rdopt.cost1(self.prob_gf))
            ci1 = j(np.asarray(ci1_list, np.int32))
            modectx = j(np.asarray(T.MODE_CONTEXTS, np.int32))
            c0tab = j(rdopt._C0.astype(np.int32))
            c1tab = j(rdopt._C1.astype(np.int32))
            me_step = 1 if self.sf.exhaustive_me else 2
            mv8_d, refk_d, ymode_d, uvb_d = self._decide_inter_fn(
                R, C, n_refs, me_step, bool(self.sf.bpred),
                refs_y, refs_u, refs_v,
                src_y_pl, src_u_pl, src_v_pl, yb, ub, vb,
                j(centers.astype(np.int32)), taps, lo_r, hi_r, lo_c, hi_c,
                mvcost, pred8, sadpb, tcb0, tcb1, tcb2, tcb3,
                dq1, dq2, dqu, qidx, rdm_f, rdd_f,
                j(np.asarray(rdopt.YMODE_COST[:5], np.int32)),
                j(np.asarray(rdopt.UV_MODE_COST, np.int32)),
                bmode_cost_d, ci0, ci1, modectx, c0tab, c1tab)
            mv8 = np.array(mv8_d)
            refk = np.asarray(refk_d).astype(np.int32)
            intra = refk < 0
            ymode = np.asarray(ymode_d).astype(np.int32)
            uvmode = np.asarray(uvb_d).astype(np.int32)

        mode_dev = j(ymode.astype(np.int32))
        if keyframe:
            enc_refs_y = self.ref_last.y[None]
            enc_refs_u = self.ref_last.u[None]
            enc_refs_v = self.ref_last.v[None]
        else:
            enc_refs_y, enc_refs_u, enc_refs_v = refs_y, refs_u, refs_v
        # static B_PRED gating: the decision output is already host-side,
        # so frames with no B_PRED MB (all keyframes — _decide_rd_key has
        # no B_PRED candidate — and most inter frames) compile the much
        # smaller no-B_PRED encode wavefront variant (tcb3=None prunes the
        # 16-step sub-block recursion from the traced graph entirely)
        has_bpred = bool((ymode == 4).any())
        qcoeff, eobs, uv_mode_d, ry, ru, rv, bmodes_d = self._encode_fn(
            R, C, bool(self.sf.trellis),
            enc_refs_y, enc_refs_u, enc_refs_v, j(refk), yb, ub, vb,
            mode_dev, j(uvmode),
            j(intra), j(mv8.astype(np.int32)), taps, dq1, dq2, dqu, qidx,
            tcb0, tcb1, tcb2,
            tcb3 if has_bpred else None,
            bmode_cost_d if has_bpred else None, rdm_f, rdd_f)
        qcoeff, eobs, uv_mode, bmodes = jax.device_get(
            (qcoeff, eobs, uv_mode_d, bmodes_d))

        # host-side grids for packing
        self.mode = np.zeros((R + 1, C + 1), np.int32)
        self.uvmode = uv_mode.reshape(R, C).astype(np.int32)
        self.reff = np.zeros((R + 1, C + 1), np.int32)
        self.mv = np.zeros((R + 1, C + 1, 2), np.int32)
        self.bmode = np.zeros((R + 1, C + 1, 16), np.int32)
        self.bmode[1:, 1:] = bmodes.reshape(R, C, 16)
        self.qcoeff = qcoeff.reshape(R, C, 25, 16).astype(np.int32)
        self.eobs = eobs.reshape(R, C, 25)
        self.mode[1:, 1:] = ymode.reshape(R, C)
        ref_id_arr = np.asarray(ref_ids, np.int32)
        self.reff[1:, 1:] = np.where(
            intra.reshape(R, C), INTRA_FRAME,
            ref_id_arr[np.clip(refk, 0, len(ref_ids) - 1)].reshape(R, C))
        self.mv[1:, 1:, 0] = mv8[:, 0].reshape(R, C)
        self.mv[1:, 1:, 1] = mv8[:, 1].reshape(R, C)
        # map chosen MVs to the cheapest coding mode at pack time (exact
        # near-MV lattice; C++ fast path, per-MB Python golden fallback)
        if not keyframe:
            from ..utils import native as _native
            _lib = _native.get_lib()
            if _lib is not None and getattr(_lib, "vp8e_map_mv_modes",
                                            None):
                # the skip grid is computed below; the lattice does not
                # read it, pass zeros
                self.skip = np.zeros((R, C), np.int32)
                _native.map_mv_modes_native(_lib, self)
            else:
                for r in range(R):
                    for c in range(C):
                        if self.reff[r + 1, c + 1] == INTRA_FRAME:
                            continue
                        mvv = (int(self.mv[r + 1, c + 1, 0]),
                               int(self.mv[r + 1, c + 1, 1]))
                        if mvv == (0, 0):
                            self.mode[r + 1, c + 1] = ZEROMV
                        else:
                            near, nearest, best, probs, cnt = \
                                self._find_near(r, c)
                            if mvv == nearest:
                                self.mode[r + 1, c + 1] = NEARESTMV
                            elif mvv == near:
                                self.mode[r + 1, c + 1] = NEARMV
                            else:
                                self.mode[r + 1, c + 1] = NEWMV

        # skip decision (B_PRED MBs have no Y2: e[24]==0, Y eobs start-0)
        self.skip = np.zeros((R, C), np.int32)
        if self.mb_no_coeff_skip:
            is_bp = self.mode[1:, 1:] == 4
            tot = self.eobs.sum(axis=2) - 16
            skip16 = (tot == 0)
            skip_bp = self.eobs[:, :, :24].sum(axis=2) == 0
            self.skip = np.where(is_bp, skip_bp, skip16).astype(np.int32)

        # LF/pack overlap (the loopfilter_thread role, ethreading.c:29-57
        # / onyx_if.c:3071): dispatch the device loop-filter program
        # BEFORE packing — JAX dispatch is asynchronous, so the filter
        # runs on the TPU while the host packs the bitstream; a recode
        # discards the in-flight result exactly like the reference's
        # thread joining on a rejected frame.
        j = jnp.asarray
        flevel, mblim_a, blim_a, lim_a, hev_a, noskip_a = \
            self._lf_params(keyframe)
        lf_out = self._lf_fn(R, C, self.filter_level > 0, ry, ru, rv,
                            j(flevel), j(mblim_a), j(blim_a), j(lim_a),
                            j(hev_a), j(noskip_a))
        payload = self._pack(keyframe)
        self._pending = (keyframe, lf_out, mv8)
        if commit:
            self.commit_frame(payload)
        return payload

    def commit_frame(self, payload):
        """Reference-ring update for the accepted frame (split out for
        the RC recode loop; update_reference_frames onyx_if.c:2980
        semantics). The loop filter was already dispatched before pack."""
        keyframe, (cy, cu, cv), mv8 = self._pending
        self._pending = None
        new = DeviceFrame(cy, cu, cv, self.w, self.h)
        if self.refresh_golden:
            self.ref_gold = new
        if self.refresh_alt:
            self.ref_alt = new
        if self.refresh_last_flag:
            self.ref_last = new
        self.prev_mv = mv8.copy()
        self.frame_count += 1

    def _lf_params(self, keyframe):
        """Per-MB loop filter params (loopfilter.c:25-95, sharpness 0).
        With segmentation active the per-MB level applies the per-segment
        LF delta exactly like the decoder will (vp8_loop_filter_frame_init
        lvl lattice), so the closed loop stays exact."""
        R, C = self.R, self.C
        N = R * C
        base = self.filter_level
        if self.seg_map_enc is not None:
            segs = self.seg_map_enc.reshape(N)
            deltas = np.asarray(self.seg_lf_deltas, np.int32)
            fl = np.clip(base + deltas[segs], 0, 63)
        else:
            fl = np.full(N, base, np.int32)
        inner = np.maximum(1, fl)  # block_inside_limit at sharpness 0
        hev = np.zeros(N, np.int32)
        hev = np.where(fl >= 15, 1, hev)
        hev = np.where(fl >= 20, (1 if keyframe else 2), hev)
        hev = np.where(fl >= 40, (2 if keyframe else 3), hev)
        # skipped B_PRED/SPLITMV MBs still get inner edges filtered
        # (loopfilter.c: the dc_diff test exempts modes without Y2) —
        # mirror the decoder's noskip = ~(has_y2 & skip)
        has_y2 = (self.mode[1:, 1:].reshape(N) != 4)
        noskip = ~(has_y2 & (self.skip.reshape(N) != 0))
        return (fl.astype(np.int32),
                (2 * (fl + 2) + inner).astype(np.int32),
                (2 * fl + inner).astype(np.int32),
                inner.astype(np.int32),
                hev.astype(np.int32), noskip)
