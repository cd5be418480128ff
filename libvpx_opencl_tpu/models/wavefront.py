"""Wavefront engine: diagonal-major block stores for intra recon + loop filter.

The wavefront dependency structure (offset-2 anti-diagonals, the schedule the
reference expresses as CL priority levels, loopfilter_cl.c:545, and
nsync-lagged decode threads, threading.c:313) is executed as a `lax.scan`
over diagonals — but the frame state lives in DIAGONAL-MAJOR block stores
`S[d, m, bw, bw]` instead of raster planes.  Each step then writes exactly
one aligned `S[d]` slice (dynamic_update_slice — cheap) and reads neighbor
blocks with gathers (cheap); the general scatter that dominated the
plane-layout formulation (~0.5ms/step on TPU v5e) disappears.

Loop-filter cross-MB writes (the p-side pixels of MB and sub-block edges)
are split by OWNERSHIP into deferred edit strips:
    B[d,m]  own 16x16 block after this MB's 8 edge groups
    L[d,m]  the 4 columns this MB wrote into its LEFT neighbor (mbv p-side)
    U[d,m]  the 4 rows this MB wrote into its ABOVE neighbor (mbh p-side)
Readers compose: a block's current state at step d is its B value overlaid
with the L strip produced at d+1 and the U strip at d+2 (exactly the
chronological write order of the reference's raster scan, loopfilter.c:
245-305), so every read sees the same pixels the serial filter would.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import loopfilter as lfops
from ..ops import predict as P

SENT = 0  # sentinel lane; validity carried by masks
# Diagonals processed per scan step: amortizes per-step dispatch overhead
# on TPU (16), but the traced graph contains KD copies of the diagonal
# body, so compile time is ~linear in KD. CPU test/dryrun environments set
# VP8TPU_KD=2 to compile ~8x faster; results are identical for any KD.
KD = int(os.environ.get("VP8TPU_KD", "16"))


@functools.lru_cache(maxsize=16)
def schedule(R, C):
    """Host-side wavefront schedule for an R x C MB grid.

    Returns a dict of numpy arrays:
      D, M                     scan depth / max lanes
      r, c, n, valid  [D, M]   MB coords per (diagonal, lane)
      left, up, ar, al [D, M]  lane index of (r,c-1)@d-1, (r-1,c)@d-2,
                               (r-1,c+1)@d-1, (r-1,c-1)@d-3 (0 if absent;
                               see *_ok masks)
      left_ok, up_ok, ar_ok, al_ok [D, M] bool
      mb_d, mb_m      [R*C]    (diagonal, lane) of each MB
    """
    D_real = 2 * (R - 1) + C
    D = -(-D_real // KD) * KD  # padded so scans can unroll KD diagonals/step
    M = min(R, C // 2 + 1)

    lane_of = {}
    per_d = []
    for d in range(D_real):
        mbs = []
        for r in range(max(0, (d - C + 1 + 1) // 2), min(R - 1, d // 2) + 1):
            c = d - 2 * r
            if 0 <= c < C:
                lane_of[(r, c)] = (d, len(mbs))
                mbs.append((r, c))
        per_d.append(mbs)
    for _ in range(D_real, D):
        per_d.append([])

    shp = (D, M)
    rr = np.zeros(shp, np.int32)
    cc = np.zeros(shp, np.int32)
    nn = np.zeros(shp, np.int32)
    valid = np.zeros(shp, bool)
    left = np.zeros(shp, np.int32)
    up = np.zeros(shp, np.int32)
    ar = np.zeros(shp, np.int32)
    al = np.zeros(shp, np.int32)
    left_ok = np.zeros(shp, bool)
    up_ok = np.zeros(shp, bool)
    ar_ok = np.zeros(shp, bool)
    al_ok = np.zeros(shp, bool)
    for d in range(D):
        for m, (r, c) in enumerate(per_d[d]):
            rr[d, m], cc[d, m], nn[d, m] = r, c, r * C + c
            valid[d, m] = True
            for arr, ok, coord in ((left, left_ok, (r, c - 1)),
                                   (up, up_ok, (r - 1, c)),
                                   (ar, ar_ok, (r - 1, c + 1)),
                                   (al, al_ok, (r - 1, c - 1))):
                if coord in lane_of:
                    arr[d, m] = lane_of[coord][1]
                    ok[d, m] = True
    mb_d = np.zeros(R * C, np.int32)
    mb_m = np.zeros(R * C, np.int32)
    for (r, c), (d, m) in lane_of.items():
        mb_d[r * C + c] = d
        mb_m[r * C + c] = m
    return dict(D=D, M=M, r=rr, c=cc, n=nn, valid=valid, left=left, up=up,
                ar=ar, al=al, left_ok=left_ok, up_ok=up_ok, ar_ok=ar_ok,
                al_ok=al_ok, mb_d=mb_d, mb_m=mb_m)


def _j(sch):
    return {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
            for k, v in sch.items()}


# ---------------------------------------------------------------------------
# intra reconstruction scan

def intra_recon_blocks(R, C, sch, inter_y, inter_u, inter_v,
                       resid_y_b, resid_u_b, resid_v_b,
                       mode, uv_mode, intra, bmodes):
    """Wavefront intra reconstruction over diagonal-major block stores.

    inter_*: [N,16,16]/[N,8,8] int32 precomputed inter reconstruction
    resid_*_b: [N,16,16]/[N,8,8] int32 residual blocks
    Returns (y_blocks [N,16,16], u_blocks, v_blocks) uint8.
    """
    D, M = sch["D"], sch["M"]
    s = _j(sch)

    store_y0 = jnp.zeros((D, M, 16, 16), jnp.int32)
    store_u0 = jnp.zeros((D, M, 8, 8), jnp.int32)
    store_v0 = jnp.zeros((D, M, 8, 8), jnp.int32)

    def gather_lane(store, d_idx, m_idx):
        # read one block [bw,bw] from the store at (d_idx, m_idx)
        return store[d_idx, m_idx]

    def do_diag(carry, d):
        sy, su, sv = carry
        r = s["r"][d]
        c = s["c"][d]
        n = s["n"][d]
        valid = s["valid"][d]

        def lane(m):
            rr, cc_, nn = r[m], c[m], n[m]
            up_ok = s["up_ok"][d][m]
            left_ok = s["left_ok"][d][m]
            ar_ok = s["ar_ok"][d][m]
            al_ok = s["al_ok"][d][m]
            up_blk = sy[d - 2, s["up"][d][m]]
            left_blk = sy[d - 1, s["left"][d][m]]
            ar_blk = sy[d - 1, s["ar"][d][m]]
            al_blk = sy[d - 3, s["al"][d][m]]
            above = jnp.where(up_ok, up_blk[15, :], 127)
            leftc = jnp.where(left_ok, left_blk[:, 15], 129)
            tl = jnp.where(rr == 0, 127,
                           jnp.where(cc_ == 0, 129, al_blk[15, 15]))
            # above-right 4 px: (r-1,c+1) last row cols 0..3; right frame
            # edge replicates above[15] (extend_mb_row semantics); top row
            # border is 127
            arpx = jnp.where(rr == 0, jnp.full((4,), 127, jnp.int32),
                             jnp.where(cc_ == C - 1,
                                       jnp.full((4,), 1, jnp.int32) * above[15],
                                       ar_blk[15, :4]))
            rblk = resid_y_b[nn]
            pred16 = P.pred_nxn(mode[nn], above, leftc, tl,
                                rr != 0, cc_ != 0, 16)
            rec16 = jnp.clip(pred16 + rblk, 0, 255)
            yblk = jnp.where(intra[nn], rec16, inter_y[nn])

            def chroma(store_c, inter_c, resid_c):
                upb = store_c[d - 2, s["up"][d][m]]
                lb = store_c[d - 1, s["left"][d][m]]
                alb = store_c[d - 3, s["al"][d][m]]
                a = jnp.where(up_ok, upb[7, :], 127)
                l = jnp.where(left_ok, lb[:, 7], 129)
                t = jnp.where(rr == 0, 127,
                              jnp.where(cc_ == 0, 129, alb[7, 7]))
                pd = P.pred_nxn(uv_mode[nn], a, l, t, rr != 0, cc_ != 0, 8)
                blk = jnp.clip(pd + resid_c[nn], 0, 255)
                return jnp.where(intra[nn], blk, inter_c[nn])

            ublk = chroma(su, inter_u, resid_u_b)
            vblk = chroma(sv, inter_v, resid_v_b)
            return yblk, ublk, vblk, above, leftc, tl, arpx, rblk, nn

        yb, ub, vb, l_above, l_left, l_tl, l_arpx, l_rblk, l_nn = \
            jax.vmap(lane)(jnp.arange(M))

        # B_PRED lanes: the per-MB 16-step sub-block recursion is the most
        # serial piece of the whole decoder; run it only on diagonals that
        # actually contain a B_PRED macroblock (runtime lax.cond).
        def run_bpred(yb):
            def bl(yblk, above, leftc, tl, arpx, rblk, nn):
                ws = jnp.zeros((17, 21), jnp.int32)
                ws = ws.at[0, 0].set(tl)
                ws = ws.at[0, 1:17].set(above)
                ws = ws.at[0, 17:21].set(arpx)
                ws = ws.at[1:17, 0].set(leftc)
                ws = ws.at[4, 17:21].set(arpx)
                ws = ws.at[8, 17:21].set(arpx)
                ws = ws.at[12, 17:21].set(arpx)

                def bstep(k, ws):
                    ir = k >> 2
                    ic = k & 3
                    above8 = jax.lax.dynamic_slice(ws, (4 * ir, 1 + 4 * ic),
                                                   (1, 8))[0]
                    left4 = jax.lax.dynamic_slice(ws, (1 + 4 * ir, 4 * ic),
                                                  (4, 1))[:, 0]
                    tl4 = jax.lax.dynamic_slice(ws, (4 * ir, 4 * ic),
                                                (1, 1))[0, 0]
                    blk = P.bpred_4x4(bmodes[nn, k], above8, left4, tl4)
                    rsub = jax.lax.dynamic_slice(rblk, (4 * ir, 4 * ic),
                                                 (4, 4))
                    blk = jnp.clip(blk + rsub, 0, 255)
                    return jax.lax.dynamic_update_slice(
                        ws, blk, (1 + 4 * ir, 1 + 4 * ic))

                wsf = jax.lax.fori_loop(0, 16, bstep, ws)
                recB = wsf[1:17, 1:17]
                return jnp.where((mode[nn] == B_PRED_M) & intra[nn],
                                 recB, yblk)
            return jax.vmap(bl)(yb, l_above, l_left, l_tl, l_arpx, l_rblk,
                                l_nn)

        any_bpred = jnp.any((mode[n] == B_PRED_M) & intra[n] &
                            s["valid"][d])
        yb = jax.lax.cond(any_bpred, run_bpred, lambda y: y, yb)
        sy = jax.lax.dynamic_update_slice(sy, yb[None], (d, 0, 0, 0))
        su = jax.lax.dynamic_update_slice(su, ub[None], (d, 0, 0, 0))
        sv = jax.lax.dynamic_update_slice(sv, vb[None], (d, 0, 0, 0))
        return (sy, su, sv)

    def step(carry, d0):
        for kk in range(KD):
            carry = do_diag(carry, d0 + kk)
        return carry, None

    (sy, su, sv), _ = jax.lax.scan(step, (store_y0, store_u0, store_v0),
                                   jnp.arange(0, D, KD))
    # diagonal-major -> MB raster order
    y_blocks = sy[s["mb_d"], s["mb_m"]]
    u_blocks = su[s["mb_d"], s["mb_m"]]
    v_blocks = sv[s["mb_d"], s["mb_m"]]
    return y_blocks, u_blocks, v_blocks


B_PRED_M = 4
SPLITMV_M = 9


# ---------------------------------------------------------------------------
# encoder wavefront: predict -> FDCT/WHT -> quant -> dequant/IDCT recon

def encode_recon_blocks(R, C, sch, src_y_b, src_u_b, src_v_b,
                        inter_y, inter_u, inter_v,
                        mode, uv_mode, intra, dq_y1, dq_y2, dq_uv, qidx,
                        q_ext=None, e_ext=None, use_ext=None,
                        tcb3=None, bmode_cost=None, rdmult=None,
                        rddiv=None):
    """Whole-frame encode pass over the wavefront (the encoder twin of
    intra_recon_blocks): intra predictions read true reconstructed
    neighbors from the diagonal store, residuals are transformed and
    quantized (dct.c / quantize.c duals), and the in-loop reconstruction
    (decodframe.c residual path) feeds the next diagonal.

    B_PRED macroblocks (mode == B_PRED_M, intra): when tcb3/bmode_cost
    are given, a per-MB 16-step sub-block recursion picks the best of 10
    bmodes by a pickinter-style FAST pick — prediction SSE + bmode cost
    from TRUE reconstructed neighbors (pick_intra4x4block role); tcb3 is
    only the enable gate, so the chosen bmodes may differ from the
    token-cost RD pick of the decision stage (_bpred_rd, rdopt.c role).
    The bitstream stays self-consistent because THESE bmodes are the
    ones packed.

    src_*_b: [N,16,16]/[N,8,8] int32 source blocks
    inter_*: [N,...] int32 inter predictions (garbage where intra)
    Returns (qcoeff [N,25,16] i32, eobs [N,25] i32, recon y/u/v blocks,
    bmodes [N,16] i32).
    """
    from ..ops import transforms as tf
    from ..ops import rd_device as RD
    D, M = sch["D"], sch["M"]
    s = _j(sch)
    store_y0 = jnp.zeros((D, M, 16, 16), jnp.int32)
    store_u0 = jnp.zeros((D, M, 8, 8), jnp.int32)
    store_v0 = jnp.zeros((D, M, 8, 8), jnp.int32)
    store_q0 = jnp.zeros((D, M, 25, 16), jnp.int32)
    store_e0 = jnp.zeros((D, M, 25), jnp.int32)
    store_b0 = jnp.zeros((D, M, 16), jnp.int32)

    def do_diag(carry, d):
        sy, su, sv, sq, se, sb = carry
        r = s["r"][d]
        c = s["c"][d]
        n = s["n"][d]

        def lane(m):
            rr, cc_, nn = r[m], c[m], n[m]
            up_ok = s["up_ok"][d][m]
            left_ok = s["left_ok"][d][m]
            ar_ok = s["ar_ok"][d][m]
            up_blk = sy[d - 2, s["up"][d][m]]
            left_blk = sy[d - 1, s["left"][d][m]]
            ar_blk = sy[d - 1, s["ar"][d][m]]
            al_blk = sy[d - 3, s["al"][d][m]]
            above = jnp.where(up_ok, up_blk[15, :], 127)
            leftc = jnp.where(left_ok, left_blk[:, 15], 129)
            tl = jnp.where(rr == 0, 127,
                           jnp.where(cc_ == 0, 129, al_blk[15, 15]))
            arpx = jnp.where(rr == 0, jnp.full((4,), 127, jnp.int32),
                             jnp.where(cc_ == C - 1,
                                       jnp.full((4,), 1, jnp.int32)
                                       * above[15],
                                       ar_blk[15, :4]))
            pred16 = P.pred_nxn(mode[nn], above, leftc, tl,
                                rr != 0, cc_ != 0, 16)
            pred_y = jnp.where(intra[nn], pred16, inter_y[nn])

            def chroma_pred(store_c, inter_c):
                upb = store_c[d - 2, s["up"][d][m]]
                lb = store_c[d - 1, s["left"][d][m]]
                alb = store_c[d - 3, s["al"][d][m]]
                a = jnp.where(up_ok, upb[7, :], 127)
                l = jnp.where(left_ok, lb[:, 7], 129)
                t = jnp.where(rr == 0, 127,
                              jnp.where(cc_ == 0, 129, alb[7, 7]))
                pd = P.pred_nxn(uv_mode[nn], a, l, t, rr != 0, cc_ != 0, 8)
                return jnp.where(intra[nn], pd, inter_c[nn])

            pred_u = chroma_pred(su, inter_u)
            pred_v = chroma_pred(sv, inter_v)

            # ---- forward transform + quant ----
            resid = src_y_b[nn] - pred_y
            rblocks = resid.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3) \
                .reshape(16, 4, 4)
            ycoef = tf.fdct4x4_batch(rblocks).reshape(16, 16)
            y2 = tf.walsh4x4_batch(ycoef[:, 0])
            dqy1 = dq_y1[nn]
            dqy2 = dq_y2[nn]
            dquv = dq_uv[nn]
            qi = qidx[nn]
            q2, e2 = tf.regular_quant_batch(y2[None], dqy2[None], qi[None],
                                            jnp.zeros((1,), bool))
            qy, ey = tf.regular_quant_batch(
                ycoef, jnp.tile(dqy1[None], (16, 1)),
                jnp.broadcast_to(qi, (16,)), jnp.ones((16,), bool))
            ey = jnp.maximum(ey, 1)
            ru = src_u_b[nn] - pred_u
            rv_ = src_v_b[nn] - pred_v
            ublocks = ru.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3) \
                .reshape(4, 4, 4)
            vblocks = rv_.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3) \
                .reshape(4, 4, 4)
            uvcoef = tf.fdct4x4_batch(
                jnp.concatenate([ublocks, vblocks])).reshape(8, 16)
            quv, euv = tf.regular_quant_batch(
                uvcoef, jnp.tile(dquv[None], (8, 1)),
                jnp.broadcast_to(qi, (8,)), jnp.zeros((8,), bool))
            qall = jnp.concatenate([qy, quv, q2], axis=0)  # [25,16]
            eall = jnp.concatenate([ey, euv, e2], axis=0)  # [25]
            if q_ext is not None:
                # externally trellis-optimized coefficients (inter MBs —
                # their predictions don't depend on the wavefront carry,
                # so the optimize_b pass runs whole-frame outside)
                qall = jnp.where(use_ext[nn], q_ext[nn], qall)
                eall = jnp.where(use_ext[nn], e_ext[nn], eall)
                qy = qall[:16]
                quv = qall[16:24]
                q2 = qall[24:25]
                e2 = eall[24:25]

            # ---- in-loop reconstruction (decoder-exact) ----
            dqv2 = jnp.concatenate([dqy2[:1], jnp.repeat(dqy2[1:], 15)])
            wht_in = tf._s16(q2[0] * dqv2)
            dcs_full = tf.inv_walsh_batch(wht_in.reshape(1, 4, 4))[0]
            dc1 = tf._s16((tf._s16(q2[0, 0] * dqy2[0]) + 3) >> 3)
            dcs = jnp.where(e2[0] > 1, dcs_full, dc1)
            dqvy = jnp.concatenate([jnp.ones(1, jnp.int32),
                                    jnp.repeat(dqy1[1:], 15)])
            dqy = tf._s16(qy * dqvy[None, :])
            dqy = dqy.at[:, 0].set(dcs)
            resid_rec = tf.idct4x4_batch(dqy.reshape(16, 4, 4))
            resid_mb = resid_rec.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3) \
                .reshape(16, 16)
            yrec = jnp.clip(pred_y + resid_mb, 0, 255)
            dqvuv = jnp.concatenate([dquv[:1], jnp.repeat(dquv[1:], 15)])
            dquv_coef = tf._s16(quv * dqvuv[None, :])
            uvresid = tf.idct4x4_batch(dquv_coef.reshape(8, 4, 4))
            ur = uvresid[:4].reshape(2, 2, 4, 4).transpose(0, 2, 1, 3) \
                .reshape(8, 8)
            vr = uvresid[4:].reshape(2, 2, 4, 4).transpose(0, 2, 1, 3) \
                .reshape(8, 8)
            urec = jnp.clip(pred_u + ur, 0, 255)
            vrec = jnp.clip(pred_v + vr, 0, 255)
            return (yrec, urec, vrec, qall, eall,
                    above, leftc, tl, arpx, nn)

        (yb, ub, vb, qb, eb, l_above, l_left, l_tl, l_arpx, l_nn) = \
            jax.vmap(lane)(jnp.arange(M))
        bmb = jnp.zeros((M, 16), jnp.int32)

        if tcb3 is not None:
            # B_PRED encode lanes: 16-step sub-block recursion choosing
            # the best of 10 bmodes by token-cost RD from true recon
            # neighbors; gated per diagonal (runtime lax.cond)
            def run_bpred(args):
                yb_, qb_, eb_, bmb_ = args

                def bl(yblk, qall, eall, above, leftc, tl, arpx, nn):
                    ws = jnp.zeros((17, 21), jnp.int32)
                    ws = ws.at[0, 0].set(tl)
                    ws = ws.at[0, 1:17].set(above)
                    ws = ws.at[0, 17:21].set(arpx)
                    ws = ws.at[1:17, 0].set(leftc)
                    ws = ws.at[4, 17:21].set(arpx)
                    ws = ws.at[8, 17:21].set(arpx)
                    ws = ws.at[12, 17:21].set(arpx)
                    src16 = src_y_b[nn]
                    dqy1 = dq_y1[nn]
                    qi = qidx[nn]
                    dqv = jnp.concatenate([dqy1[:1],
                                           jnp.repeat(dqy1[1:], 15)])

                    def bstep(k, state):
                        # fast bmode pick (pick_intra4x4mby_modes,
                        # pickinter.c: prediction SSE + mode cost), then
                        # transform/quant only the winner — keeps the
                        # per-diagonal HLO small enough to compile under
                        # the KD unroll
                        ws, qout, eout, bmout = state
                        ir = k >> 2
                        ic = k & 3
                        above8 = jax.lax.dynamic_slice(
                            ws, (4 * ir, 1 + 4 * ic), (1, 8))[0]
                        left4 = jax.lax.dynamic_slice(
                            ws, (1 + 4 * ir, 4 * ic), (4, 1))[:, 0]
                        tl4 = jax.lax.dynamic_slice(
                            ws, (4 * ir, 4 * ic), (1, 1))[0, 0]
                        preds = jnp.stack(
                            P.bpred_4x4_all(above8, left4, tl4))
                        src4 = jax.lax.dynamic_slice(
                            src16, (4 * ir, 4 * ic), (4, 4))
                        resid = src4[None] - preds
                        sse = jnp.sum((resid * resid).astype(jnp.float32),
                                      (-1, -2))
                        rd10 = RD.rdc(bmode_cost, sse, rdmult, rddiv)
                        mbest = jnp.argmin(rd10)
                        coefs = tf.fdct4x4_batch(
                            resid[mbest][None]).reshape(1, 16)
                        qk, ek = tf.regular_quant_batch(
                            coefs, dqy1[None], qi[None],
                            jnp.zeros((), bool))
                        qk = qk[0]
                        ek = ek[0]
                        dqc = tf._s16(qk * dqv)
                        rec = jnp.clip(
                            preds[mbest] +
                            tf.idct4x4_batch(dqc.reshape(1, 4, 4))[0],
                            0, 255)
                        ws = jax.lax.dynamic_update_slice(
                            ws, rec, (1 + 4 * ir, 1 + 4 * ic))
                        qout = qout.at[k].set(qk)
                        eout = eout.at[k].set(ek)
                        bmout = bmout.at[k].set(mbest.astype(jnp.int32))
                        return (ws, qout, eout, bmout)

                    init = (ws, jnp.zeros((16, 16), jnp.int32),
                            jnp.zeros((16,), jnp.int32),
                            jnp.zeros((16,), jnp.int32))
                    wsf, qout, eout, bmout = jax.lax.fori_loop(
                        0, 16, bstep, init)
                    recB = wsf[1:17, 1:17]
                    is_bp = (mode[nn] == B_PRED_M) & intra[nn]
                    yout = jnp.where(is_bp, recB, yblk)
                    qbp = jnp.concatenate(
                        [qout, qall[16:24],
                         jnp.zeros((1, 16), jnp.int32)], 0)
                    ebp = jnp.concatenate(
                        [eout, eall[16:24], jnp.zeros((1,), jnp.int32)], 0)
                    q2 = jnp.where(is_bp, qbp, qall)
                    e2 = jnp.where(is_bp, ebp, eall)
                    bm = jnp.where(is_bp, bmout, 0)
                    return yout, q2, e2, bm

                return jax.vmap(bl)(yb_, qb_, eb_, l_above, l_left,
                                    l_tl, l_arpx, l_nn)

            any_bpred = jnp.any((mode[n] == B_PRED_M) & intra[n] &
                                s["valid"][d])
            yb, qb, eb, bmb = jax.lax.cond(
                any_bpred, run_bpred, lambda a: (a[0], a[1], a[2], a[3]),
                (yb, qb, eb, bmb))

        sy = jax.lax.dynamic_update_slice(sy, yb[None], (d, 0, 0, 0))
        su = jax.lax.dynamic_update_slice(su, ub[None], (d, 0, 0, 0))
        sv = jax.lax.dynamic_update_slice(sv, vb[None], (d, 0, 0, 0))
        sq = jax.lax.dynamic_update_slice(sq, qb[None], (d, 0, 0, 0))
        se = jax.lax.dynamic_update_slice(se, eb[None], (d, 0, 0))
        sb = jax.lax.dynamic_update_slice(sb, bmb[None], (d, 0, 0))
        return (sy, su, sv, sq, se, sb)

    def step(carry, d0):
        for kk in range(KD):
            carry = do_diag(carry, d0 + kk)
        return carry, None

    (sy, su, sv, sq, se, sb), _ = jax.lax.scan(
        step, (store_y0, store_u0, store_v0, store_q0, store_e0,
               store_b0),
        jnp.arange(0, D, KD))
    mb_d, mb_m = _j(sch)["mb_d"], _j(sch)["mb_m"]
    return (sq[mb_d, mb_m], se[mb_d, mb_m], sy[mb_d, mb_m],
            su[mb_d, mb_m], sv[mb_d, mb_m], sb[mb_d, mb_m])


# ---------------------------------------------------------------------------
# loop filter scan

def _edge_v(patch, col, mb_edge, apply, blimit, lim, hev, simple):
    """Vertical edge at patch column `col` over 16 rows starting at row 4."""
    pix8 = patch[:, 4:20, col - 4:col + 4]
    if simple:
        out = lfops.simple_filter_edge(pix8, blimit[:, None], apply[:, None])
    else:
        out = lfops.filter_edge(pix8, blimit[:, None], lim[:, None],
                                hev[:, None], mb_edge, apply[:, None])
    return patch.at[:, 4:20, col - 4:col + 4].set(out)


def _edge_h(patch, row, mb_edge, apply, blimit, lim, hev, simple):
    pix8 = jnp.swapaxes(patch[:, row - 4:row + 4, 4:20], -1, -2)
    if simple:
        out = lfops.simple_filter_edge(pix8, blimit[:, None], apply[:, None])
    else:
        out = lfops.filter_edge(pix8, blimit[:, None], lim[:, None],
                                hev[:, None], mb_edge, apply[:, None])
    return patch.at[:, row - 4:row + 4, 4:20].set(jnp.swapaxes(out, -1, -2))


def _edge_v8(patch, col, mb_edge, apply, blimit, lim, hev):
    pix8 = patch[:, 4:12, col - 4:col + 4]
    out = lfops.filter_edge(pix8, blimit[:, None], lim[:, None],
                            hev[:, None], mb_edge, apply[:, None])
    return patch.at[:, 4:12, col - 4:col + 4].set(out)


def _edge_h8(patch, row, mb_edge, apply, blimit, lim, hev):
    pix8 = jnp.swapaxes(patch[:, row - 4:row + 4, 4:12], -1, -2)
    out = lfops.filter_edge(pix8, blimit[:, None], lim[:, None],
                            hev[:, None], mb_edge, apply[:, None])
    return patch.at[:, row - 4:row + 4, 4:12].set(jnp.swapaxes(out, -1, -2))


def loop_filter_blocks(R, C, sch, simple, y_blocks, u_blocks, v_blocks,
                       flevel, mblim_a, blim_a, lim_a, hev_a, noskip_a):
    """Wavefront loop filter over per-MB blocks with deferred edit strips.

    y_blocks [N,16,16] int32 (post-recon), chroma [N,8,8]. Returns filtered
    blocks in the same layout."""
    D, M = sch["D"], sch["M"]
    s = _j(sch)

    stores = dict(
        By=jnp.zeros((D, M, 16, 16), jnp.int32),
        Ly=jnp.zeros((D, M, 16, 4), jnp.int32),
        Uy=jnp.zeros((D, M, 4, 16), jnp.int32),
        Bu=jnp.zeros((D, M, 8, 8), jnp.int32),
        Lu=jnp.zeros((D, M, 8, 4), jnp.int32),
        Uu=jnp.zeros((D, M, 4, 8), jnp.int32),
        Bv=jnp.zeros((D, M, 8, 8), jnp.int32),
        Lv=jnp.zeros((D, M, 8, 4), jnp.int32),
        Uv=jnp.zeros((D, M, 4, 8), jnp.int32),
    )
    names = list(stores.keys())

    def do_diag(carry, d):
        st = dict(zip(names, carry))
        r = s["r"][d]
        c = s["c"][d]
        n = s["n"][d]
        valid = s["valid"][d]
        left_ok = s["left_ok"][d]
        up_ok = s["up_ok"][d]
        ar_ok = s["ar_ok"][d]
        fl = flevel[n]
        active = valid & (fl > 0)
        ml, bl, il, hv = mblim_a[n], blim_a[n], lim_a[n], hev_a[n]
        noskip = noskip_a[n]

        def build_patch(B, L, U, blocks, n, bw):
            """[M, bw+4, bw+4] patch: rows0-3 = above strip, cols0-3 = left."""
            def lane(m):
                own = blocks[n[m]]
                lblk = B[d - 1, s["left"][d][m]]
                ublk = B[d - 2, s["up"][d][m]]
                # above block overlay: L strip produced by (r-1,c+1) at d-1
                arL = L[d - 1, s["ar"][d][m]]
                ub = jnp.where(ar_ok[m],
                               ublk.at[:, bw - 4:].set(arL), ublk)
                p = jnp.zeros((bw + 4, bw + 4), jnp.int32)
                p = p.at[4:, 4:].set(own)
                p = p.at[4:, 0:4].set(jnp.where(left_ok[m],
                                                lblk[:, bw - 4:], 0))
                p = p.at[0:4, 4:].set(jnp.where(up_ok[m], ub[bw - 4:, :], 0))
                return p
            return jax.vmap(lane)(jnp.arange(M))

        py = build_patch(st["By"], st["Ly"], st["Uy"], y_blocks, n, 16)
        if simple:
            py = _edge_v(py, 4, True, active & left_ok, ml, il, hv, True)
            for col in (8, 12, 16):
                py = _edge_v(py, col, False, active & noskip, bl, il, hv,
                             True)
            py = _edge_h(py, 4, True, active & up_ok, ml, il, hv, True)
            for row in (8, 12, 16):
                py = _edge_h(py, row, False, active & noskip, bl, il, hv,
                             True)
        else:
            py = _edge_v(py, 4, True, active & left_ok, ml, il, hv, False)
            for col in (8, 12, 16):
                py = _edge_v(py, col, False, active & noskip, bl, il, hv,
                             False)
            py = _edge_h(py, 4, True, active & up_ok, ml, il, hv, False)
            for row in (8, 12, 16):
                py = _edge_h(py, row, False, active & noskip, bl, il, hv,
                             False)
        st["By"] = jax.lax.dynamic_update_slice(
            st["By"], py[:, 4:, 4:][None], (d, 0, 0, 0))
        st["Ly"] = jax.lax.dynamic_update_slice(
            st["Ly"], py[:, 4:, 0:4][None], (d, 0, 0, 0))
        st["Uy"] = jax.lax.dynamic_update_slice(
            st["Uy"], py[:, 0:4, 4:][None], (d, 0, 0, 0))

        if not simple:
            for pname, bname, lname, uname, blocks in (
                    ("u", "Bu", "Lu", "Uu", u_blocks),
                    ("v", "Bv", "Lv", "Uv", v_blocks)):
                pc = build_patch(st[bname], st[lname], st[uname], blocks, n, 8)
                pc = _edge_v8(pc, 4, True, active & left_ok, ml, il, hv)
                pc = _edge_v8(pc, 8, False, active & noskip, bl, il, hv)
                pc = _edge_h8(pc, 4, True, active & up_ok, ml, il, hv)
                pc = _edge_h8(pc, 8, False, active & noskip, bl, il, hv)
                st[bname] = jax.lax.dynamic_update_slice(
                    st[bname], pc[:, 4:, 4:][None], (d, 0, 0, 0))
                st[lname] = jax.lax.dynamic_update_slice(
                    st[lname], pc[:, 4:, 0:4][None], (d, 0, 0, 0))
                st[uname] = jax.lax.dynamic_update_slice(
                    st[uname], pc[:, 0:4, 4:][None], (d, 0, 0, 0))
        else:
            # simple filter touches luma only: pass chroma through unchanged
            def chroma_pass(bname, blocks):
                def lane(m):
                    return blocks[n[m]]
                blk = jax.vmap(lane)(jnp.arange(M))
                return jax.lax.dynamic_update_slice(
                    st[bname], blk[None], (d, 0, 0, 0))
            st["Bu"] = chroma_pass("Bu", u_blocks)
            st["Bv"] = chroma_pass("Bv", v_blocks)

        return tuple(st[k] for k in names)

    def step(carry, d0):
        for kk in range(KD):
            carry = do_diag(carry, d0 + kk)
        return carry, None

    carry, _ = jax.lax.scan(step, tuple(stores[k] for k in names),
                            jnp.arange(0, D, KD))
    st = dict(zip(names, carry))

    # final composition: own B + L strip from right neighbor (cols bw-4..)
    # + U strip from below neighbor (rows bw-4..), in that order
    mb_d, mb_m = s["mb_d"], s["mb_m"]
    N = R * C
    nidx = np.arange(N)
    has_right = (nidx % C) < (C - 1)
    has_down = (nidx // C) < (R - 1)
    right_n = np.where(has_right, nidx + 1, nidx)
    down_n = np.where(has_down, nidx + C, nidx)
    jd = {k: jnp.asarray(v) for k, v in dict(
        has_right=has_right, has_down=has_down,
        rd=sch["mb_d"][right_n], rm=sch["mb_m"][right_n],
        dd=sch["mb_d"][down_n], dm=sch["mb_m"][down_n]).items()}

    def compose(Bst, Lst, Ust, bw):
        own = Bst[mb_d, mb_m]
        lstrip = Lst[jd["rd"], jd["rm"]]
        own = jnp.where(jd["has_right"][:, None, None],
                        own.at[:, :, bw - 4:].set(lstrip), own)
        ustrip = Ust[jd["dd"], jd["dm"]]
        own = jnp.where(jd["has_down"][:, None, None],
                        own.at[:, bw - 4:, :].set(ustrip), own)
        return own

    y_out = compose(st["By"], st["Ly"], st["Uy"], 16)
    if simple:
        u_out = st["Bu"][mb_d, mb_m]
        v_out = st["Bv"][mb_d, mb_m]
    else:
        u_out = compose(st["Bu"], st["Lu"], st["Uu"], 8)
        v_out = compose(st["Bv"], st["Lv"], st["Uv"], 8)
    return y_out, u_out, v_out
