"""Multi-chip MB-row-sharded VP8 ENCODE: the encoder twin of
parallel/sharded_decode.

Every device program of models/tpu_encoder.TPUEncoder runs under
`shard_map` over a ('row',) mesh:

  * decision (ME + RD): embarrassingly parallel over MB rows — each
    shard runs the full-pel/sub-pel search and token-cost RD for its own
    rows against replicated reference planes; the near-MV lattice's only
    cross-row dependency (the MV of the row above) travels as ONE
    [C, 2] ppermute strip per frame (the encoder-side analog of the
    reference's ethreading.c row-delayed xd->above contexts);
  * whole-frame trellis (optimize_b) — per-MB, purely local;
  * encode wavefront — the cross-shard diagonal scan of
    parallel/sharded_wavefront with the ENCODE lane body (predict from
    true recon neighbors -> FDCT/WHT -> quant -> in-loop recon), bottom
    recon pixel rows shipped one shard down per step exactly like the
    decode wavefront;
  * loop filter — parallel/sharded_wavefront.loop_filter_sharded
    (shared with the sharded decoder, MD5-proven);
  * plane assembly: per-shard slices all-gathered into the replicated
    reference ring for the next frame's search.

The sharded ladder runs with SpeedFeatures.bpred=False (the B_PRED
sub-block recursion is not stitched across shards yet) — under any
such config the produced bitstream is BIT-IDENTICAL to the single-chip
TPUEncoder, asserted by tests/test_sharded_encode.py.

ref: vp8/encoder/ethreading.c:60-126 (the reference's MB-row encoder
threads), vp8/encoder/onyx_if.c:3071 (loopfilter thread overlap).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as PSpec
from jax import shard_map

from ..models import wavefront as wf
from ..models import tpu_encoder as te
from ..models.tpu_encoder import (B, B2, _uv_intra_rd, _uv_inter_rd,
                                  TPUEncoder)
from ..ops import me as ME
from ..ops import predict as P
from ..ops import rd_device as RD
from ..ops import transforms as tf
from . import sharded_wavefront as sw
from .sharded_decode import make_row_mesh


# ---------------------------------------------------------------------------
# encode wavefront, sharded (the encode-lane twin of
# sharded_wavefront.intra_recon_sharded)

def encode_recon_sharded(Rs, C, n_shards, axis_name,
                         src_y_b, src_u_b, src_v_b,
                         inter_y, inter_u, inter_v,
                         mode, uv_mode, intra, dq_y1, dq_y2, dq_uv, qidx,
                         q_ext, e_ext, use_ext):
    """Per-shard body (inside shard_map): encode wavefront over this
    shard's Rs x C local MB grid, stitched to the shard above through
    per-step bottom recon pixel strips.  Lane math identical to
    models/wavefront.encode_recon_blocks (no B_PRED lanes — the sharded
    ladder encodes with sf.bpred=False).

    All arrays are this shard's local slices [Rs*C, ...].  Returns
    (qcoeff [Nl,25,16] i32, eobs [Nl,25] i32, recon y/u/v blocks)."""
    sch = sw._shard_schedule(Rs, C)
    s = wf._j(sch)
    D, M = sch["D"], sch["M"]
    D_local = 2 * (Rs - 1) + C
    D_global = 2 * (n_shards * Rs - 1) + C
    sidx = jax.lax.axis_index(axis_name)
    has_above = sidx > 0
    d_off = 2 * sidx * Rs

    store_y0 = jnp.zeros((D, M, 16, 16), jnp.int32)
    store_u0 = jnp.zeros((D, M, 8, 8), jnp.int32)
    store_v0 = jnp.zeros((D, M, 8, 8), jnp.int32)
    store_q0 = jnp.zeros((D, M, 25, 16), jnp.int32)
    store_e0 = jnp.zeros((D, M, 25), jnp.int32)
    strip_y0 = jnp.zeros((C, 16), jnp.int32)
    strip_u0 = jnp.zeros((C, 8), jnp.int32)
    strip_v0 = jnp.zeros((C, 8), jnp.int32)
    pay0 = jnp.zeros((2 + 16 + 8 + 8,), jnp.int32)

    def body(carry, dg):
        sy, su, sv, sq, se, strip_y, strip_u, strip_v, pay_in = carry
        # merge the strip that arrived from the shard above
        pcol = jnp.where(pay_in[0] > 0, pay_in[1], C)
        strip_y = strip_y.at[pcol].set(pay_in[2:18], mode="drop")
        strip_u = strip_u.at[pcol].set(pay_in[18:26], mode="drop")
        strip_v = strip_v.at[pcol].set(pay_in[26:34], mode="drop")

        dl = dg - d_off
        active = (dl >= 0) & (dl < D_local)
        d = jnp.clip(dl, 0, D - 1)
        r = s["r"][d]
        c = s["c"][d]
        n = s["n"][d]

        def lane(m):
            rr, cc_, nn = r[m], c[m], n[m]
            up_ok = s["up_ok"][d][m]
            left_ok = s["left_ok"][d][m]
            row0a = (rr == 0) & has_above
            up_blk = sy[d - 2, s["up"][d][m]]
            left_blk = sy[d - 1, s["left"][d][m]]
            al_blk = sy[d - 3, s["al"][d][m]]
            above = jnp.where(row0a, strip_y[cc_],
                              jnp.where(up_ok, up_blk[15, :], 127))
            leftc = jnp.where(left_ok, left_blk[:, 15], 129)
            tl0 = jnp.where(rr == 0, 127,
                            jnp.where(cc_ == 0, 129, al_blk[15, 15]))
            tl = jnp.where(row0a,
                           jnp.where(cc_ == 0, 129,
                                     strip_y[jnp.maximum(cc_ - 1, 0), 15]),
                           tl0)
            pred16 = P.pred_nxn(mode[nn], above, leftc, tl,
                                (rr != 0) | row0a, cc_ != 0, 16)
            pred_y = jnp.where(intra[nn], pred16, inter_y[nn])

            def chroma_pred(store_c, strip_c, inter_c, bw):
                upb = store_c[d - 2, s["up"][d][m]]
                lb = store_c[d - 1, s["left"][d][m]]
                alb = store_c[d - 3, s["al"][d][m]]
                a = jnp.where(row0a, strip_c[cc_],
                              jnp.where(up_ok, upb[bw - 1, :], 127))
                l = jnp.where(left_ok, lb[:, bw - 1], 129)
                t0 = jnp.where(rr == 0, 127,
                               jnp.where(cc_ == 0, 129,
                                         alb[bw - 1, bw - 1]))
                t = jnp.where(row0a,
                              jnp.where(cc_ == 0, 129,
                                        strip_c[jnp.maximum(cc_ - 1, 0),
                                                bw - 1]),
                              t0)
                pd = P.pred_nxn(uv_mode[nn], a, l, t,
                                (rr != 0) | row0a, cc_ != 0, bw)
                return jnp.where(intra[nn], pd, inter_c[nn])

            pred_u = chroma_pred(su, strip_u, inter_u, 8)
            pred_v = chroma_pred(sv, strip_v, inter_v, 8)

            # ---- forward transform + quant (wavefront.py lane dual) ----
            resid = src_y_b[nn] - pred_y
            rblocks = resid.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3) \
                .reshape(16, 4, 4)
            ycoef = tf.fdct4x4_batch(rblocks).reshape(16, 16)
            y2 = tf.walsh4x4_batch(ycoef[:, 0])
            dqy1 = dq_y1[nn]
            dqy2 = dq_y2[nn]
            dquv = dq_uv[nn]
            qi = qidx[nn]
            q2, e2 = tf.regular_quant_batch(y2[None], dqy2[None],
                                            qi[None],
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
            qall = jnp.concatenate([qy, quv, q2], axis=0)
            eall = jnp.concatenate([ey, euv, e2], axis=0)
            if q_ext is not None:
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
            resid_mb = resid_rec.reshape(4, 4, 4, 4) \
                .transpose(0, 2, 1, 3).reshape(16, 16)
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
            return yrec, urec, vrec, qall, eall

        yb, ub, vb, qb, eb = jax.vmap(lane)(jnp.arange(M))
        # inactive steps must not clobber the stores
        yb = jnp.where(active, yb, sy[d])
        ub = jnp.where(active, ub, su[d])
        vb = jnp.where(active, vb, sv[d])
        qb = jnp.where(active, qb, sq[d])
        eb = jnp.where(active, eb, se[d])
        sy = jax.lax.dynamic_update_slice(sy, yb[None], (d, 0, 0, 0))
        su = jax.lax.dynamic_update_slice(su, ub[None], (d, 0, 0, 0))
        sv = jax.lax.dynamic_update_slice(sv, vb[None], (d, 0, 0, 0))
        sq = jax.lax.dynamic_update_slice(sq, qb[None], (d, 0, 0, 0))
        se = jax.lax.dynamic_update_slice(se, eb[None], (d, 0, 0))

        # ship this step's bottom-row recon pixels one shard down
        lv = s["last_ok"][d] & active
        mL = s["last_lane"][d]
        pay = jnp.concatenate([
            jnp.stack([lv.astype(jnp.int32), s["last_col"][d]]),
            yb[mL, 15, :], ub[mL, 7, :], vb[mL, 7, :]])
        pay_next = jax.lax.ppermute(pay, axis_name,
                                    sw._perm_down(n_shards)) \
            if n_shards > 1 else jnp.zeros_like(pay)
        return (sy, su, sv, sq, se, strip_y, strip_u, strip_v,
                pay_next), None

    carry0 = (store_y0, store_u0, store_v0, store_q0, store_e0,
              strip_y0, strip_u0, strip_v0, pay0)
    (sy, su, sv, sq, se, *_), _ = jax.lax.scan(body, carry0,
                                               jnp.arange(D_global))
    mb_d, mb_m = s["mb_d"], s["mb_m"]
    return (sq[mb_d, mb_m], se[mb_d, mb_m], sy[mb_d, mb_m],
            su[mb_d, mb_m], sv[mb_d, mb_m])


# ---------------------------------------------------------------------------
# sharded device programs (global-view signatures matching the
# TPUEncoder dispatch hooks)

@functools.lru_cache(maxsize=16)
def _programs(mesh, R, C):
    """Build the shard_map'd decide/encode/LF programs for this mesh and
    geometry (R must divide by the mesh's row extent)."""
    S = mesh.shape["row"]
    assert R % S == 0, f"MB rows {R} not divisible by {S} shards"
    Rs = R // S
    Nl = Rs * C
    rowspec = PSpec("row")
    rep = PSpec()

    def smap(f, in_specs, out_specs):
        return jax.jit(shard_map(f, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs,
                                 check_vma=False))

    # ---- decide (keyframe) ----
    def decide_key(src_y_pl, src_u_pl, src_v_pl, yb, ub, vb,
                   tcb0, tcb1, tcb2, dq1, dq2, dqu, qidx, rdmult, rddiv,
                   ymode_cost, uvmode_cost):
        sidx = jax.lax.axis_index("row")
        row_off = sidx * Rs
        mb = jnp.arange(Nl)
        mb_pos = jnp.stack([B + (mb // C + row_off) * 16,
                            B + (mb % C) * 16], 1)
        ipreds = jnp.moveaxis(
            ME.intra_mode_preds(src_y_pl, mb_pos, Rs, C, 16,
                                row_off=row_off), 1, 0)
        dq1b = jnp.broadcast_to(dq1[None], (4, Nl, 2))
        dq2b = jnp.broadcast_to(dq2[None], (4, Nl, 2))
        qxb = jnp.broadcast_to(qidx[None], (4, Nl))
        ry, dy, _ = RD.rd_y16(yb[None] - ipreds, dq1b, dq2b, qxb,
                              tcb0, tcb1)
        uvbest, ruv_i, duv_i = _uv_intra_rd(
            Rs, C, src_u_pl, src_v_pl, ub, vb, dqu, qidx, tcb2,
            uvmode_cost, rdmult, rddiv, row_off=row_off)
        rate = ymode_cost[:, None] + ry + ruv_i[None]
        dist = dy / 4.0 + duv_i[None] / 4.0
        rdall = RD.rdc(rate, dist, rdmult, rddiv)
        ymode = jnp.argmin(rdall, axis=0).astype(jnp.int32)
        return ymode, uvbest

    dk = smap(decide_key,
              in_specs=(rep, rep, rep, rowspec, rowspec, rowspec,
                        rep, rep, rep, rowspec, rowspec, rowspec,
                        rowspec, rep, rep, rep, rep),
              out_specs=(rowspec, rowspec))

    # ---- decide (inter) — mirror of tpu_encoder._decide_rd_inter
    # minus the B_PRED candidate (sharded ladder: sf.bpred=False), plus
    # the one-row ppermute MV halo for the near lattice ----
    def decide_inter(n_refs, me_step, refs_y, refs_u, refs_v,
                     src_y_pl, src_u_pl, src_v_pl, yb, ub, vb, centers,
                     taps, lo_r, hi_r, lo_c, hi_c, mvcost, prev8, sadpb,
                     tcb0, tcb1, tcb2, dq1, dq2, dqu, qidx,
                     rdmult, rddiv, ymode_cost, uvmode_cost,
                     ci0, ci1, modectx, c0tab, c1tab):
        sidx = jax.lax.axis_index("row")
        row_off = sidx * Rs
        mb = jnp.arange(Nl)
        mb_r, mb_c = mb // C, mb % C
        mb_pos = jnp.stack([B + (mb_r + row_off) * 16, B + mb_c * 16], 1)
        pen = (mvcost, prev8, sadpb)
        bounds = (lo_r, hi_r, lo_c, hi_c)
        mvs = []
        for k in range(n_refs):
            mv_fp, sad_fp = ME.full_search(refs_y[k], yb, centers,
                                           mb_pos, mv_pen=pen,
                                           step=me_step)
            mv8k, _ = ME.subpel_refine(refs_y[k], yb, mb_pos, mv_fp,
                                       sad_fp, taps, bounds, mv_pen=pen)
            mvs.append(mv8k)
        # one-row MV halo: the lattice needs the global row above
        last_row = mvs[0].reshape(Rs, C, 2)[-1]
        above_mv = jax.lax.ppermute(last_row, "row",
                                    sw._perm_down(S)) \
            if S > 1 else jnp.zeros_like(last_row)
        nearest, near, best_mv, cnt = ME.near_mv_lattice(
            mvs[0], Rs, C, above_mv=above_mv, row_off=row_off,
            n_rows_total=R)
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

        ipreds = jnp.moveaxis(
            ME.intra_mode_preds(src_y_pl, mb_pos, Rs, C, 16,
                                row_off=row_off), 1, 0)
        zero2 = jnp.zeros((Nl, 2), jnp.int32)
        cand_mvs = []
        for k in range(n_refs):
            cand_mvs += [zero2, nearest, near, mvs[k]]
        Kin = 4 * n_refs
        allmv = jnp.stack(cand_mvs, 0)
        flat_mv = allmv.reshape(Kin * Nl, 2)
        flat_ref = jnp.repeat(jnp.arange(n_refs, dtype=jnp.int32),
                              4 * Nl)
        pos_t = jnp.tile(mb_pos, (Kin, 1))
        starts = jnp.stack([pos_t[:, 0] + (flat_mv[:, 0] >> 3),
                            pos_t[:, 1] + (flat_mv[:, 1] >> 3)], 1)
        pred_in = P.mc_predict_blocks(refs_y, flat_ref, starts,
                                      flat_mv[:, 1] & 7,
                                      flat_mv[:, 0] & 7,
                                      taps, 16).reshape(Kin, Nl, 16, 16)
        preds = jnp.concatenate([ipreds, pred_in], 0)
        K = 4 + Kin
        dq1b = jnp.broadcast_to(dq1[None], (K, Nl, 2))
        dq2b = jnp.broadcast_to(dq2[None], (K, Nl, 2))
        qxb = jnp.broadcast_to(qidx[None], (K, Nl))
        ry, dy, _ = RD.rd_y16(yb[None] - preds, dq1b, dq2b, qxb,
                              tcb0, tcb1)
        uvbest, ruv_i, duv_i = _uv_intra_rd(
            Rs, C, src_u_pl, src_v_pl, ub, vb, dqu, qidx, tcb2,
            uvmode_cost, rdmult, rddiv, row_off=row_off)
        w_r = flat_mv[:, 0] + jnp.where(flat_mv[:, 0] >= 0, 1, -1)
        w_c = flat_mv[:, 1] + jnp.where(flat_mv[:, 1] >= 0, 1, -1)
        uv_r = jnp.sign(w_r) * (jnp.abs(w_r) // 2)
        uv_c = jnp.sign(w_c) * (jnp.abs(w_c) // 2)
        mb_r_t = jnp.tile(mb_r + row_off, (Kin,))
        mb_c_t = jnp.tile(mb_c, (Kin,))
        cstarts = jnp.stack([B2 + mb_r_t * 8 + (uv_r >> 3),
                             B2 + mb_c_t * 8 + (uv_c >> 3)], 1)
        pu = P.mc_predict_blocks(refs_u, flat_ref, cstarts, uv_c & 7,
                                 uv_r & 7, taps, 8).reshape(Kin, Nl, 8, 8)
        pv = P.mc_predict_blocks(refs_v, flat_ref, cstarts, uv_c & 7,
                                 uv_r & 7, taps, 8).reshape(Kin, Nl, 8, 8)
        dqub = jnp.broadcast_to(dqu[None], (Kin, Nl, 2))
        qxb_in = jnp.broadcast_to(qidx[None], (Kin, Nl))
        ruv_in, duv_in = RD.rd_uv(ub[None] - pu, vb[None] - pv, dqub,
                                  qxb_in, tcb2)

        def mv_rate(mv8):
            dr = jnp.clip(jnp.abs(mv8[:, 0] - best_mv[:, 0]) >> 1,
                          0, 1023)
            dc_ = jnp.clip(jnp.abs(mv8[:, 1] - best_mv[:, 1]) >> 1,
                           0, 1023)
            return ((jnp.take(mvcost[0], dr) + jnp.take(mvcost[1], dc_))
                    * 96) >> 7

        mode_costs = [czero, cnearest, cnear, cnew]
        rate_rows = [ci0 + ymode_cost[m] + ry[m] + ruv_i
                     for m in range(4)]
        dist_rows = [dy[m] / 4.0 + duv_i / 4.0 for m in range(4)]
        for k in range(n_refs):
            for j in range(4):
                i = 4 * k + j
                extra = mv_rate(mvs[k]) if j == 3 else 0
                rate_rows.append(ci1[k] + mode_costs[j] + extra +
                                 ry[4 + i] + ruv_in[i])
                dist_rows.append(dy[4 + i] / 4.0 + duv_in[i] / 4.0)
        rate = jnp.stack(rate_rows, 0)
        dist = jnp.stack(dist_rows, 0)
        rdall = RD.rdc(rate, dist, rdmult, rddiv)
        best = jnp.argmin(rdall, axis=0)
        ymode = jnp.argmin(rdall[:4], axis=0).astype(jnp.int32)
        inter = best >= 4
        ref_k = jnp.where(inter, (best - 4) // 4, -1).astype(jnp.int32)
        ar = jnp.arange(Nl)
        mv_out = jnp.where(inter[:, None],
                           allmv[jnp.clip(best - 4, 0, Kin - 1), ar], 0)
        return mv_out, ref_k, ymode, uvbest

    di_cache = {}

    def decide_inter_prog(n_refs, me_step):
        key = (n_refs, me_step)
        if key not in di_cache:
            f = functools.partial(decide_inter, n_refs, me_step)
            di_cache[key] = smap(
                f,
                in_specs=(rep, rep, rep, rep, rep, rep,
                          rowspec, rowspec, rowspec, rowspec,
                          rep, rowspec, rowspec, rowspec, rowspec,
                          rep, rowspec, rep,
                          rep, rep, rep, rowspec, rowspec, rowspec,
                          rowspec, rep, rep, rep, rep,
                          rep, rep, rep, rep, rep),
                out_specs=(rowspec, rowspec, rowspec, rowspec))
        return di_cache[key]

    # ---- encode program (trellis ext + sharded wavefront) ----
    def encode(use_trellis, refs_y, refs_u, refs_v, refk,
               src_y_blocks, src_u_blocks, src_v_blocks,
               mode, uv_mode, intra, mv8, taps, dq_y1, dq_y2, dq_uv,
               qidx, tcb0, tcb1, tcb2, rdmult, rddiv):
        sidx = jax.lax.axis_index("row")
        row_off = sidx * Rs
        mb = jnp.arange(Nl)
        mb_r, mb_c = mb // C + row_off, mb % C
        rk = jnp.clip(refk, 0, refs_y.shape[0] - 1)
        sy_ = B + mb_r * 16 + (mv8[:, 0] >> 3)
        sx_ = B + mb_c * 16 + (mv8[:, 1] >> 3)
        pred_y = P.mc_predict_blocks(refs_y, rk,
                                     jnp.stack([sy_, sx_], 1),
                                     mv8[:, 1] & 7, mv8[:, 0] & 7,
                                     taps, 16)
        w_r = mv8[:, 0] + jnp.where(mv8[:, 0] >= 0, 1, -1)
        w_c = mv8[:, 1] + jnp.where(mv8[:, 1] >= 0, 1, -1)
        uv_r = jnp.sign(w_r) * (jnp.abs(w_r) // 2)
        uv_c = jnp.sign(w_c) * (jnp.abs(w_c) // 2)
        cstarts = jnp.stack([B2 + mb_r * 8 + (uv_r >> 3),
                             B2 + mb_c * 8 + (uv_c >> 3)], 1)
        pred_u = P.mc_predict_blocks(refs_u, rk, cstarts, uv_c & 7,
                                     uv_r & 7, taps, 8)
        pred_v = P.mc_predict_blocks(refs_v, rk, cstarts, uv_c & 7,
                                     uv_r & 7, taps, 8)
        uv_mode_l = jnp.where(intra, uv_mode, te.DC_PRED)

        if use_trellis:
            coefs_y = tf.fdct4x4_batch(
                RD._mb_blocks(src_y_blocks - pred_y)).reshape(Nl, 16, 16)
            y2c = tf.walsh4x4_batch(coefs_y[:, :, 0])
            qy0, _ = tf.regular_quant_batch(coefs_y, dq_y1[:, None, :],
                                            qidx[:, None],
                                            jnp.ones((), bool))
            qy20, _ = tf.regular_quant_batch(y2c, dq_y2, qidx,
                                             jnp.zeros((), bool))
            scan16 = jnp.arange(16)
            ZZi = jnp.asarray(np.asarray(RD.ZZ))
            eob_y = jnp.max(jnp.where(qy0[..., ZZi] != 0, scan16 + 1, 0),
                            -1)
            nzy = (jnp.maximum(eob_y, 1) > 1).astype(jnp.int32) \
                .reshape(Nl, 4, 4)
            ctx_y = (jnp.concatenate([jnp.zeros_like(nzy[:, :1]),
                                      nzy[:, :-1]], 1) +
                     jnp.concatenate([jnp.zeros_like(nzy[:, :, :1]),
                                      nzy[:, :, :-1]], 2)).reshape(Nl, 16)
            qy_t, ey_t = RD.trellis_batch(coefs_y, qy0, dq_y1[:, None, :],
                                          tcb0, 1, 4.0, ctx_y,
                                          rdmult, rddiv)
            ey_t = jnp.maximum(ey_t, 1)
            qy2_t, ey2_t = RD.trellis_batch(y2c, qy20, dq_y2, tcb1, 0,
                                            16.0,
                                            jnp.zeros(Nl, jnp.int32),
                                            rdmult, rddiv)
            ublk = (src_u_blocks - pred_u).reshape(Nl, 2, 4, 2, 4) \
                .transpose(0, 1, 3, 2, 4).reshape(Nl, 4, 4, 4)
            vblk = (src_v_blocks - pred_v).reshape(Nl, 2, 4, 2, 4) \
                .transpose(0, 1, 3, 2, 4).reshape(Nl, 4, 4, 4)
            coefs_uv = tf.fdct4x4_batch(
                jnp.concatenate([ublk, vblk], 1)).reshape(Nl, 8, 16)
            quv0, _ = tf.regular_quant_batch(coefs_uv, dq_uv[:, None, :],
                                             qidx[:, None],
                                             jnp.zeros((), bool))
            eob_uv = jnp.max(jnp.where(quv0[..., ZZi] != 0,
                                       scan16 + 1, 0), -1)
            nzuv = (eob_uv > 0).astype(jnp.int32).reshape(Nl, 2, 2, 2)
            ctx_uv = (jnp.concatenate([jnp.zeros_like(nzuv[:, :, :1]),
                                       nzuv[:, :, :-1]], 2) +
                      jnp.concatenate([jnp.zeros_like(nzuv[:, :, :, :1]),
                                       nzuv[:, :, :, :-1]], 3)) \
                .reshape(Nl, 8)
            quv_t, euv_t = RD.trellis_batch(coefs_uv, quv0,
                                            dq_uv[:, None, :],
                                            tcb2, 0, 2.0, ctx_uv,
                                            rdmult, rddiv)
            q_ext = jnp.concatenate([qy_t, quv_t, qy2_t[:, None]], 1)
            e_ext = jnp.concatenate([ey_t, euv_t, ey2_t[:, None]], 1)
            use_ext = ~intra
        else:
            q_ext = e_ext = use_ext = None

        qcoeff, eobs, ry, ru, rv = encode_recon_sharded(
            Rs, C, S, "row", src_y_blocks, src_u_blocks, src_v_blocks,
            pred_y, pred_u, pred_v, mode, uv_mode_l, intra,
            dq_y1, dq_y2, dq_uv, qidx, q_ext, e_ext, use_ext)
        return (qcoeff.astype(jnp.int16), eobs.astype(jnp.int32),
                uv_mode_l, ry, ru, rv)

    enc_cache = {}

    def encode_prog(use_trellis):
        if use_trellis not in enc_cache:
            f = functools.partial(encode, use_trellis)
            enc_cache[use_trellis] = smap(
                f,
                in_specs=(rep, rep, rep, rowspec,
                          rowspec, rowspec, rowspec,
                          rowspec, rowspec, rowspec, rowspec, rep,
                          rowspec, rowspec, rowspec, rowspec,
                          rep, rep, rep, rep, rep),
                out_specs=(rowspec, rowspec, rowspec, rowspec, rowspec,
                           rowspec))
        return enc_cache[use_trellis]

    # ---- LF + assembly + all-gathered replicated reference planes ----
    def lf(do_lf, ry, ru, rv, flevel, mblim_a, blim_a, lim_a, hev_a,
           noskip_a):
        if do_lf:
            ry, ru, rv = sw.loop_filter_sharded(
                Rs, C, S, "row", False, ry, ru, rv, flevel, mblim_a,
                blim_a, lim_a, hev_a, noskip_a)
        y_loc = tf.mbs_to_plane(ry, Rs, C, 16).astype(jnp.uint8)
        u_loc = tf.mbs_to_plane(ru, Rs, C, 8).astype(jnp.uint8)
        v_loc = tf.mbs_to_plane(rv, Rs, C, 8).astype(jnp.uint8)
        y_full = jax.lax.all_gather(y_loc, "row").reshape(R * 16, C * 16)
        u_full = jax.lax.all_gather(u_loc, "row").reshape(R * 8, C * 8)
        v_full = jax.lax.all_gather(v_loc, "row").reshape(R * 8, C * 8)
        HP, WP = R * 16 + 2 * B, C * 16 + 2 * B
        HPc, WPc = R * 8 + 2 * B2, C * 8 + 2 * B2
        cy = jnp.zeros((HP, WP), jnp.uint8)
        cu = jnp.zeros((HPc, WPc), jnp.uint8)
        cv = jnp.zeros((HPc, WPc), jnp.uint8)
        cy = jax.lax.dynamic_update_slice(cy, y_full, (B, B))
        cu = jax.lax.dynamic_update_slice(cu, u_full, (B2, B2))
        cv = jax.lax.dynamic_update_slice(cv, v_full, (B2, B2))
        cy = te._extend_borders(cy, B, C * 16, R * 16)
        cu = te._extend_borders(cu, B2, C * 8, R * 8)
        cv = te._extend_borders(cv, B2, C * 8, R * 8)
        return cy, cu, cv

    lf_cache = {}

    def lf_prog(do_lf):
        if do_lf not in lf_cache:
            f = functools.partial(lf, do_lf)
            lf_cache[do_lf] = smap(
                f,
                in_specs=(rowspec, rowspec, rowspec,
                          rowspec, rowspec, rowspec, rowspec, rowspec,
                          rowspec),
                out_specs=(rep, rep, rep))
        return lf_cache[do_lf]

    return dk, decide_inter_prog, encode_prog, lf_prog


class ShardedTPUEncoder(TPUEncoder):
    """TPUEncoder whose device programs run MB-row-sharded over a
    ('row',) mesh.  Bit-identical payloads to the single-chip TPUEncoder
    under any SpeedFeatures with bpred=False
    (tests/test_sharded_encode.py)."""

    def __init__(self, *args, mesh=None, n_devices=None, **kwargs):
        super().__init__(*args, **kwargs)
        if self.sf.bpred:
            # B_PRED encode lanes are not stitched across shards yet
            from dataclasses import replace
            self.sf = replace(self.sf, bpred=False)
        self.mesh = mesh if mesh is not None else make_row_mesh(n_devices)
        (self._dk_prog, self._di_prog, self._enc_prog,
         self._lf_progf) = _programs(self.mesh, self.R, self.C)

    # --- dispatch hook overrides (global-view signatures) ---
    def _decide_key_fn(self, R, C, src_y_pl, src_u_pl, src_v_pl,
                       yb, ub, vb, tcb0, tcb1, tcb2, dq1, dq2, dqu, qidx,
                       rdmult, rddiv, ymode_cost, uvmode_cost):
        return self._dk_prog(src_y_pl, src_u_pl, src_v_pl, yb, ub, vb,
                             tcb0, tcb1, tcb2, dq1, dq2, dqu, qidx,
                             rdmult, rddiv, ymode_cost, uvmode_cost)

    def _decide_inter_fn(self, R, C, n_refs, me_step, use_bpred,
                         refs_y, refs_u, refs_v,
                         src_y_pl, src_u_pl, src_v_pl, yb, ub, vb,
                         centers, taps, lo_r, hi_r, lo_c, hi_c,
                         mvcost, prev8, sadpb, tcb0, tcb1, tcb2, tcb3,
                         dq1, dq2, dqu, qidx, rdmult, rddiv,
                         ymode_cost, uvmode_cost, bmode_cost,
                         ci0, ci1, modectx, c0tab, c1tab):
        assert not use_bpred
        prog = self._di_prog(n_refs, me_step)
        return prog(refs_y, refs_u, refs_v, src_y_pl, src_u_pl,
                    src_v_pl, yb, ub, vb, centers, taps,
                    lo_r, hi_r, lo_c, hi_c, mvcost, prev8, sadpb,
                    tcb0, tcb1, tcb2, dq1, dq2, dqu, qidx,
                    rdmult, rddiv, ymode_cost, uvmode_cost,
                    ci0, ci1, modectx, c0tab, c1tab)

    def _encode_fn(self, R, C, use_trellis, refs_y, refs_u, refs_v,
                   refk, yb, ub, vb, mode, uv_mode, intra, mv8, taps,
                   dq1, dq2, dqu, qidx, tcb0, tcb1, tcb2, tcb3,
                   bmode_cost, rdmult, rddiv):
        prog = self._enc_prog(bool(use_trellis))
        qcoeff, eobs, uv_mode_l, ry, ru, rv = prog(
            refs_y, refs_u, refs_v, refk, yb, ub, vb, mode, uv_mode,
            intra, mv8, taps, dq1, dq2, dqu, qidx, tcb0, tcb1, tcb2,
            rdmult, rddiv)
        bmodes = jnp.zeros((R * C, 16), jnp.int32)
        return qcoeff, eobs, uv_mode_l, ry, ru, rv, bmodes

    def _lf_fn(self, R, C, do_lf, ry, ru, rv, flevel, mblim_a, blim_a,
               lim_a, hev_a, noskip_a):
        prog = self._lf_progf(bool(do_lf))
        return prog(ry, ru, rv, flevel, mblim_a, blim_a, lim_a, hev_a,
                    noskip_a)
