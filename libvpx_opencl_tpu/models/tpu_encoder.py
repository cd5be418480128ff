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


def _tcb_tables():
    """Banded device token-cost tables under the default coefficient
    probabilities (the golden encoder's _tc model)."""
    global _TCB
    if _TCB is None:
        tc = _default_token_costs()
        _TCB = tuple(RD.banded_token_costs(tc, t) for t in range(3))
    return _TCB


def _uv_inter_rd(R, C, ref_u, ref_v, ub, vb, mv8, taps, dqu, qidx, tcb2):
    """Chroma rate/dist of an inter candidate: derive the chroma MV
    (reconinter.c:418-424), MC-predict, cost (rd_inter16x16_uv role)."""
    N = R * C
    mb = jnp.arange(N)
    mb_r, mb_c = mb // C, mb % C
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
                 uvmode_cost, rdmult, rddiv):
    """RD-pick the chroma intra mode (rd_pick_intra_mbuv_mode role).
    Returns (best mode [N], its rate incl. signaling [N], dist [N])."""
    N = R * C
    mb = jnp.arange(N)
    cpos = jnp.stack([B2 + (mb // C) * 8, B2 + (mb % C) * 8], 1)
    ipu = jnp.moveaxis(ME.intra_mode_preds(src_u_pl, cpos, R, C, 8), 1, 0)
    ipv = jnp.moveaxis(ME.intra_mode_preds(src_v_pl, cpos, R, C, 8), 1, 0)
    dqub = jnp.broadcast_to(dqu[None], (4, N, 2))
    qxb = jnp.broadcast_to(qidx[None], (4, N))
    ruv, duv = RD.rd_uv(ub[None] - ipu, vb[None] - ipv, dqub, qxb, tcb2)
    ruv = ruv + uvmode_cost[:, None]
    rd_ = RD.rdc(ruv, duv / 4.0, rdmult, rddiv)
    best = jnp.argmin(rd_, axis=0)
    ar = jnp.arange(N)
    return best.astype(jnp.int32), ruv[best, ar], duv[best, ar]


@functools.partial(jax.jit, static_argnums=(0, 1))
def _decide_rd_inter(R, C, ref_y, ref_u, ref_v, src_y_pl, src_u_pl,
                     src_v_pl, yb, ub, vb, centers, taps,
                     lo_r, hi_r, lo_c, hi_c, mvcost, pred8, sadpb,
                     tcb0, tcb1, tcb2, dq1, dq2, dqu, qidx, rdmult, rddiv,
                     ymode_cost, uvmode_cost, ci0, ci1, czero, cnew):
    """Program A (RD form): motion search + token-cost RD mode decision
    over {DC,V,H,TM, ZEROMV, NEWMV} — the vp8_rd_pick_inter_mode role
    (rdopt.c:1714) batched over every MB at once.  Intra predictions come
    from source neighbors (decision approximation; the encode wavefront
    reconstructs from true neighbors)."""
    N = R * C
    mb = jnp.arange(N)
    mb_r, mb_c = mb // C, mb % C
    mb_pos = jnp.stack([B + mb_r * 16, B + mb_c * 16], 1)
    pen = (mvcost, pred8, sadpb)
    mv_fp, sad_fp = ME.full_search(ref_y, yb, centers, mb_pos, mv_pen=pen)
    mv8, _sad = ME.subpel_refine(ref_y, yb, mb_pos, mv_fp, sad_fp,
                                 taps, (lo_r, hi_r, lo_c, hi_c), mv_pen=pen)
    # Y candidates: 4 intra + ZEROMV + NEWMV
    ipreds = jnp.moveaxis(ME.intra_mode_preds(src_y_pl, mb_pos, R, C, 16),
                          1, 0)                       # [4,N,16,16]
    zero = jnp.zeros(N, jnp.int32)
    sy = B + mb_r * 16 + (mv8[:, 0] >> 3)
    sx = B + mb_c * 16 + (mv8[:, 1] >> 3)
    pred_new = P.mc_predict_blocks(ref_y[None], zero, jnp.stack([sy, sx], 1),
                                   mv8[:, 1] & 7, mv8[:, 0] & 7, taps, 16)
    pred_zero = P.mc_predict_blocks(ref_y[None], zero, mb_pos, zero, zero,
                                    taps, 16)
    preds = jnp.concatenate([ipreds, pred_zero[None], pred_new[None]], 0)
    K = 6
    dq1b = jnp.broadcast_to(dq1[None], (K, N, 2))
    dq2b = jnp.broadcast_to(dq2[None], (K, N, 2))
    qxb = jnp.broadcast_to(qidx[None], (K, N))
    ry, dy, _ = RD.rd_y16(yb[None] - preds, dq1b, dq2b, qxb, tcb0, tcb1)
    # UV: best intra mode (shared by intra candidates) + per-inter-MV cost
    uvbest, ruv_i, duv_i = _uv_intra_rd(R, C, src_u_pl, src_v_pl, ub, vb,
                                        dqu, qidx, tcb2, uvmode_cost,
                                        rdmult, rddiv)
    ruv_z, duv_z = _uv_inter_rd(R, C, ref_u, ref_v, ub, vb,
                                jnp.zeros_like(mv8), taps, dqu, qidx, tcb2)
    ruv_n, duv_n = _uv_inter_rd(R, C, ref_u, ref_v, ub, vb, mv8, taps,
                                dqu, qidx, tcb2)
    # NEWMV signaling cost (vp8_mv_bit_cost, weight 96)
    dr = jnp.clip(jnp.abs(mv8[:, 0] - pred8[:, 0]) >> 1, 0, 1023)
    dc_ = jnp.clip(jnp.abs(mv8[:, 1] - pred8[:, 1]) >> 1, 0, 1023)
    mvc = ((jnp.take(mvcost[0], dr) + jnp.take(mvcost[1], dc_)) * 96) >> 7
    rate = jnp.stack(
        [ci0 + ymode_cost[m] + ry[m] + ruv_i for m in range(4)] +
        [ci1 + czero + ry[4] + ruv_z,
         ci1 + cnew + mvc + ry[5] + ruv_n], 0)
    dist = jnp.stack(
        [dy[m] / 4.0 + duv_i / 4.0 for m in range(4)] +
        [dy[4] / 4.0 + duv_z / 4.0, dy[5] / 4.0 + duv_n / 4.0], 0)
    rdall = RD.rdc(rate, dist, rdmult, rddiv)
    best = jnp.argmin(rdall, axis=0)
    ymode = jnp.argmin(rdall[:4], axis=0).astype(jnp.int32)
    use_inter = best >= 4
    mv_out = jnp.where((best == 5)[:, None], mv8, 0)
    return mv_out, use_inter, ymode, uvbest


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


@functools.partial(jax.jit, static_argnums=(0, 1))
def _encode_device(R, C, ref_y, ref_u, ref_v,
                   src_y_blocks, src_u_blocks, src_v_blocks,
                   mode, uv_mode, intra, mv8, taps, dq_y1, dq_y2, dq_uv,
                   qidx, tcb0, tcb1, tcb2, rdmult, rddiv):
    """Program B: MC preds + encode wavefront."""
    N = R * C
    sch = wf.schedule(R, C)
    mb = jnp.arange(N)
    mb_r, mb_c = mb // C, mb % C
    # luma MC
    sy = B + mb_r * 16 + (mv8[:, 0] >> 3)
    sx = B + mb_c * 16 + (mv8[:, 1] >> 3)
    zero = jnp.zeros(N, jnp.int32)
    pred_y = P.mc_predict_blocks(ref_y[None], zero, jnp.stack([sy, sx], 1),
                                 mv8[:, 1] & 7, mv8[:, 0] & 7, taps, 16)
    # chroma MV derivation (reconinter.c:418-424)
    w_r = mv8[:, 0] + jnp.where(mv8[:, 0] >= 0, 1, -1)
    w_c = mv8[:, 1] + jnp.where(mv8[:, 1] >= 0, 1, -1)
    uv_r = jnp.sign(w_r) * (jnp.abs(w_r) // 2)
    uv_c = jnp.sign(w_c) * (jnp.abs(w_c) // 2)
    csy = B2 + mb_r * 8 + (uv_r >> 3)
    csx = B2 + mb_c * 8 + (uv_c >> 3)
    cstarts = jnp.stack([csy, csx], 1)
    pred_u = P.mc_predict_blocks(ref_u[None], zero, cstarts, uv_c & 7,
                                 uv_r & 7, taps, 8)
    pred_v = P.mc_predict_blocks(ref_v[None], zero, cstarts, uv_c & 7,
                                 uv_r & 7, taps, 8)
    # chroma intra mode: RD-chosen by the decision program for intra MBs
    uv_mode = jnp.where(intra, uv_mode, DC_PRED)

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

    qcoeff, eobs, ry, ru, rv = wf.encode_recon_blocks(
        R, C, sch, src_y_blocks, src_u_blocks, src_v_blocks,
        pred_y, pred_u, pred_v, mode, uv_mode, intra, dq_y1, dq_y2, dq_uv,
        qidx, q_ext, e_ext, use_ext)
    return (qcoeff.astype(jnp.int16), eobs.astype(jnp.int32), uv_mode,
            ry, ru, rv)


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

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        R, C = self.R, self.C
        HP, WP = R * 16 + 2 * B, C * 16 + 2 * B
        HPc, WPc = R * 8 + 2 * B2, C * 8 + 2 * B2
        z = DeviceFrame(jnp.zeros((HP, WP), jnp.uint8),
                        jnp.zeros((HPc, WPc), jnp.uint8),
                        jnp.zeros((HPc, WPc), jnp.uint8), self.w, self.h)
        self.ref = z
        self.prev_mv = np.zeros((R * C, 2), np.int32)

    def encode_frame(self, y, u, v, keyframe=None, commit=True):
        if keyframe is None:
            keyframe = self.frame_count == 0
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
        iy = src.y[bb:bb + R * 16, bb:bb + C * 16]
        iu = src.u[bb2:bb2 + R * 8, bb2:bb2 + C * 8]
        iv = src.v[bb2:bb2 + R * 8, bb2:bb2 + C * 8]
        yb = j(iy.reshape(R, 16, C, 16).transpose(0, 2, 1, 3)
               .reshape(N, 16, 16).astype(np.int32))
        ub = j(iu.reshape(R, 8, C, 8).transpose(0, 2, 1, 3)
               .reshape(N, 8, 8).astype(np.int32))
        vb = j(iv.reshape(R, 8, C, 8).transpose(0, 2, 1, 3)
               .reshape(N, 8, 8).astype(np.int32))
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
        tcb0, tcb1, tcb2 = _tcb_tables()

        if keyframe:
            mv8 = np.zeros((N, 2), np.int32)
            intra = np.ones(N, bool)
            ymode_d, uvb_d = _decide_rd_key(
                R, C, src_y_pl, src_u_pl, src_v_pl, yb, ub, vb,
                tcb0, tcb1, tcb2, dq1, dq2, dqu, qidx, rdm_f, rdd_f,
                j(np.asarray(rdopt.KF_YMODE_COST[:4], np.int32)),
                j(np.asarray(rdopt.KF_UV_MODE_COST, np.int32)))
            ymode = np.asarray(ymode_d).astype(np.int32)
            uvmode = np.asarray(uvb_d).astype(np.int32)
        else:
            lo = np.stack([-(mbr * 16) - 16, -(mbc * 16) - 16], 1)
            hi = np.stack([(R - 1 - mbr) * 16 + 16, (C - 1 - mbc) * 16 + 16],
                          1)
            centers = np.clip(self.prev_mv >> 3, lo, hi)
            # MV-rate cost tables + per-MB predictor (the previous frame's
            # MV stands in for best_ref_mv, which is only known at pack
            # time) + sad-per-bit at the frame quantizer
            mvcost = j(np.stack([rdopt.MV_COST[0], rdopt.MV_COST[1]])
                       .astype(np.int32))
            pred8 = j(self.prev_mv.astype(np.int32))
            sadpb = jnp.int32(int(ME.SAD_PER_BIT16[self.qindex]))
            # mode signaling costs: intra/inter + mv_ref under a
            # prev-motion-conditioned context (probs are only exactly
            # known at pack time)
            ci0 = jnp.int32(rdopt.cost0(self.prob_intra))
            ci1 = jnp.int32(rdopt.cost1(self.prob_intra) +
                            rdopt.cost0(self.prob_last))
            rows = np.where((self.prev_mv == 0).all(1), 4, 2)
            pr = np.asarray(T.MODE_CONTEXTS)[rows]     # [N, 4]
            czero = rdopt._C0[pr[:, 0]].astype(np.int32)
            cnew = (rdopt._C1[pr[:, 0]] + rdopt._C1[pr[:, 1]] +
                    rdopt._C1[pr[:, 2]] + rdopt._C0[pr[:, 3]]) \
                .astype(np.int32)
            mv8_d, use_inter, ymode_d, uvb_d = _decide_rd_inter(
                R, C, self.ref.y, self.ref.u, self.ref.v,
                src_y_pl, src_u_pl, src_v_pl, yb, ub, vb,
                j(centers.astype(np.int32)), taps, lo_r, hi_r, lo_c, hi_c,
                mvcost, pred8, sadpb, tcb0, tcb1, tcb2, dq1, dq2, dqu,
                qidx, rdm_f, rdd_f,
                j(np.asarray(rdopt.YMODE_COST[:4], np.int32)),
                j(np.asarray(rdopt.UV_MODE_COST, np.int32)),
                ci0, ci1, j(czero), j(cnew))
            mv8 = np.array(mv8_d)
            intra = ~np.asarray(use_inter)
            ymode = np.asarray(ymode_d).astype(np.int32)
            uvmode = np.asarray(uvb_d).astype(np.int32)

        mode_dev = j(ymode.astype(np.int32))
        qcoeff, eobs, uv_mode_d, ry, ru, rv = _encode_device(
            R, C, self.ref.y, self.ref.u, self.ref.v, yb, ub, vb,
            mode_dev, j(uvmode),
            j(intra), j(mv8.astype(np.int32)), taps, dq1, dq2, dqu, qidx,
            tcb0, tcb1, tcb2, rdm_f, rdd_f)
        qcoeff, eobs, uv_mode = jax.device_get((qcoeff, eobs, uv_mode_d))

        # host-side grids for packing
        self.mode = np.zeros((R + 1, C + 1), np.int32)
        self.uvmode = uv_mode.reshape(R, C).astype(np.int32)
        self.reff = np.zeros((R + 1, C + 1), np.int32)
        self.mv = np.zeros((R + 1, C + 1, 2), np.int32)
        self.qcoeff = qcoeff.reshape(R, C, 25, 16).astype(np.int32)
        self.eobs = eobs.reshape(R, C, 25)
        self.mode[1:, 1:] = ymode.reshape(R, C)
        self.reff[1:, 1:] = np.where(intra.reshape(R, C), INTRA_FRAME,
                                     LAST_FRAME)
        self.mv[1:, 1:, 0] = mv8[:, 0].reshape(R, C)
        self.mv[1:, 1:, 1] = mv8[:, 1].reshape(R, C)
        # map chosen MVs to the cheapest coding mode at pack time
        if not keyframe:
            for r in range(R):
                for c in range(C):
                    if self.reff[r + 1, c + 1] == INTRA_FRAME:
                        continue
                    mvv = (int(self.mv[r + 1, c + 1, 0]),
                           int(self.mv[r + 1, c + 1, 1]))
                    if mvv == (0, 0):
                        self.mode[r + 1, c + 1] = ZEROMV
                    else:
                        near, nearest, best, probs, cnt = self._find_near(r, c)
                        if mvv == nearest:
                            self.mode[r + 1, c + 1] = NEARESTMV
                        elif mvv == near:
                            self.mode[r + 1, c + 1] = NEARMV
                        else:
                            self.mode[r + 1, c + 1] = NEWMV

        # skip decision
        self.skip = np.zeros((R, C), np.int32)
        if self.mb_no_coeff_skip:
            tot = self.eobs.sum(axis=2) - 16
            self.skip = (tot == 0).astype(np.int32)

        payload = self._pack(keyframe)
        self._pending = (keyframe, ry, ru, rv, mv8)
        if commit:
            self.commit_frame(payload)
        return payload

    def commit_frame(self, payload):
        """Apply the device loop filter + reference swap for the accepted
        frame (split out for the RC recode loop)."""
        keyframe, ry, ru, rv, mv8 = self._pending
        self._pending = None
        j = jnp.asarray
        R, C = self.R, self.C
        flevel, mblim_a, blim_a, lim_a, hev_a, noskip_a = \
            self._lf_params(keyframe)
        cy, cu, cv = _lf_device(R, C, self.filter_level > 0, ry, ru, rv,
                                j(flevel), j(mblim_a), j(blim_a), j(lim_a),
                                j(hev_a), j(noskip_a))
        self.ref = DeviceFrame(cy, cu, cv, self.w, self.h)
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
        noskip = ~(self.skip.reshape(N) != 0)
        return (fl.astype(np.int32),
                (2 * (fl + 2) + inner).astype(np.int32),
                (2 * fl + inner).astype(np.int32),
                inner.astype(np.int32),
                hev.astype(np.int32), noskip)
