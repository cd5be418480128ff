"""Device rate-distortion costing: batched token rates for quantized
blocks under the frame's entropy model.

TPU redesign of the reference's per-block RD costing (the hot inner loop
of vp8_rd_pick_inter_mode / rd_pick_intra: cost_coeffs rdopt.c:503-534,
vp8_block_error / vp8_mbblock_error encodemb kernels): instead of walking
tokens per block on the host, every candidate mode of every macroblock is
costed at once as whole-frame array ops.  Token identity, previous-token
class, and extra-bit cost are computed arithmetically (no data gathers —
small-table lookups become one-hot contractions on the MXU), so the whole
rate computation vectorizes.

The host oracle is rdopt.cost_block / encoder._quant_y16; the
differential test is tests/test_rd_device.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models import rdopt
from . import tables as T
from . import transforms as tf

ZZ = tuple(int(v) for v in T.ZIGZAG)           # scan -> raster
BANDS = tuple(int(v) for v in T.COEF_BANDS)    # scan -> band
CAT_MIN = (5, 7, 11, 19, 35, 67)
EOB = 11

# per-category extra-bit costs (fixed probs, tokenize.c:36-94)
_CAT_BIT_COSTS = tuple(
    tuple((rdopt.cost0(p), rdopt.cost1(p)) for p in probs)
    for probs in rdopt.CAT_PROBS)


def banded_token_costs(tc, btype):
    """Host helper: [8,3,12] token-cost table for one block type, expanded
    to scan position -> [16,3,12] (cost_coeffs indexes by COEF_BANDS[c])."""
    t = np.asarray(tc[btype], np.int64)[list(BANDS)]   # [16,3,12]
    return jnp.asarray(t.astype(np.float32))


def _token_of(a):
    """DCT token id from |value| (fill_value_tokens thresholds)."""
    t = jnp.minimum(a, 4)
    for k, lo in enumerate((5, 7, 11, 19, 35, 67)):
        t = jnp.where(a >= lo, 5 + k, t)
    return t


def _value_cost(a, tok):
    """Extra-bit + sign cost of a coefficient value (DCT_VALUE_COST dual:
    zero for literal tokens 0-4, category bits + half-prob sign above)."""
    cost = jnp.zeros_like(a)
    for k in range(6):
        extra = a - CAT_MIN[k]
        bits = _CAT_BIT_COSTS[k]
        nb = len(bits)
        ck = jnp.zeros_like(a)
        for j, (c0, c1) in enumerate(bits):
            bit = (extra >> (nb - 1 - j)) & 1
            ck = ck + jnp.where(bit == 1, c1, c0)
        cost = jnp.where(tok == 5 + k, ck + 256, cost)
    return cost


def block_rate(q, tcb, start, ctx0):
    """Token rate of quantized blocks (cost_coeffs rdopt.c:503-534).

    q [..., 16] raster levels; tcb [16,3,12] float32 banded costs;
    start: 0, or 1 for Y-with-Y2; ctx0 [...] entropy context 0..2.
    Returns (rate [...] int32, nz [...] int32)."""
    qz = q[..., ZZ].astype(jnp.int32)
    a = jnp.abs(qz)
    tok = _token_of(a)
    scan = jnp.arange(16)
    eob = jnp.max(jnp.where(qz != 0, scan + 1, 0), axis=-1)
    eob = jnp.maximum(eob, start)          # empty Y block => eob==start
    # previous-token class per scan position (PREV_TOKEN_CLASS == min(a,2))
    prev_class = jnp.minimum(a, 2)
    pt = jnp.concatenate(
        [jnp.zeros((*a.shape[:-1], 1), a.dtype), prev_class[..., :-1]], -1)
    pt = pt.at[..., start].set(ctx0)
    oc = jax.nn.one_hot(pt, 3, dtype=jnp.float32)       # [...,16,3]
    ot = jax.nn.one_hot(tok, 12, dtype=jnp.float32)     # [...,16,12]
    base = jnp.einsum('...ic,...it,ict->...i', oc, ot, tcb)
    val = _value_cost(a, tok).astype(jnp.float32)
    inside = ((scan >= start) & (scan < eob[..., None])).astype(jnp.float32)
    rate = jnp.sum(inside * (base + val), axis=-1)
    # EOB token cost at scan position == eob (when eob < 16)
    eobc = jnp.einsum('...ic,ic->...i', oc, tcb[:, :, EOB])
    at_eob = (scan == eob[..., None]).astype(jnp.float32)
    rate = rate + jnp.sum(at_eob * eobc, axis=-1)
    return rate.astype(jnp.int32), (eob > start).astype(jnp.int32)


def _mb_blocks(resid):
    """[..., 16, 16] pixel residual -> [..., 16, 16] per-4x4 raster coefs
    layout ([..., block, coef])."""
    s = resid.shape[:-2]
    x = resid.reshape(*s, 4, 4, 4, 4)          # (by, py, bx, px)
    x = jnp.moveaxis(x, -3, -2)                # (by, bx, py, px)
    return x.reshape(*s, 16, 4, 4)


def rd_y16(resid, dq1, dq2, qidx, tcb0, tcb1):
    """Whole-MB Y rate/distortion under the has_y2 layout
    (_quant_y16 + _cost_y dual, regular zbin quant — the same quantizer
    the encode wavefront applies).

    resid [..., 16, 16] int32; dq1/dq2 [..., 2]; qidx [...].
    Returns (rate [...], dist [...] float32 transform-domain error
    pre->>2, nz16 [..., 16] per-block nonzero flags)."""
    blocks = _mb_blocks(resid)
    coefs = tf.fdct4x4_batch(blocks).reshape(*blocks.shape[:-2], 16)
    y2 = tf.walsh4x4_batch(coefs[..., :, 0])
    q, _ = tf.regular_quant_batch(coefs, dq1[..., None, :],
                                  qidx[..., None],
                                  jnp.ones((), bool))
    qy2, _ = tf.regular_quant_batch(y2, dq2, qidx, jnp.zeros((), bool))
    # distortion: AC error for the 16 Y blocks + full Y2 error
    ac = dq1[..., None, 1:2].astype(jnp.float32)
    ey = (coefs[..., 1:].astype(jnp.float32) -
          q[..., 1:].astype(jnp.float32) * ac) ** 2
    dqv2 = jnp.concatenate([dq2[..., 0:1], jnp.repeat(dq2[..., 1:2], 15,
                                                      axis=-1)], -1)
    e2 = (y2.astype(jnp.float32) -
          qy2.astype(jnp.float32) * dqv2.astype(jnp.float32)) ** 2
    dist = jnp.sum(ey, axis=(-1, -2)) + jnp.sum(e2, axis=-1)
    # per-block entropy contexts chained inside the MB (external ctx 0)
    scan = jnp.arange(16)
    eobs = jnp.max(jnp.where(q[..., ZZ] != 0, scan + 1, 0), axis=-1)
    nz = (jnp.maximum(eobs, 1) > 1).astype(jnp.int32)   # start=1 blocks
    nzg = nz.reshape(*nz.shape[:-1], 4, 4)
    above = jnp.concatenate([jnp.zeros_like(nzg[..., :1, :]),
                             nzg[..., :-1, :]], -2)
    left = jnp.concatenate([jnp.zeros_like(nzg[..., :, :1]),
                            nzg[..., :, :-1]], -1)
    ctx = (above + left).reshape(*nz.shape)
    ry, _ = block_rate(q, tcb0, 1, ctx)
    r2, _ = block_rate(qy2, tcb1, 0, jnp.zeros_like(eobs[..., 0]))
    return jnp.sum(ry, axis=-1) + r2, dist, nz


def rd_uv(resid_u, resid_v, dq_uv, qidx, tcb2):
    """Chroma rate/distortion (_quant_uv + _cost_uv dual).

    resid_u/resid_v [..., 8, 8] int32; dq_uv [..., 2]; qidx [...].
    Returns (rate [...], dist [...] float32)."""
    rate = None
    dist = None
    for resid in (resid_u, resid_v):
        s = resid.shape[:-2]
        x = resid.reshape(*s, 2, 4, 2, 4)
        x = jnp.moveaxis(x, -3, -2).reshape(*s, 4, 4, 4)
        coefs = tf.fdct4x4_batch(x).reshape(*s, 4, 16)
        q, _ = tf.regular_quant_batch(coefs, dq_uv[..., None, :],
                                      qidx[..., None], jnp.zeros((), bool))
        dqv = jnp.concatenate([dq_uv[..., None, 0:1],
                               jnp.repeat(dq_uv[..., None, 1:2], 15, -1)],
                              -1).astype(jnp.float32)
        e = (coefs.astype(jnp.float32) - q.astype(jnp.float32) * dqv) ** 2
        d = jnp.sum(e, axis=(-1, -2))
        scan = jnp.arange(16)
        eobs = jnp.max(jnp.where(q[..., ZZ] != 0, scan + 1, 0), axis=-1)
        nz = (eobs > 0).astype(jnp.int32)
        nzg = nz.reshape(*s, 2, 2)
        above = jnp.concatenate([jnp.zeros_like(nzg[..., :1, :]),
                                 nzg[..., :-1, :]], -2)
        left = jnp.concatenate([jnp.zeros_like(nzg[..., :, :1]),
                                nzg[..., :, :-1]], -1)
        ctx = (above + left).reshape(*s, 4)
        r, _ = block_rate(q, tcb2, 0, ctx)
        r = jnp.sum(r, axis=-1)
        rate = r if rate is None else rate + r
        dist = d if dist is None else dist + d
    return rate, dist


def rdc(rate, dist, rdmult, rddiv):
    """RDCOST (rdopt.h): ((128 + rate*rdmult) >> 8) + rddiv*dist, in
    float32 (decision-only — the pack layer recomputes exact rates)."""
    r = jnp.asarray(rate, jnp.float32)
    return jnp.floor((128.0 + r * rdmult) / 256.0) + rddiv * dist


INV_ZZ = tuple(int(v) for v in np.argsort(np.asarray(ZZ)))  # raster -> scan


def trellis_batch(coefs, q, dq, tcb, i0, plane_rd_mult, ctx, rdmult, rddiv):
    """optimize_b (ref: vp8/encoder/encodemb.c:224-466) as unrolled
    backward/forward scans vectorized over every block at once: Viterbi
    over the two candidate roundings (level, level-1) of each nonzero
    coefficient, costing token transitions under the frame entropy model.
    float32 rd accounting (no _rdtrunc tie-break), so razor-thin ties may
    resolve differently than the host oracle — the output is always a
    valid (and near-optimal) coding choice; the reconstruction is
    recomputed from these levels so the closed loop stays exact.

    coefs/q [..., 16] raster; dq [..., 2]; tcb [16,3,12] f32;
    i0/plane_rd_mult static; ctx [...] 0..2; rdmult/rddiv f32 scalars.
    Returns (levels [..., 16] raster, eob [...])."""
    shape = q.shape[:-1]
    qz = q[..., ZZ].astype(jnp.int32)
    cz = coefs[..., ZZ].astype(jnp.int32)
    scan = jnp.arange(16)
    eob = jnp.max(jnp.where(qz != 0, scan + 1, 0), axis=-1)
    rm = rdmult * plane_rd_mult

    def rdc_f(r, e):
        return jnp.floor((128.0 + r * rm) / 256.0) + rddiv * e

    def price(tcb_pos, ptv, tv):
        oc = jax.nn.one_hot(ptv, 3, dtype=jnp.float32)
        ot = jax.nn.one_hot(tv, 12, dtype=jnp.float32)
        return jnp.einsum('...c,...t,ct->...', oc, ot, tcb_pos)

    z = jnp.zeros(shape, jnp.float32)

    # Backward Viterbi as a lax.scan over coefficient positions (the
    # body is traced ONCE instead of 16x — the unrolled form dominated
    # _encode_device's XLA compile time).  Identical math per step.
    def bstep(carry, i):
        rate0, rate1, err0, err1, tok0, tok1, next_pos = carry
        rate = [rate0, rate1]
        err = [err0, err1]
        tok = [tok0, tok1]
        active = i < eob
        x = jnp.take(qz, i, axis=-1)
        czi = jnp.take(cz, i, axis=-1)
        drc = jnp.where(i == 0, dq[..., 0], dq[..., 1])
        drcf = drc.astype(jnp.float32)
        is_nz = active & (x != 0)
        is_z = active & (x == 0)
        tcb_n = tcb[jnp.minimum(i + 1, 15)]
        ax = jnp.abs(x)
        t0 = _token_of(ax)
        # ---- candidate 0: keep the level ----
        g0 = (next_pos < 16).astype(jnp.float32)
        pt0 = jnp.minimum(ax, 2)
        r0 = [rate[c] + g0 * price(tcb_n, pt0, tok[c]) for c in range(2)]
        best0 = (rdc_f(r0[1], err[1]) < rdc_f(r0[0], err[0])) \
            .astype(jnp.float32)
        base0 = _value_cost(ax, t0).astype(jnp.float32)
        dx = x.astype(jnp.float32) * drcf - czi.astype(jnp.float32)
        nrate0 = base0 + (1 - best0) * r0[0] + best0 * r0[1]
        nerr0 = dx * dx + (1 - best0) * err[0] + best0 * err[1]
        # ---- candidate 1: one step toward zero (when requantization
        # still brackets the true coefficient) ----
        shortcut = (ax * drc > jnp.abs(czi)) & \
                   (ax * drc < jnp.abs(czi) + drc)
        x1 = jnp.where(shortcut, x - jnp.sign(x), x)
        a1 = jnp.abs(x1)
        t1n = _token_of(a1)
        tb = [jnp.where(a1 == 0, jnp.where(tok[c] == EOB, EOB, 0), t1n)
              for c in range(2)]
        pt1 = jnp.minimum(a1, 2)
        g1 = [((next_pos < 16) & (tb[c] != EOB)).astype(jnp.float32)
              for c in range(2)]
        r1 = [rate[c] + g1[c] * price(tcb_n, pt1, tok[c])
              for c in range(2)]
        best1 = (rdc_f(r1[1], err[1]) < rdc_f(r1[0], err[0])) \
            .astype(jnp.float32)
        base1 = _value_cost(a1, t1n).astype(jnp.float32)
        sgn = jnp.sign(x).astype(jnp.float32)
        dx1 = jnp.where(shortcut, dx - sgn * drcf, dx)
        nrate1 = base1 + (1 - best1) * r1[0] + best1 * r1[1]
        nerr1 = dx1 * dx1 + (1 - best1) * err[0] + best1 * err[1]
        b1i = best1.astype(jnp.int32)
        ntok1 = jnp.where(b1i == 1, tb[1], tb[0])
        # ---- per-step chain outputs, state update (nonzero positions) --
        out = (jnp.where(is_nz, x, 0), jnp.where(is_nz, x1, 0),
               best0.astype(jnp.int32), b1i, next_pos)
        nz_f = is_nz.astype(jnp.float32)
        rate = [nz_f * nrate0 + (1 - nz_f) * rate[0],
                nz_f * nrate1 + (1 - nz_f) * rate[1]]
        err = [nz_f * nerr0 + (1 - nz_f) * err[0],
               nz_f * nerr1 + (1 - nz_f) * err[1]]
        tok = [jnp.where(is_nz, t0, tok[0]),
               jnp.where(is_nz, ntok1, tok[1])]
        next_pos = jnp.where(is_nz, i, next_pos)
        # ---- zero positions inside the eob: fold the ZERO token ----
        for c in range(2):
            pz = is_z & (tok[c] != EOB)
            rate[c] = rate[c] + pz.astype(jnp.float32) * \
                price(tcb_n, jnp.zeros_like(tok[c]), tok[c])
            tok[c] = jnp.where(pz, 0, tok[c])
        return (rate[0], rate[1], err[0], err[1], tok[0], tok[1],
                next_pos), out

    init = (z, z, z, z, jnp.full(shape, EOB, jnp.int32),
            jnp.full(shape, EOB, jnp.int32), eob.astype(jnp.int32))
    idxs = jnp.arange(15, i0 - 1, -1)
    (r0f, r1f, e0f, e1f, tk0f, tk1f, next_pos), ys = jax.lax.scan(
        bstep, init, idxs)
    rate = [r0f, r1f]
    err = [e0f, e1f]
    tok = [tk0f, tk1f]
    # stack per-step outputs (emitted for i = 15 .. i0) back into
    # position-indexed [..., 16] arrays
    def unstack(y):
        a = jnp.moveaxis(y, 0, -1)[..., ::-1]   # positions i0..15
        if i0:
            a = jnp.concatenate(
                [jnp.zeros((*shape, i0), jnp.int32), a], axis=-1)
        return a

    qc = [unstack(ys[0]), unstack(ys[1])]
    bb = [unstack(ys[2]), unstack(ys[3])]
    nxtp = unstack(ys[4])

    # base transition at i0 under the true entropy context
    tcb_b = tcb[i0]
    rf = [rate[c] + price(tcb_b, ctx, tok[c]) for c in range(2)]
    best = (rdc_f(rf[1], err[1]) < rdc_f(rf[0], err[0])).astype(jnp.int32)

    # forward walk: follow the chain, emitting the chosen candidate
    outz = jnp.zeros((*shape, 16), jnp.int32)
    if i0:
        outz = outz.at[..., :i0].set(qz[..., :i0])
    cur = next_pos
    br = best
    for i in range(i0, 16):
        hit = (cur == i) & (i < eob)
        val = jnp.where(br == 1, qc[1][..., i], qc[0][..., i])
        outz = outz.at[..., i].set(jnp.where(hit, val, outz[..., i]))
        nbr = jnp.where(br == 1, bb[1][..., i], bb[0][..., i])
        br = jnp.where(hit, nbr, br)
        cur = jnp.where(hit, nxtp[..., i], cur)

    eob_out = jnp.max(jnp.where(outz != 0, scan + 1, 0), axis=-1)
    return outz[..., INV_ZZ], eob_out
