"""On-device VP8 token decode: boolean arithmetic decoder + detokenizer
as one jitted `lax.scan` over macroblocks (SURVEY.md §7 stage 5).

The decoder state machine mirrors the 32-bit form of the reference's
bool decoder (dboolhuff.h:51-116, VP8_BD_VALUE = unsigned int, BITS=24)
and the detokenize control flow (detokenize.c:183-384) exactly; the
per-partition row round-robin (decodframe.c:1112-1129) is preserved by
carrying all partition states through the scan and selecting the row's
partition each step.  Entropy contexts (above [C,9] / left [9]) ride the
scan carry.

Control flow inside a macroblock is the branchless form: every bool read
site computes the would-be state transition and SELECTS it under the
path predicate, so one scan step decodes one MB with data-independent
shape.  The outer coefficient loop is a `lax.while_loop`, so blocks
still terminate at their true EOB.

Design note (measured, see BASELINE.md round 4): a serial arithmetic
decoder maps to the TPU scalar core; single-stream it cannot beat the
host C++ path (native/vp8_entropy.cpp) — the same conclusion the
reference's OpenCL fork reached, which also kept entropy on the CPU.
What the device path buys is (a) the coefficient upload disappears
(~0.8 MB/frame at 1080p becomes the ~100 KB token partitions) and
(b) batched transcode can vmap many independent streams' scans.  The
production decoder keeps the host path; this module is the validated
device alternative, MD5-gated by tests/test_entropy_device.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import tables as T

BITS = 24
LOTS_OF_BITS = 0x4000

ZIGZAG = np.asarray(T.ZIGZAG, np.int32)
COEF_BANDS = np.asarray(T.COEF_BANDS, np.int32)
BLOCK2ABOVE = np.asarray(
    [0, 1, 2, 3, 0, 1, 2, 3, 0, 1, 2, 3, 0, 1, 2, 3,
     4, 5, 4, 5, 6, 7, 6, 7, 8], np.int32)
BLOCK2LEFT = np.asarray(
    [0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
     4, 4, 5, 5, 6, 6, 7, 7, 8], np.int32)
CAT_MIN = np.asarray([5, 7, 11, 19, 35, 67], np.int32)
_CATP = [np.asarray(T.PCAT1), np.asarray(T.PCAT2), np.asarray(T.PCAT3),
         np.asarray(T.PCAT4), np.asarray(T.PCAT5), np.asarray(T.PCAT6)]
CAT_LEN = np.asarray([len(p) for p in _CATP], np.int32)   # 1,2,3,4,5,11
CAT_PROBS_PAD = np.zeros((6, 11), np.int32)
for _i, _p in enumerate(_CATP):
    CAT_PROBS_PAD[_i, :len(_p)] = _p

# vp8_norm: left-shift that renormalizes range into [128, 255]
_NORM = np.zeros(256, np.int32)
for _i in range(1, 256):
    _v, _s = _i, 0
    while _v < 128:
        _v <<= 1
        _s += 1
    _NORM[_i] = _s

# block order / type / start tables (detokenize.c:183-243)
ORDER_Y2 = np.asarray([24] + list(range(24)), np.int32)
ORDER_NOY2 = np.asarray(list(range(25)), np.int32)     # 24 = inactive pad
BTYPE_Y2 = np.asarray([1] + [0] * 16 + [2] * 8, np.int32)
BTYPE_NOY2 = np.asarray([3] * 16 + [2] * 8 + [0], np.int32)
START_Y2 = np.asarray([0] + [1] * 16 + [0] * 8, np.int32)


def _sel(pred, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y), a, b)


def _fill(buf, blen, st):
    """VP8DX_BOOL_DECODER_FILL (dboolhuff.h:51-73), BITS=24 unrolled."""
    value, rng, count, pos = st
    shift = BITS - 8 - (count + 8)
    bits_left = (blen - pos) * 8
    x = shift + 8 - bits_left
    finished = x >= 0
    count = jnp.where(finished, count + LOTS_OF_BITS, count)
    loop_end = jnp.where(finished, x, 0)
    dead = finished & (bits_left <= 0)
    for _ in range(3):                       # shift starts <= 16
        take = (~dead) & (shift >= loop_end)
        b = buf[jnp.clip(pos, 0, buf.shape[0] - 1)].astype(jnp.uint32)
        b = jnp.where(pos < blen, b, 0)
        value = jnp.where(
            take, value | (b << jnp.maximum(shift, 0).astype(jnp.uint32)),
            value)
        count = jnp.where(take, count + 8, count)
        pos = jnp.where(take, pos + 1, pos)
        shift = jnp.where(take, shift - 8, shift)
    return (value, rng, count, pos)


def _read(norm, buf, blen, prob, st):
    """vp8dx_decode_bool (dboolhuff.h:76-114). Returns (bit, st')."""
    value, rng, count, pos = st
    split = 1 + (((rng - 1) * prob) >> 8)
    st2 = _fill(buf, blen, st)
    value, rng, count, pos = _sel(count < 0, st2, st)
    bigsplit = (split.astype(jnp.uint32) << jnp.uint32(BITS - 8))
    bit = (value >= bigsplit).astype(jnp.int32)
    rng = jnp.where(bit == 1, rng - split, split)
    value = jnp.where(bit == 1, value - bigsplit, value)
    sh = norm[rng]
    value = value << sh.astype(jnp.uint32)
    rng = rng << sh
    count = count - sh
    return bit, (value, rng, count, pos)


def _read_if(pred, norm, buf, blen, prob, st):
    """Consume a bool only on `pred` lanes of the control flow."""
    bit, st2 = _read(norm, buf, blen, prob, st)
    return jnp.where(pred, bit, 0), _sel(pred, st2, st)


def _read_sign(norm, buf, blen, st):
    """Detokenizer sign read (DECODE_AND_APPLYSIGN): split=(range+1)>>1
    with one unconditional doubling; range may transiently reach 256."""
    value, rng, count, pos = st
    split = (rng + 1) >> 1
    st2 = _fill(buf, blen, st)
    value, rng, count, pos = _sel(count < 0, st2, st)
    bigsplit = (split.astype(jnp.uint32) << jnp.uint32(BITS - 8))
    neg = (value >= bigsplit).astype(jnp.int32)
    rng = jnp.where(neg == 1, rng - split, split)
    value = jnp.where(neg == 1, value - bigsplit, value)
    rng = rng + rng
    value = value + value
    count = count - 1
    return neg, (value, rng, count, pos)


def _read_sign_if(pred, norm, buf, blen, st):
    neg, st2 = _read_sign(norm, buf, blen, st)
    return jnp.where(pred, neg, 0), _sel(pred, st2, st)


def _decode_block(norm, buf, blen, probs_b, start, ctx0, st):
    """One 4x4 block's token loop (detokenize.c:245-330).

    probs_b [8, 3, 11]; returns (qrow [16] raster, eob, nz, ctx_out, st).
    """
    zz = jnp.asarray(ZIGZAG)
    bands = jnp.asarray(COEF_BANDS)
    catp = jnp.asarray(CAT_PROBS_PAD)
    catl = jnp.asarray(CAT_LEN)
    catm = jnp.asarray(CAT_MIN)

    def cond(carry):
        c, ctx, check_eob, q, nz, st, stop = carry
        return (c < 16) & ~stop

    def body(carry):
        c, ctx, check_eob, q, nz, st, stop = carry
        p = probs_b[bands[c], ctx]                        # [11]
        # EOB?
        bit0, st = _read_if(check_eob, norm, buf, blen, p[0], st)
        eob_hit = check_eob & (bit0 == 0)
        alive = ~eob_hit
        # ZERO token
        bit1, st = _read_if(alive, norm, buf, blen, p[1], st)
        zero = alive & (bit1 == 0)
        zero_end = zero & (c == 15)       # malformed-input guard
        stepped = zero & (c < 15)
        coded = alive & ~zero
        # ONE vs larger
        bit2, st = _read_if(coded, norm, buf, blen, p[2], st)
        one = coded & (bit2 == 0)
        big = coded & (bit2 == 1)
        # LOW_VAL 2/3/4
        bit3, st = _read_if(big, norm, buf, blen, p[3], st)
        low = big & (bit3 == 0)
        bit4, st = _read_if(low, norm, buf, blen, p[4], st)
        v2 = low & (bit4 == 0)
        bit5, st = _read_if(low & (bit4 == 1), norm, buf, blen, p[5], st)
        v3 = low & (bit4 == 1) & (bit5 == 0)
        v4 = low & (bit4 == 1) & (bit5 == 1)
        # categories
        hi = big & (bit3 == 1)
        bit6, st = _read_if(hi, norm, buf, blen, p[6], st)
        g12 = hi & (bit6 == 0)
        bit7, st = _read_if(g12, norm, buf, blen, p[7], st)
        g34 = hi & (bit6 == 1)
        bit8, st = _read_if(g34, norm, buf, blen, p[8], st)
        g34a = g34 & (bit8 == 0)
        bit9, st = _read_if(g34a, norm, buf, blen, p[9], st)
        g56 = g34 & (bit8 == 1)
        bit10, st = _read_if(g56, norm, buf, blen, p[10], st)
        cat = jnp.where(g12 & (bit7 == 0), 0,
                        jnp.where(g12 & (bit7 == 1), 1,
                                  jnp.where(g34a & (bit9 == 0), 2,
                                            jnp.where(g34a & (bit9 == 1), 3,
                                                      jnp.where(
                                                          g56 & (bit10 == 0),
                                                          4, 5)))))
        in_cat = g12 | g34a | g56
        # extra bits (fill_value_tokens fixed probs)
        extra = jnp.int32(0)
        ln = catl[cat]
        for j in range(11):
            want = in_cat & (j < ln)
            bj, st = _read_if(want, norm, buf, blen, catp[cat, j], st)
            extra = jnp.where(want, (extra << 1) | bj, extra)
        val = jnp.where(one, 1,
                        jnp.where(v2, 2,
                                  jnp.where(v3, 3,
                                            jnp.where(v4, 4,
                                                      catm[cat] + extra))))
        neg, st = _read_sign_if(coded, norm, buf, blen, st)
        val = jnp.where(neg == 1, -val, val)
        q = jnp.where(coded, q.at[zz[c]].set(val), q)
        nz = nz | coded
        ctx = jnp.where(zero, 0,
                        jnp.where(one, 1, jnp.where(coded, 2, ctx)))
        check_eob = jnp.where(stepped, False, True)
        stop = eob_hit | zero_end | (coded & (c == 15))
        c = jnp.where(stepped | coded, c + 1, c)
        # on a coded 16th coefficient the reference exits with c == 15
        c = jnp.where(coded & (c == 16), 15, c)
        return (c, ctx, check_eob, q, nz, st, stop)

    c0 = start
    init = (c0, ctx0, jnp.bool_(True), jnp.zeros(16, jnp.int32),
            jnp.bool_(False), st, jnp.bool_(False))
    c, _ctx, _ce, q, nz, st, _stop = jax.lax.while_loop(cond, body, init)
    return q, c, nz.astype(jnp.int32), st


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def detokenize_frame_device(R, C, P, bufs, blens, states0, coef_probs,
                            has_y2, skip_in):
    """Whole-frame device token decode.

    bufs [P, L] u8 (padded partition buffers), blens [P], states0 [P, 4]
    i32 (value/range/count/pos — host hands over the post-header bool
    states; value must fit the 24-bit window), coef_probs [4,8,3,11] i32,
    has_y2 [R*C] bool, skip_in [R*C] i32 (mb_no_coeff_skip flags).

    Returns (qcoeff [R*C, 25, 16] i32, eobs [R*C, 25] i32,
    skip_out [R*C] i32, states [P, 4])."""
    N = R * C
    norm = jnp.asarray(_NORM)
    oy2 = jnp.asarray(ORDER_Y2)
    ono = jnp.asarray(ORDER_NOY2)
    bty = jnp.asarray(BTYPE_Y2)
    btn = jnp.asarray(BTYPE_NOY2)
    sty = jnp.asarray(START_Y2)
    b2a = jnp.asarray(BLOCK2ABOVE)
    b2l = jnp.asarray(BLOCK2LEFT)

    def mb_step(carry, n):
        sval, srng, scnt, spos, above, left = carry
        r = n // C
        c = n % C
        part = r % P
        left = jnp.where(c == 0, jnp.zeros(9, jnp.int32), left)
        st = (sval[part].astype(jnp.uint32), srng[part], scnt[part],
              spos[part])
        buf = bufs[part]
        blen = blens[part]
        hy2 = has_y2[n]
        mbskip = skip_in[n] != 0

        def do_skip(args):
            st, above, left = args
            # vp8_reset_mb_tokens_context (detokenize.c:70-84)
            amask = jnp.arange(9) < jnp.where(hy2, 9, 8)
            above = above.at[c].set(
                jnp.where(amask, 0, above[c]))
            left = jnp.where(amask, 0, left)
            q = jnp.zeros((25, 16), jnp.int32)
            e = jnp.zeros(25, jnp.int32)
            return st, above, left, q, e, jnp.int32(1)

        def do_decode(args):
            st, above, left = args
            eobtotal = jnp.where(hy2, -16, 0)

            def blk(k, s):
                st, above, left, q, e, eobtotal = s
                i = jnp.where(hy2, oy2[k], ono[k])
                active = hy2 | (k < 24)
                btype = jnp.where(hy2, bty[k], btn[k])
                start = jnp.where(hy2, sty[k], 0)
                ia = b2a[i]
                il = b2l[i]
                ctx = above[c, ia] + left[il]
                qrow, eob, nz, st2 = _decode_block(
                    norm, buf, blen, coef_probs[btype], start, ctx, st)
                st = _sel(active, st2, st)
                q = jnp.where(active, q.at[i].set(qrow), q)
                e = jnp.where(active, e.at[i].set(eob), e)
                above = jnp.where(active, above.at[c, ia].set(nz), above)
                left = jnp.where(active, left.at[il].set(nz), left)
                eobtotal = jnp.where(active, eobtotal + eob, eobtotal)
                return (st, above, left, q, e, eobtotal)

            st, above, left, q, e, eobtotal = jax.lax.fori_loop(
                0, 25, blk,
                (st, above, left, jnp.zeros((25, 16), jnp.int32),
                 jnp.zeros(25, jnp.int32), eobtotal))
            return st, above, left, q, e, \
                (eobtotal == 0).astype(jnp.int32)

        st, above, left, q, e, skipped = jax.lax.cond(
            mbskip, do_skip, do_decode, (st, above, left))
        sval = sval.at[part].set(st[0].astype(jnp.int32))
        srng = srng.at[part].set(st[1])
        scnt = scnt.at[part].set(st[2])
        spos = spos.at[part].set(st[3])
        return (sval, srng, scnt, spos, above, left), (q, e, skipped)

    init = (states0[:, 0], states0[:, 1], states0[:, 2], states0[:, 3],
            jnp.zeros((C, 9), jnp.int32), jnp.zeros(9, jnp.int32))
    carry, (q, e, skipped) = jax.lax.scan(mb_step, init, jnp.arange(N))
    states = jnp.stack(carry[:4], axis=1)
    return q, e, skipped, states
