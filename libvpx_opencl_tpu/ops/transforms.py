"""Batched integer transforms for the TPU decode path.

Bit-exact vectorized versions of the reference's scalar transform kernels
(vp8/common/idctllm.c, dequantize.c, idct_blk.c), formulated as whole-frame
array ops so XLA can tile them across the VPU: every 4x4 block in the frame
is transformed in one fused pass (TPU plan of SURVEY.md §2.1 "GPU
dequant+IDCT" — one kernel for all MBs, no inter-block dependencies).

All math is int32 with explicit int16 wrapping where the C code stores to
`short` (idctllm.c output[] / dqcoeff), which is required for bit-exactness
on pathological high-magnitude coefficients.
"""
import jax.numpy as jnp

COSPI8SQRT2MINUS1 = 20091
SINPI8SQRT2 = 35468


def _s16(v):
    """Wrap int32 to int16 range (C short store)."""
    return ((v & 0xFFFF) ^ 0x8000) - 0x8000


def idct4x4_batch(blocks):
    """vp8_short_idct4x4llm_c (idctllm.c:28-119) over [..., 4, 4] int32
    dequantized coefficients; returns [..., 4, 4] int32 residual."""
    x = blocks
    # vertical pass (C first loop: columns, stride-4 reads)
    a1 = x[..., 0, :] + x[..., 2, :]
    b1 = x[..., 0, :] - x[..., 2, :]
    t1 = (x[..., 1, :] * SINPI8SQRT2) >> 16
    t2 = x[..., 3, :] + ((x[..., 3, :] * COSPI8SQRT2MINUS1) >> 16)
    c1 = t1 - t2
    t1 = x[..., 1, :] + ((x[..., 1, :] * COSPI8SQRT2MINUS1) >> 16)
    t2 = (x[..., 3, :] * SINPI8SQRT2) >> 16
    d1 = t1 + t2
    tmp = jnp.stack([_s16(a1 + d1), _s16(b1 + c1),
                     _s16(b1 - c1), _s16(a1 - d1)], axis=-2)
    # horizontal pass (C second loop: rows)
    a1 = tmp[..., 0] + tmp[..., 2]
    b1 = tmp[..., 0] - tmp[..., 2]
    t1 = (tmp[..., 1] * SINPI8SQRT2) >> 16
    t2 = tmp[..., 3] + ((tmp[..., 3] * COSPI8SQRT2MINUS1) >> 16)
    c1 = t1 - t2
    t1 = tmp[..., 1] + ((tmp[..., 1] * COSPI8SQRT2MINUS1) >> 16)
    t2 = (tmp[..., 3] * SINPI8SQRT2) >> 16
    d1 = t1 + t2
    out = jnp.stack([_s16((a1 + d1 + 4) >> 3), _s16((b1 + c1 + 4) >> 3),
                     _s16((b1 - c1 + 4) >> 3), _s16((a1 - d1 + 4) >> 3)],
                    axis=-1)
    return out


def inv_walsh_batch(blocks):
    """vp8_short_inv_walsh4x4_c (idctllm.c:140-192) over [..., 4, 4] int32;
    returns [..., 16] DC values in block raster order."""
    x = blocks
    a1 = x[..., 0, :] + x[..., 3, :]
    b1 = x[..., 1, :] + x[..., 2, :]
    c1 = x[..., 1, :] - x[..., 2, :]
    d1 = x[..., 0, :] - x[..., 3, :]
    tmp = jnp.stack([_s16(a1 + b1), _s16(c1 + d1),
                     _s16(a1 - b1), _s16(d1 - c1)], axis=-2)
    a1 = tmp[..., 0] + tmp[..., 3]
    b1 = tmp[..., 1] + tmp[..., 2]
    c1 = tmp[..., 1] - tmp[..., 2]
    d1 = tmp[..., 0] - tmp[..., 3]
    out = jnp.stack([_s16((a1 + b1 + 3) >> 3), _s16((c1 + d1 + 3) >> 3),
                     _s16((a1 - b1 + 3) >> 3), _s16((d1 - c1 + 3) >> 3)],
                    axis=-1)
    return out.reshape(*out.shape[:-2], 16)


def compute_residuals(qcoeff, y2_big, dq_y1, dq_y2, dq_uv, has_y2):
    """Whole-frame dequant + WHT + IDCT.

    qcoeff: [N, 25, 16] int (zig-zag-undone raster coefficient order)
    y2_big: [N] bool — eobs[24] > 1 (selects full WHT vs dc-only variant)
    dq_*:   [N, 2] int (dc, ac) per-MB dequant factors
    has_y2: [N] bool
    Returns (resid_y [N,16,4,4], resid_u [N,4,4,4], resid_v [N,4,4,4]) int32.

    Mirrors decode_macroblock's residual path (decodframe.c:247-305):
    Y2 inverse WHT feeds Y-block DCs with the dc-dequant override
    (dequant_y1_dc[0]=1, decodframe.c:92), full IDCT everywhere (a dc-only
    block's full IDCT equals the reference's vp8_dc_only_idct_add fast path).
    """
    n = qcoeff.shape[0]
    qcoeff = qcoeff.astype(jnp.int32)
    dq_y1 = dq_y1.astype(jnp.int32)
    dq_y2 = dq_y2.astype(jnp.int32)
    dq_uv = dq_uv.astype(jnp.int32)
    # --- Y2 (block 24) ---
    dqv_y2 = jnp.concatenate([dq_y2[:, :1], jnp.repeat(dq_y2[:, 1:], 15, 1)],
                             axis=1)
    y2 = _s16(qcoeff[:, 24, :] * dqv_y2)
    wht_full = inv_walsh_batch(y2.reshape(n, 4, 4))
    # eob<=1 fast path (vp8_short_inv_walsh4x4_1_c): dc replicated
    dc1 = _s16((_s16(qcoeff[:, 24, 0] * dq_y2[:, 0]) + 3) >> 3)
    wht = jnp.where(y2_big[:, None], wht_full, dc1[:, None])
    # --- Y blocks ---
    dqv_y1 = jnp.concatenate([dq_y1[:, :1], jnp.repeat(dq_y1[:, 1:], 15, 1)],
                             axis=1)
    yq = qcoeff[:, :16, :]
    dq_y = _s16(yq * dqv_y1[:, None, :])
    # has_y2: dc comes from WHT output directly (dequant factor 1)
    dc_from_wht = jnp.where(has_y2[:, None], wht, dq_y[:, :, 0])
    dq_y = dq_y.at[:, :, 0].set(dc_from_wht)
    resid_y = idct4x4_batch(dq_y.reshape(n, 16, 4, 4))
    # --- UV blocks ---
    dqv_uv = jnp.concatenate([dq_uv[:, :1], jnp.repeat(dq_uv[:, 1:], 15, 1)],
                             axis=1)
    uvq = _s16(qcoeff[:, 16:24, :] * dqv_uv[:, None, :])
    resid_uv = idct4x4_batch(uvq.reshape(n, 8, 4, 4))
    return resid_y, resid_uv[:, :4], resid_uv[:, 4:]


def idct4x4_lanes(x):
    """idct4x4_batch with the block index in the LAST (lane) axis.

    x: [..., 4, 4, N] int32. TPU layout note: the batched form keeps the
    4-wide block dims minor, which tiles at 1/256 VPU utilisation; this
    form keeps N (thousands of blocks) in the 128-lane axis."""
    a1 = x[..., 0, :, :] + x[..., 2, :, :]
    b1 = x[..., 0, :, :] - x[..., 2, :, :]
    t1 = (x[..., 1, :, :] * SINPI8SQRT2) >> 16
    t2 = x[..., 3, :, :] + ((x[..., 3, :, :] * COSPI8SQRT2MINUS1) >> 16)
    c1 = t1 - t2
    t1 = x[..., 1, :, :] + ((x[..., 1, :, :] * COSPI8SQRT2MINUS1) >> 16)
    t2 = (x[..., 3, :, :] * SINPI8SQRT2) >> 16
    d1 = t1 + t2
    tmp = jnp.stack([_s16(a1 + d1), _s16(b1 + c1),
                     _s16(b1 - c1), _s16(a1 - d1)], axis=-3)
    a1 = tmp[..., 0, :] + tmp[..., 2, :]
    b1 = tmp[..., 0, :] - tmp[..., 2, :]
    t1 = (tmp[..., 1, :] * SINPI8SQRT2) >> 16
    t2 = tmp[..., 3, :] + ((tmp[..., 3, :] * COSPI8SQRT2MINUS1) >> 16)
    c1 = t1 - t2
    t1 = tmp[..., 1, :] + ((tmp[..., 1, :] * COSPI8SQRT2MINUS1) >> 16)
    t2 = (tmp[..., 3, :] * SINPI8SQRT2) >> 16
    d1 = t1 + t2
    return jnp.stack([_s16((a1 + d1 + 4) >> 3), _s16((b1 + c1 + 4) >> 3),
                      _s16((b1 - c1 + 4) >> 3), _s16((a1 - d1 + 4) >> 3)],
                     axis=-2)


def inv_walsh_lanes(x):
    """inv_walsh_batch with lanes last: x [4, 4, N] -> [16, N] DCs."""
    a1 = x[0] + x[3]
    b1 = x[1] + x[2]
    c1 = x[1] - x[2]
    d1 = x[0] - x[3]
    tmp = jnp.stack([_s16(a1 + b1), _s16(c1 + d1),
                     _s16(a1 - b1), _s16(d1 - c1)], axis=0)  # [4(col),4,N]
    a1 = tmp[:, 0] + tmp[:, 3]
    b1 = tmp[:, 1] + tmp[:, 2]
    c1 = tmp[:, 1] - tmp[:, 2]
    d1 = tmp[:, 0] - tmp[:, 3]
    out = jnp.stack([_s16((a1 + b1 + 3) >> 3), _s16((c1 + d1 + 3) >> 3),
                     _s16((a1 - b1 + 3) >> 3), _s16((d1 - c1 + 3) >> 3)],
                    axis=1)  # [4(row? col), 4, N] -> raster [16, N]
    return out.reshape(16, -1)


def compute_residual_blocks(qcoeff, y2_big, dq_y1, dq_y2, dq_uv, has_y2):
    """compute_residuals reformulated lane-major for the VPU.

    Same contract as compute_residuals (qcoeff [N,25,16], dq_* [N,2]) but
    all 4-point butterflies run with the MB index in the 128-lane axis
    and the result is returned as MB images (y [N,16,16], u/v [N,8,8]
    int32).  Bit-exact vs compute_residuals
    (tests/test_transforms.py::test_residual_blocks_lane_major).
    """
    n = qcoeff.shape[0]
    qt = qcoeff.astype(jnp.int32).transpose(1, 2, 0)      # [25, 16, N]
    dq_y1 = dq_y1.astype(jnp.int32).T                      # [2, N]
    dq_y2 = dq_y2.astype(jnp.int32).T
    dq_uv = dq_uv.astype(jnp.int32).T
    # --- Y2 ---
    ac = jnp.asarray([0] + [1] * 15, jnp.int32)[:, None]   # [16,1]
    dqv_y2 = jnp.where(ac != 0, dq_y2[1][None], dq_y2[0][None])
    y2 = _s16(qt[24] * dqv_y2)                             # [16, N]
    wht_full = inv_walsh_lanes(y2.reshape(4, 4, n))
    dc1 = _s16((_s16(qt[24, 0] * dq_y2[0]) + 3) >> 3)
    wht = jnp.where(y2_big[None, :], wht_full, dc1[None, :])  # [16, N]
    # --- Y ---
    dqv_y1 = jnp.where(ac != 0, dq_y1[1][None], dq_y1[0][None])
    dq_y = _s16(qt[:16] * dqv_y1[None])                    # [16, 16, N]
    dc = jnp.where(has_y2[None, :], wht, dq_y[:, 0])
    dq_y = jnp.concatenate([dc[:, None], dq_y[:, 1:]], axis=1)
    ry = idct4x4_lanes(dq_y.reshape(16, 4, 4, n))          # [16, 4, 4, N]
    # --- UV ---
    dqv_uv = jnp.where(ac != 0, dq_uv[1][None], dq_uv[0][None])
    uvq = _s16(qt[16:24] * dqv_uv[None])
    ruv = idct4x4_lanes(uvq.reshape(8, 4, 4, n))           # [8, 4, 4, N]

    # lane-major blocks -> MB images. [blk, 4, 4, N] with blk = by*g+bx.
    def to_mb(x, g):
        b = x.reshape(g, g, 4, 4, n)           # by, bx, py, px, n
        return b.transpose(4, 0, 2, 1, 3).reshape(n, g * 4, g * 4)

    return to_mb(ry, 4), to_mb(ruv[:4], 2), to_mb(ruv[4:], 2)


def fdct4x4_batch(blocks):
    """vp8_short_fdct4x4_c (dct.c:14-56) over [..., 4, 4] int32 residuals;
    returns [..., 4, 4] coefficients. Row pass then column pass."""
    x = blocks
    a1 = (x[..., :, 0] + x[..., :, 3]) << 3
    b1 = (x[..., :, 1] + x[..., :, 2]) << 3
    c1 = (x[..., :, 1] - x[..., :, 2]) << 3
    d1 = (x[..., :, 0] - x[..., :, 3]) << 3
    t0 = a1 + b1
    t2 = a1 - b1
    t1 = (c1 * 2217 + d1 * 5352 + 14500) >> 12
    t3 = (d1 * 2217 - c1 * 5352 + 7500) >> 12
    tmp = jnp.stack([t0, t1, t2, t3], axis=-1)
    a1 = tmp[..., 0, :] + tmp[..., 3, :]
    b1 = tmp[..., 1, :] + tmp[..., 2, :]
    c1 = tmp[..., 1, :] - tmp[..., 2, :]
    d1 = tmp[..., 0, :] - tmp[..., 3, :]
    o0 = (a1 + b1 + 7) >> 4
    o2 = (a1 - b1 + 7) >> 4
    o1 = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (d1 != 0)
    o3 = (d1 * 2217 - c1 * 5352 + 51000) >> 16
    return jnp.stack([o0, o1, o2, o3], axis=-2)


def walsh4x4_batch(dcs):
    """vp8_short_walsh4x4_c (dct.c:64-116) over [..., 16] Y-block DCs
    (raster); returns [..., 16] Y2 coefficients."""
    x = dcs.reshape(*dcs.shape[:-1], 4, 4)
    a1 = (x[..., :, 0] + x[..., :, 2]) << 2
    d1 = (x[..., :, 1] + x[..., :, 3]) << 2
    c1 = (x[..., :, 1] - x[..., :, 3]) << 2
    b1 = (x[..., :, 0] - x[..., :, 2]) << 2
    tmp = jnp.stack([a1 + d1 + (a1 != 0), b1 + c1, b1 - c1, a1 - d1],
                    axis=-1)
    a1 = tmp[..., 0, :] + tmp[..., 2, :]
    d1 = tmp[..., 1, :] + tmp[..., 3, :]
    c1 = tmp[..., 1, :] - tmp[..., 3, :]
    b1 = tmp[..., 0, :] - tmp[..., 2, :]
    a2 = a1 + d1
    b2 = b1 + c1
    c2 = b1 - c1
    d2 = a1 - d1
    out = jnp.stack([(a2 + (a2 < 0) + 3) >> 3, (b2 + (b2 < 0) + 3) >> 3,
                     (c2 + (c2 < 0) + 3) >> 3, (d2 + (d2 < 0) + 3) >> 3],
                    axis=-2)
    return out.reshape(*dcs.shape[:-1], 16)


def fast_quant_batch(coeffs, dq, first0):
    """vp8_fast_quantize_b_c (quantize.c:70-100) over [..., 16] raster
    coefficients. dq [..., 2] (dc, ac); first0 [...] bool (True = quantize
    from zig-zag position 1, the Y-with-Y2 case). Returns (levels[...,16],
    eob[...]) with levels clamped to the cat6 token range."""
    import numpy as _np
    from . import tables as _T
    zz = _np.asarray(_T.ZIGZAG)
    q16 = (1 << 16) // dq
    rnd = (48 * dq) >> 7
    pos_is_ac = jnp.asarray((_np.arange(16) != 0).astype(_np.int32))
    qv = jnp.where(pos_is_ac, q16[..., 1:2], q16[..., 0:1])
    rv = jnp.where(pos_is_ac, rnd[..., 1:2], rnd[..., 0:1])
    sign = coeffs < 0
    x = jnp.abs(coeffs)
    y = ((x + rv) * qv) >> 16
    y = jnp.minimum(y, 2047)
    # suppress the DC position when first0
    y = y.at[..., 0].set(jnp.where(first0, 0, y[..., 0]))
    levels = jnp.where(sign, -y, y)
    # eob: 1 + max zig-zag scan index with nonzero level
    zz_levels = levels[..., zz]  # [..., 16] in scan order
    idx = jnp.arange(1, 17)
    eob = jnp.max(jnp.where(zz_levels != 0, idx, 0), axis=-1)
    return levels, eob


def regular_quant_batch(coeffs, dq, qidx, first0):
    """vp8_regular_quantize_b_c (quantize.c:106-156) over [..., 16] raster
    coefficients: zbin dead zone with zero-run boost and the
    improved-quant reciprocal (vp8cx_init_quantizer, quantize.c:411-440).
    The zero-run carry is sequential along the zig-zag scan, so the scan
    is a 16-step unrolled loop vectorized over every block at once.

    dq [..., 2] (dc, ac); qidx [...] frame/segment Q (zbin factor 84
    below Q48 else 80); first0 [...] bool (Y-with-Y2: skip position 0).
    Returns (levels [..., 16] raster, eob [...])."""
    import numpy as _np
    from . import tables as _T
    zz = [int(v) for v in _np.asarray(_T.ZIGZAG)]
    boost_tab = jnp.asarray(
        [0, 0, 8, 10, 12, 14, 16, 20, 24, 28, 32, 36, 40, 44, 44, 44],
        jnp.int32)
    zf = jnp.where(qidx < 48, 84, 80)
    zbin = ((zf[..., None] * dq) + 64) >> 7                # [..., 2]
    rnd = (48 * dq) >> 7                                   # [..., 2]
    # improved reciprocal: shift = floor(log2(dq)), quant in (-2^16, 2^16)
    shift = jnp.zeros_like(dq)
    for k in range(1, 10):
        shift = shift + (dq >= (1 << k)).astype(dq.dtype)
    quant = 1 + jnp.left_shift(jnp.int32(1 << 16), shift) // dq - (1 << 16)

    levels = jnp.zeros_like(coeffs)
    eob = jnp.zeros(coeffs.shape[:-1], jnp.int32)
    zrun = jnp.zeros(coeffs.shape[:-1], jnp.int32)
    for i in range(16):
        rc = zz[i]
        k = 0 if rc == 0 else 1
        z = coeffs[..., rc]
        boost = (dq[..., 1] * jnp.take(boost_tab,
                                       jnp.minimum(zrun, 15))) >> 7
        x = jnp.abs(z)
        hit = x >= zbin[..., k] + boost
        xq = x + rnd[..., k]
        y = jnp.right_shift(((xq * quant[..., k]) >> 16) + xq,
                            shift[..., k])
        y = jnp.minimum(y, 2047)
        y = jnp.where(hit, y, 0)
        if i == 0:
            y = jnp.where(first0, 0, y)
        nz = y > 0
        levels = levels.at[..., rc].set(jnp.where(z < 0, -y, y))
        eob = jnp.where(nz, i + 1, eob)
        zrun = jnp.where(nz, 0, zrun + 1)
    return levels, eob


def mbs_to_plane(blocks, R, C, bw):
    """[R*C, bw, bw] per-MB blocks -> [R*bw, C*bw] plane."""
    return blocks.reshape(R, C, bw, bw).transpose(0, 2, 1, 3) \
        .reshape(R * bw, C * bw)


def blocks_to_plane(blocks, R, C, bw):
    """Scatter per-MB 4x4 blocks into a plane image.

    blocks: [R*C, nb, 4, 4] where nb = (bw/4)^2 blocks in raster order.
    Returns [R*bw, C*bw]."""
    g = bw // 4
    x = blocks.reshape(R, C, g, g, 4, 4)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # R, g, 4, C, g, 4
    return x.reshape(R * bw, C * bw)
