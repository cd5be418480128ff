"""Device (JAX) twins of the encoder's analysis kernels: whole-frame
full-pel match, ARNR temporal-filter accumulate, block variance, SSIM.

These are the TPU replacements for the reference's per-ISA SIMD encoder
backends that were still host NumPy after round 4 (SURVEY.md §2.2
"Native SIMD backends" residue): vp8_variance16x16 (vp8/encoder/variance_c.c),
vp8_ssim_parms_8x8 (vp8/encoder/ssim.c:14), vp8_temporal_filter_apply
(vp8/encoder/temporal_filter.c:88-135), and the pass-1/ARNR motion match
(vp8/encoder/firstpass.c:481, temporal_filter.c:139).

Each function is differential-tested bit/float-exact against its host
twin (models/me_host.py, models/arnr.py, ops/metrics.py) in
tests/test_analysis_device.py, so callers can switch backends freely.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(2, 3))
def fullpel_match_device(cur16, ref16, mc_range, step=2):
    """Device twin of models/me_host.fullpel_match: step-`step` offset
    grid + per-MB +-1 refine, whole-plane abs-diff + non-overlapping
    16x16 block sums.  Identical offsets and strict-less tie-breaking.

    cur16/ref16 [H, W] (multiple-of-16) any int dtype.
    Returns (dy, dx, sse, zsse) int32 [R, C]."""
    H, W = cur16.shape
    R, C = H // 16, W // 16
    K = 2 * mc_range + 1
    cur = cur16.astype(jnp.int32)
    pi = jnp.pad(ref16, mc_range, mode="edge").astype(jnp.int32)

    def block_sum(d):
        return d.reshape(R, 16, C, 16).sum((1, 3))

    grid = list(range(-mc_range, mc_range + 1, step))
    if 0 not in grid:
        grid.append(0)
        grid.sort()
    best = None
    bi = bj = None
    for dy in grid:
        for dx in grid:
            sad = block_sum(jnp.abs(
                jax.lax.dynamic_slice(pi, (dy + mc_range, dx + mc_range),
                                      (H, W)) - cur))
            if best is None:
                best = sad
                bi = jnp.full((R, C), dy + mc_range, jnp.int32)
                bj = jnp.full((R, C), dx + mc_range, jnp.int32)
            else:
                better = sad < best
                best = jnp.where(better, sad, best)
                bi = jnp.where(better, dy + mc_range, bi)
                bj = jnp.where(better, dx + mc_range, bj)

    # +-1 refine: per-MB offsets differ, gather 16x16 windows
    base = cur.reshape(R, 16, C, 16).transpose(0, 2, 1, 3)  # [R,C,16,16]

    def gather(ci, cj):
        def one(i, j):
            return jax.lax.dynamic_slice(pi, (i, j), (16, 16))
        rr = (jnp.arange(R)[:, None] * 16 + ci).reshape(-1)
        cc = (jnp.arange(C)[None, :] * 16 + cj).reshape(-1)
        return jax.vmap(one)(rr, cc).reshape(R, C, 16, 16)

    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            ci = jnp.clip(bi + di, 0, K - 1)
            cj = jnp.clip(bj + dj, 0, K - 1)
            cand = gather(ci, cj)
            sad = jnp.abs(cand - base).sum((2, 3))
            better = sad < best
            best = jnp.where(better, sad, best)
            bi = jnp.where(better, ci, bi)
            bj = jnp.where(better, cj, bj)

    pred = gather(bi, bj)
    sse = ((base - pred) ** 2).sum((2, 3))
    zpred = gather(jnp.full((R, C), mc_range, jnp.int32),
                   jnp.full((R, C), mc_range, jnp.int32))
    zsse = ((base - zpred) ** 2).sum((2, 3))
    return bi - mc_range, bj - mc_range, sse, zsse


@jax.jit
def temporal_filter_apply_device(base, pred, strength, weight, accum,
                                 count):
    """vp8_temporal_filter_apply_c (temporal_filter.c:88-135) on device:
    per-pixel weights 16 - min((3*d^2 + 2^(s-1)) >> s, 16), scaled by the
    per-pixel match weight, accumulated into (accum, count)."""
    d = pred.astype(jnp.int32) - base.astype(jnp.int32)
    mod = (d * d * 3 + (1 << (strength - 1))) >> strength
    mod = (16 - jnp.minimum(mod, 16)) * weight
    return accum + mod * pred.astype(jnp.int32), count + mod


@jax.jit
def temporal_filter_normalize_device(accum, count, base):
    """Rounded normalize (temporal_filter.c:668); zero-count pixels keep
    the anchor value."""
    cnt1 = jnp.maximum(count, 1)
    out = (accum + (cnt1 >> 1)) // cnt1
    return jnp.where(count > 0, out, base.astype(jnp.int32)) \
        .astype(jnp.uint8)


@jax.jit
def variance_blocks_device(src, pred):
    """vp8_variance16x16 over every aligned MB at once
    (vp8/encoder/variance_c.c:81-106 role): returns (sse, var) int32/
    int64 [R, C] with var = sse - mean_diff^2/256."""
    H, W = src.shape
    R, C = H // 16, W // 16
    d = src.astype(jnp.int32) - pred.astype(jnp.int32)
    db = d.reshape(R, 16, C, 16)
    s = db.sum((1, 3))
    sse = (db * db).sum((1, 3))
    # exact (s*s) >> 8 without int64 (JAX x64 is off by default): with
    # s = hi*256 + lo, floor(s^2/256) = hi^2*256 + 2*hi*lo + (lo^2 >> 8)
    sa = jnp.abs(s)
    hi, lo = sa >> 8, sa & 255
    var = sse - (hi * hi * 256 + 2 * hi * lo + ((lo * lo) >> 8))
    return sse, var


@jax.jit
def ssim_plane_device(a, b):
    """8x8-window integer-parameterized SSIM (ssim.c vp8_ssim_parms_8x8 +
    similarity), averaged over windows stepped by 4 like vp8_ssim2
    (ssim.c:104-128).  Window moment sums are exact int32 (8x8 windows at
    stride 4 = 2x2 sums of disjoint 4x4 tile sums); only the final
    similarity ratio is float.  Returns the scalar mean SSIM."""
    c1 = 0.01 * 0.01 * 255 * 255 * 64
    c2 = 0.03 * 0.03 * 255 * 255 * 64 * 64
    h, w = a.shape
    ny = (h - 8) // 4 + 1
    nx = (w - 8) // 4 + 1
    hh, ww = (ny + 1) * 4, (nx + 1) * 4
    ai = a.astype(jnp.int32)[:hh, :ww]
    bi = b.astype(jnp.int32)[:hh, :ww]

    def tiles(x):
        return x.reshape(hh // 4, 4, ww // 4, 4).sum((1, 3))

    def wins(x):
        t = tiles(x)
        return (t[:ny, :nx] + t[1:ny + 1, :nx] +
                t[:ny, 1:nx + 1] + t[1:ny + 1, 1:nx + 1])

    sa = wins(ai).astype(jnp.float32)
    sb = wins(bi).astype(jnp.float32)
    saa = wins(ai * ai).astype(jnp.float32)
    sbb = wins(bi * bi).astype(jnp.float32)
    sab = wins(ai * bi).astype(jnp.float32)
    ssim_n = (2.0 * sa * sb + c1) * (2.0 * (64.0 * sab - sa * sb) + c2)
    ssim_d = (sa * sa + sb * sb + c1) * \
        (64.0 * saa - sa * sa + 64.0 * sbb - sb * sb + c2)
    return jnp.mean(ssim_n / ssim_d)
