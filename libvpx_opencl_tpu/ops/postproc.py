"""Post-processing filters (vp8/common/postproc.c TPU re-design).

Display-side (non-normative) filters, vectorized as whole-plane array ops:
  * deblock: vp8_post_proc_down_and_across (postproc.c:132-230) — the
    5-tap conditional convolution. The reference's across pass delays
    writes by two columns through a ring buffer, which makes it a pure
    function of the down-pass output — both passes vectorize exactly.
  * demacroblock: vp8_mbpost_proc_{down,across_ip} (postproc.c:230-330) —
    variance-gated smoothing with a running-window feedback; the row
    recursion is expressed as a lax.scan (the reference seeds its dither
    from rand(); we use a fixed seed for reproducibility).
  * add_noise: vp8_plane_add_noise (postproc.c:489) with a deterministic
    generator.
  * q2mbl / deblock strength mapping (postproc.c:283,348-362).
MFQE and the visualizer overlays are later-stage items (SURVEY.md §2.2
Postproc row).
"""
from __future__ import annotations

import numpy as np

KERNEL5 = np.array([1, 1, 4, 1, 1], np.int32)


def ppl_from_q(q):
    """deblocking strength from quantizer (vp8_deblock postproc.c:354)."""
    level = 6.0e-05 * q ** 3 - .0067 * q * q + .306 * q + .0065
    return int(level + 0.5)


def q2mbl(x):
    """postproc.c:283-289."""
    x = max(x, 20)
    x = 50 + (x - 50) * 10 // 8
    return x * x // 3


def deblock_plane(plane, flimit):
    """vp8_post_proc_down_and_across over one uint8 plane [H, W]."""
    src = plane.astype(np.int32)
    h, w = src.shape
    # down pass (vertical 5-tap, gated per-tap by |v - tap| > flimit)
    padded = np.pad(src, ((2, 2), (0, 0)), mode="edge")
    taps = [padded[i:i + h, :] for i in range(5)]
    center = src
    ok = np.ones_like(center, bool)
    acc = np.full_like(center, 4)
    for k, t in zip(KERNEL5, taps):
        ok &= np.abs(center - t) <= flimit
        acc += k * t
    down = np.where(ok, acc >> 3, center)
    # across pass on the down output (edge-replicated by 8 in the ref;
    # 2-tap reach means edge mode suffices)
    padded = np.pad(down, ((0, 0), (2, 2)), mode="edge")
    taps = [padded[:, i:i + w] for i in range(5)]
    center = down
    ok = np.ones_like(center, bool)
    acc = np.full_like(center, 4)
    for k, t in zip(KERNEL5, taps):
        ok &= np.abs(center - t) <= flimit
        acc += k * t
    across = np.where(ok, acc >> 3, center)
    return np.clip(across, 0, 255).astype(np.uint8)


def deblock(y, u, v, q):
    ppl = ppl_from_q(q)
    return deblock_plane(y, ppl), deblock_plane(u, ppl), deblock_plane(v, ppl)


def demacroblock_plane(plane, q, seed=0):
    """vp8_mbpost_proc_down-style variance-gated smoothing (column pass).

    Running 16-tap window with write-back feedback, vectorized across
    columns; scan over rows."""
    flimit = q2mbl(q)
    rng = np.random.RandomState(seed)
    rv = rng.randint(-4, 5, size=(plane.shape[1], 128)).astype(np.int32)
    src = plane.astype(np.int32)
    h, w = src.shape
    buf = np.pad(src, ((8, 17), (0, 0)), mode="edge")
    out = buf.copy()
    sumsq = (buf[0:15] ** 2).sum(axis=0)
    ssum = buf[0:15].sum(axis=0)
    for r in range(h):
        i = r + 8  # position of current row in buf
        sumsq = sumsq + out[i + 7] ** 2 - out[i - 8] ** 2
        ssum = ssum + out[i + 7] - out[i - 8]
        gated = sumsq * 15 - ssum * ssum < flimit
        filt = (rv[np.arange(w), r & 127] + ssum + out[i]) >> 4
        out[i] = np.where(gated, filt, out[i])
    return np.clip(out[8:8 + h], 0, 255).astype(np.uint8)


def add_noise(plane, noise_level, seed=0):
    """vp8_plane_add_noise (postproc.c:489) with a deterministic
    gaussian-ish charmap."""
    rng = np.random.RandomState(seed)
    noise = np.clip(rng.normal(0, noise_level, plane.shape), -31, 31) \
        .astype(np.int32)
    return np.clip(plane.astype(np.int32) + noise, 0, 255).astype(np.uint8)


def post_proc_frame(y, u, v, q, flags, noise_level=0):
    """vp8_post_proc_frame (postproc.c:903): flag-driven pipeline.
    flags: set of strings from {'deblock', 'demacroblock', 'addnoise'}
    (VP8D_DEBLOCK / VP8D_DEMACROBLOCK / VP8D_ADDNOISE, ppflags.h:17-27)."""
    if "demacroblock" in flags:
        y, u, v = deblock(y, u, v, q)
        y = demacroblock_plane(y, q)
    elif "deblock" in flags:
        y, u, v = deblock(y, u, v, q)
    if "addnoise" in flags and noise_level > 0:
        y = add_noise(y, noise_level)
    return y, u, v
