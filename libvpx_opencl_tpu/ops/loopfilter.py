"""Vectorized VP8 loop-filter math for the TPU decode path.

Bit-exact array reformulation of the scalar filters in
vp8/common/loopfilter_filters.c.  Each function operates on 8 parallel
pixel vectors p3..q3 (arrays of any broadcastable shape, int32 holding
uint8 values) and returns the filtered pixels, with an `apply` mask (the
per-MB filter-level!=0 / lane-validity gate) selecting filtered vs original.

The edge *ordering* (which makes the filter a wavefront, SURVEY.md §2.6.1)
is orchestrated by the patch scan in models/tpu_decoder.py; the math here
has no ordering knowledge.
"""
import jax.numpy as jnp


def _sclamp(t):
    return jnp.clip(t, -128, 127)


def _u2s(v):
    return v - 128


def _s2u(v):
    return v + 128


def filter_mask(limit, blimit, p3, p2, p1, p0, q0, q1, q2, q3):
    """vp8_filter_mask (loopfilter_filters.c:27-41): True = apply."""
    m = (jnp.abs(p3 - p2) > limit)
    m |= (jnp.abs(p2 - p1) > limit)
    m |= (jnp.abs(p1 - p0) > limit)
    m |= (jnp.abs(q1 - q0) > limit)
    m |= (jnp.abs(q2 - q1) > limit)
    m |= (jnp.abs(q3 - q2) > limit)
    m |= (jnp.abs(p0 - q0) * 2 + jnp.abs(p1 - q1) // 2 > blimit)
    return ~m


def hev_mask(thresh, p1, p0, q0, q1):
    """vp8_hevmask (loopfilter_filters.c:43-49)."""
    return (jnp.abs(p1 - p0) > thresh) | (jnp.abs(q1 - q0) > thresh)


def filter4(mask, hev, p1, p0, q0, q1):
    """vp8_filter (loopfilter_filters.c:51-98). Returns (p1, p0, q0, q1)."""
    ps1, ps0, qs0, qs1 = _u2s(p1), _u2s(p0), _u2s(q0), _u2s(q1)
    f = _sclamp(ps1 - qs1)
    f = jnp.where(hev, f, 0)
    f = _sclamp(f + 3 * (qs0 - ps0))
    f = jnp.where(mask, f, 0)
    f1 = _sclamp(f + 4) >> 3
    f2 = _sclamp(f + 3) >> 3
    oq0 = _s2u(_sclamp(qs0 - f1))
    op0 = _s2u(_sclamp(ps0 + f2))
    f = (f1 + 1) >> 1
    f = jnp.where(hev, 0, f)
    oq1 = _s2u(_sclamp(qs1 - f))
    op1 = _s2u(_sclamp(ps1 + f))
    return op1, op0, oq0, oq1


def mbfilter(mask, hev, p2, p1, p0, q0, q1, q2):
    """vp8_mbfilter (loopfilter_filters.c:161-227).
    Returns (p2, p1, p0, q0, q1, q2)."""
    ps2, ps1, ps0 = _u2s(p2), _u2s(p1), _u2s(p0)
    qs0, qs1, qs2 = _u2s(q0), _u2s(q1), _u2s(q2)
    f = _sclamp(ps1 - qs1)
    f = _sclamp(f + 3 * (qs0 - ps0))
    f = jnp.where(mask, f, 0)
    f2 = jnp.where(hev, f, 0)
    f1 = _sclamp(f2 + 4) >> 3
    f2 = _sclamp(f2 + 3) >> 3
    qs0 = _sclamp(qs0 - f1)
    ps0 = _sclamp(ps0 + f2)
    fw = jnp.where(hev, 0, f)
    u = _sclamp((63 + fw * 27) >> 7)
    oq0 = _s2u(_sclamp(qs0 - u))
    op0 = _s2u(_sclamp(ps0 + u))
    u = _sclamp((63 + fw * 18) >> 7)
    oq1 = _s2u(_sclamp(qs1 - u))
    op1 = _s2u(_sclamp(ps1 + u))
    u = _sclamp((63 + fw * 9) >> 7)
    oq2 = _s2u(_sclamp(qs2 - u))
    op2 = _s2u(_sclamp(ps2 + u))
    return op2, op1, op0, oq0, oq1, oq2


def simple_filter(mask, p1, p0, q0, q1):
    """vp8_simple_filter (loopfilter_filters.c:292-330).
    Returns (p0, q0)."""
    ps1, ps0, qs0, qs1 = _u2s(p1), _u2s(p0), _u2s(q0), _u2s(q1)
    f = _sclamp(ps1 - qs1)
    f = _sclamp(f + 3 * (qs0 - ps0))
    f = jnp.where(mask, f, 0)
    f1 = _sclamp(f + 4) >> 3
    f2 = _sclamp(f + 3) >> 3
    oq0 = _s2u(_sclamp(qs0 - f1))
    op0 = _s2u(_sclamp(ps0 + f2))
    return op0, oq0


def filter_edge(pix8, blimit, limit, thresh, mb_edge, apply):
    """Filter one edge given pix8 [..., 8] = p3..q3 along the last axis.

    blimit/limit/thresh/apply broadcast against pix8[..., 0].
    Returns filtered [..., 8] (p3/q3 unchanged; q2/p2 only for mb edges).
    """
    p3, p2, p1, p0, q0, q1, q2, q3 = [pix8[..., i] for i in range(8)]
    mask = filter_mask(limit, blimit, p3, p2, p1, p0, q0, q1, q2, q3) & apply
    hev = hev_mask(thresh, p1, p0, q0, q1)
    if mb_edge:
        np2, np1, np0, nq0, nq1, nq2 = mbfilter(mask, hev, p2, p1, p0,
                                                q0, q1, q2)
    else:
        np1, np0, nq0, nq1 = filter4(mask, hev, p1, p0, q0, q1)
        np2, nq2 = p2, q2
    return jnp.stack([p3, np2, np1, np0, nq0, nq1, nq2, q3], axis=-1)


def simple_filter_edge(pix8, blimit, apply):
    """Simple-filter variant (y only): blimit test + p0/q0 update."""
    p1, p0, q0, q1 = [pix8[..., i] for i in (2, 3, 4, 5)]
    mask = (jnp.abs(p0 - q0) * 2 + jnp.abs(p1 - q1) // 2 <= blimit) & apply
    op0, oq0 = simple_filter(mask, p1, p0, q0, q1)
    return pix8.at[..., 3].set(op0).at[..., 4].set(oq0)
