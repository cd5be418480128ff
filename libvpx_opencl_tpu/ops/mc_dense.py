"""Dense shift-select motion compensation (gather-free, TPU-native).

The reference computes sub-pel inter prediction with per-block sixtap calls
(vp8/common/reconinter.c:560, filter.c); the OpenCL fork launches one tiny
kernel per block (vp8/common/opencl/filter_cl.c:93,135).  A per-MB window
*gather* is the natural array translation, but XLA's TPU gather with
data-dependent indices runs at ~7 cycles/element (measured: 25ms/frame for
1080p luma alone).  This module computes the whole frame's prediction with
NO data-dependent gathers:

  1. band-stack: 9 shifted row-slab slices of each reference plane give
     every MB row an overlapping row band (pure static slices + stack);
  2. coarse column select: each output MB column needs a 3-segment window
     of source columns whose segment offset takes one of 6 values
     (floor((dx-2)/seg)); combined with the 3-way last/golden/altref choice
     this is an 18-way elementwise select over statically rolled segment
     views — no gather;
  3. fine column shift: the within-segment offset (dx-2) mod seg applied
     with a log-shift network along the window axis.  Per-window the shift
     is CONSTANT along the shifted axis, which is exactly the condition
     under which a butterfly/log-shift network computes a true gather;
  4. horizontal 6-tap: static window slices weighted by per-MB tap maps
     (the unified sixtap/bilinear/full-pel tap-pattern design of
     ops/predict.py);
  5. row shift (dy): log-shift along the band-row axis — again valid
     because dy is constant per (MB) lane along the shifted axis;
  6. vertical 6-tap: static sublane slices weighted by tap maps.

Everything is elementwise or a static slice/roll -> VPU speed-of-light.
MBs whose MVs exceed the band bounds (|dy|,|dx| > 36 luma / > 20 chroma
full-pel) or whose window leaves the bordered plane produce garbage here
and are overwritten by the caller's sparse fixup pass, like SPLITMV
sub-block MVs (reconinter.c:449-525).  UMV-clamped edge MBs are always in
bounds; only interior MBs with very large motion fall out.

Bit-exactness: per-pixel arithmetic is identical to P.mc_predict_blocks
(same (x*tap+64)>>7 rounding/clamps) — verified by
tests/test_mc_dense.py differentials against the golden MC, and end-to-end
by the MD5 conformance suite (models/tpu_decoder.py wires this in as the
production inter-prediction path).
"""
import jax
import jax.numpy as jnp
import numpy as np

DY_BOUND = 36
DX_BOUND = 36
DYC_BOUND = 20
DXC_BOUND = 20

_SLABS = 9
_SLAB0 = -3   # band r covers plane rows [bw*(r-3), bw*(r+6))


def mv_bounds(bw):
    return (DX_BOUND, DY_BOUND) if bw == 16 else (DXC_BOUND, DYC_BOUND)


def window_in_bounds(dx, dy, rr, cc, R, C, bw, border, HP, WP):
    """Host-side: True where mc_dense_plane handles MB (rr, cc) exactly.

    The window (rows border+bw*r+dy-2 .. +bw+3, cols likewise) must lie in
    the bordered plane and the MV within the band bounds."""
    bx, by = mv_bounds(bw)
    x0 = border + bw * cc + dx - 2
    y0 = border + bw * rr + dy - 2
    return ((np.abs(dx) <= bx) & (np.abs(dy) <= by) &
            (x0 >= 0) & (x0 + bw + 5 <= WP) &
            (y0 >= 0) & (y0 + bw + 5 <= HP))


def _band_stack(plane, R, bw):
    """[HP, WP] -> [R, 9*bw, WP] overlapping row bands via static slices."""
    HP, WP = plane.shape
    nslab = HP // bw
    slabs_arr = plane.reshape(nslab, bw, WP)
    parts = []
    for s in range(_SLAB0, _SLAB0 + _SLABS):
        lo, hi = s, s + R
        lo_c, hi_c = max(lo, 0), min(hi, nslab)
        body = slabs_arr[lo_c:hi_c]
        if lo_c - lo or hi - hi_c:
            body = jnp.concatenate(
                [jnp.zeros((lo_c - lo, bw, WP), plane.dtype), body,
                 jnp.zeros((hi - hi_c, bw, WP), plane.dtype)], 0)
        parts.append(body)
    return jnp.stack(parts, axis=1).reshape(R, _SLABS * bw, WP)


def _logshift(x, shift, axis, nbits):
    """out[.., i, ..] = x[.., i+shift, ..]; shift must be constant along
    `axis` (it may vary along every other axis)."""
    for k in range(nbits):
        s = 1 << k
        rolled = jnp.roll(x, -s, axis=axis)
        x = jnp.where((shift >> k) & 1 != 0, rolled, x)
    return x


def mc_dense_plane(refs, ridx, dx, dy, tx, ty, R, C, bw, border):
    """Whole-plane gather-free sub-pel prediction.

    refs [nref<=3, HP, WP] uint8; ridx/dx/dy [R, C] int32 (dx/dy full-pel MV
    parts, zeroed for intra MBs); tx/ty [R, C, 6] int32 tap vectors.
    Returns [R*bw, C*bw] int32. Out-of-bound MBs yield garbage (caller
    fixes up via window_in_bounds)."""
    nref, HP, WP = refs.shape
    W = C * bw
    dyb = DY_BOUND if bw == 16 else DYC_BOUND
    seg = bw  # segment width = block width (16 luma, 8 chroma)
    base = border - bw * _SLAB0            # band row of MB pixel row p=0
    lo = base - dyb - 2
    hi = base + dyb + bw + 4
    Hc = hi - lo

    # 1. row bands per ref (cropped), padded to whole segments + margin
    padl = 2 * seg                          # margin segments for a in [-2..]
    padr = 4 * seg
    WPD = WP + padl + padr
    bands = []
    for i in range(nref):
        b = _band_stack(refs[i], R, bw)[:, lo:hi, :]
        b = jnp.pad(b, ((0, 0), (0, 0), (padl, padr)))
        bands.append(b.reshape(R, Hc, WPD // seg, seg))
    nsegB = WPD // seg

    # 2+3. coarse 18-way select + fine within-segment shift.
    # window for MB col m: source cols border + seg*m + dx - 2 + u,
    # u in [0, bw+5). segment s0 = m + (border + dx - 2 + padl)//seg ... use
    # a = (border + padl + dx - 2) >> log2(seg) - that is per-MB in a small
    # static range; window u-offset b = (border + padl + dx - 2) & (seg-1).
    sft = int(np.log2(seg))
    off = border + padl - 2
    a_all = (dx + off) >> sft               # [R, C]
    b_all = (dx + off) & (seg - 1)
    a_lo = (off - (DX_BOUND if bw == 16 else DXC_BOUND)) >> sft
    a_hi = (off + (DX_BOUND if bw == 16 else DXC_BOUND)) >> sft
    nwin = 4                                # window = 4 segs >= (seg-1)+bw+5
    win = None
    for i in range(nref):
        segs_i = bands[i]                   # [R, Hc, nsegB, seg]
        for a in range(a_lo, a_hi + 1):
            # candidate: segments m+a .. m+a+nwin for every output col m
            sl = segs_i[:, :, a:a + C + nwin, :]
            view = jnp.concatenate(
                [sl[:, :, t:t + C, :] for t in range(nwin)], axis=3)
            msk = ((ridx == i) & (a_all == a))[:, None, :, None]
            win = jnp.where(msk, view, win) if win is not None else \
                jnp.where(msk, view, jnp.zeros_like(view))
    # fine shift along the window axis (constant per window -> exact)
    win = _logshift(win, b_all[:, None, :, None], axis=3, nbits=sft)

    # 4. horizontal 6-tap: h[.., m, j] = sum_l win[.., m, j+l] * tx[m, l]
    tx_e = tx[:, None, :, :]                # [R, 1, C, 6]
    h = win[:, :, :, 0:bw].astype(jnp.int32) * tx_e[..., 0:1]
    for l in range(1, 6):
        h = h + win[:, :, :, l:l + bw].astype(jnp.int32) * tx_e[..., l:l + 1]
    h = jnp.clip((h + 64) >> 7, 0, 255).astype(jnp.uint8)

    # 5. row shift: output row p+k lives at h row (base-lo) + dy - 2 + p + k
    rowshift = (dy + (base - lo) - 2)[:, None, :, None]
    h = _logshift(h, rowshift, axis=1, nbits=7)

    # 6. vertical 6-tap
    ty_e = ty[:, None, :, :]
    v = h[:, 0:bw, :, :].astype(jnp.int32) * ty_e[..., 0:1]
    for k in range(1, 6):
        v = v + h[:, k:bw + k, :, :].astype(jnp.int32) * ty_e[..., k:k + 1]
    v = jnp.clip((v + 64) >> 7, 0, 255)
    return v.reshape(R * bw, W)   # [R, bw, C, bw] dims are already ordered
