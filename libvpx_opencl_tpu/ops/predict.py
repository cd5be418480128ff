"""Device prediction ops: batched motion compensation + intra block math.

MC design (SURVEY.md §2.1 "GPU subpel filters" TPU plan): all motion
vectors are gathered into arrays on the host and the whole frame's
prediction is computed as ONE batched gather + separable 6-tap filter pass —
no per-block kernel launches.  Every prediction block is treated as a 4x4
tile with its own (clamped) MV:

  * 16x16 MBs contribute 16 tiles sharing one MV — pointwise identical to
    the reference's vp8_sixtap_predict16x16 (filter.c:222) because the
    separable FIR window math is position-independent;
  * SPLITMV uses the per-sub-block MVs (reconinter.c:449-525);
  * chroma uses the derived/averaged MVs (reconinter.c:418-424,527-558);
  * full-pel motion uses filter index 0 whose taps {0,0,128,0,0,0}
    reproduce vp8_copy_mem exactly ((128*x+64)>>7 == x);
  * bilinear streams (version>=1) pass a tap table with the 2-tap bilinear
    kernels embedded as {0,0,a,b,0,0} — identical rounding, and the extra
    taps are zero so the wider support window contributes nothing.

Intra block math mirrors reconintra.c / reconintra4x4.c and runs inside the
wavefront scan in models/tpu_decoder.py.
"""
import jax
import jax.numpy as jnp
import numpy as np

from . import tables as T

# unified 6-tap tables (int32): index 0..7 = subpel phase
SIXTAP_TABLE = np.ascontiguousarray(T.SUBPEL_FILTERS, dtype=np.int32)
BILINEAR_AS_SIXTAP = np.zeros((8, 6), dtype=np.int32)
BILINEAR_AS_SIXTAP[:, 2] = T.BILINEAR_FILTERS[:, 0]
BILINEAR_AS_SIXTAP[:, 3] = T.BILINEAR_FILTERS[:, 1]


def mc_predict_blocks(ref_planes, ref_idx, starts, xphase, yphase, taps, bw):
    """Batched bw x bw sub-pel prediction with ONE gather per block.

    ref_planes: [nref, H, W] uint8; ref_idx [B]; starts [B,2] full-pel
    top-left; x/yphase [B]; taps [8,6]; bw = block width (16 luma / 8
    chroma). Gathers a (bw+5)^2 window per block and runs the separable
    6-tap in two passes. Returns [B, bw, bw] int32.

    Used for the uniform-MV case (every non-SPLITMV MB): 16x fewer gather
    rows than per-tile gathering, identical math (filter.c windows are
    position-independent).
    """
    w = bw + 5

    def gather(one_ref, ys, xs):
        return jax.lax.dynamic_slice(
            ref_planes, (one_ref, ys - 2, xs - 2), (1, w, w))[0]

    win = jax.vmap(gather)(ref_idx, starts[:, 0], starts[:, 1])
    win = win.astype(jnp.int32)
    tx = taps[xphase]
    ty = taps[yphase]
    h = jnp.zeros(win.shape[:1] + (w, bw), dtype=jnp.int32)
    for j in range(6):
        h = h + win[:, :, j:j + bw] * tx[:, j, None, None]
    h = jnp.clip((h + 64) >> 7, 0, 255)
    v = jnp.zeros(win.shape[:1] + (bw, bw), dtype=jnp.int32)
    for j in range(6):
        v = v + h[:, j:j + bw, :] * ty[:, j, None, None]
    return jnp.clip((v + 64) >> 7, 0, 255)


def mc_predict_tiles(ref_planes, ref_idx, starts, xphase, yphase, taps):
    """Batched 4x4 sub-pel prediction.

    ref_planes: [nref, H, W] uint8 padded reference planes
    ref_idx:    [B] int32 plane selector
    starts:     [B, 2] int32 full-pel top-left of each tile (y, x) in padded
                coords (caller guarantees start-2 >= 0 and start+7 <= dim)
    x/yphase:   [B] int32 subpel phase 0..7
    taps:       [8, 6] int32 filter bank
    Returns [B, 4, 4] int32 predicted tiles.
    """
    def gather(one_ref, ys, xs):
        return jax.lax.dynamic_slice(
            ref_planes, (one_ref, ys - 2, xs - 2), (1, 9, 9))[0]

    win = jax.vmap(gather)(ref_idx, starts[:, 0], starts[:, 1])
    win = win.astype(jnp.int32)
    tx = taps[xphase]  # [B, 6]
    ty = taps[yphase]
    # horizontal pass: [B, 9, 4]
    h = jnp.zeros(win.shape[:1] + (9, 4), dtype=jnp.int32)
    for j in range(6):
        h = h + win[:, :, j:j + 4] * tx[:, j, None, None]
    h = jnp.clip((h + 64) >> 7, 0, 255)
    # vertical pass: [B, 4, 4]
    v = jnp.zeros(win.shape[:1] + (4, 4), dtype=jnp.int32)
    for j in range(6):
        v = v + h[:, j:j + 4, :] * ty[:, j, None, None]
    return jnp.clip((v + 64) >> 7, 0, 255)


# ---------------------------------------------------------------------------
# intra prediction block math (int32 in, int32 out)

def pred_nxn(mode, above, left, tl, up_avail, left_avail, n):
    """16x16/8x8 intra prediction (reconintra.c:136-470).

    above [n], left [n], tl scalar, avail flags traced bools; returns [n,n].
    """
    total = (jnp.sum(above) * up_avail + jnp.sum(left) * left_avail)
    shift = (n.bit_length() - 2) + up_avail.astype(jnp.int32) + \
        left_avail.astype(jnp.int32)
    dc = jnp.where(up_avail | left_avail,
                   (total + jnp.left_shift(1, shift - 1)) >> shift, 128)
    dc_blk = jnp.full((n, n), 0, jnp.int32) + dc
    v_blk = jnp.tile(above[None, :], (n, 1))
    h_blk = jnp.tile(left[:, None], (1, n))
    tm_blk = jnp.clip(left[:, None] + above[None, :] - tl, 0, 255)
    return jax.lax.switch(jnp.clip(mode, 0, 3),
                          [lambda: dc_blk, lambda: v_blk,
                           lambda: h_blk, lambda: tm_blk])


def bpred_4x4(mode, above8, left4, tl):
    """4x4 B_PRED block (vp8_intra4x4_predict_c, reconintra4x4.c:17-289).

    above8: [8] int32 (Above[0..7]), left4: [4], tl scalar. Returns [4,4].
    """
    blocks = bpred_4x4_all(above8, left4, tl)
    return jax.lax.switch(jnp.clip(mode, 0, 9),
                          [lambda b=b: b for b in blocks])


def bpred_4x4_all(above8, left4, tl):
    """All ten 4x4 B_PRED predictions at once (for the encoder's
    per-subblock mode search).  Returns a list of 10 [4,4] blocks in
    bmode order B_DC,B_TM,B_VE,B_HE,B_LD,B_RD,B_VR,B_VL,B_HD,B_HU."""
    A = above8
    L = left4
    out = []

    def e3(a, b, c):
        return (a + 2 * b + c + 2) >> 2

    def h2(a, b):
        return (a + b + 1) >> 1

    # B_DC
    dc = (jnp.sum(A[:4]) + jnp.sum(L) + 4) >> 3
    b_dc = jnp.full((4, 4), 0, jnp.int32) + dc
    # B_TM
    b_tm = jnp.clip(L[:, None] + A[None, :4] - tl, 0, 255)
    # B_VE
    ap = jnp.stack([e3(tl, A[0], A[1]), e3(A[0], A[1], A[2]),
                    e3(A[1], A[2], A[3]), e3(A[2], A[3], A[4])])
    b_ve = jnp.tile(ap[None, :], (4, 1))
    # B_HE
    lp = jnp.stack([e3(tl, L[0], L[1]), e3(L[0], L[1], L[2]),
                    e3(L[1], L[2], L[3]), e3(L[2], L[3], L[3])])
    b_he = jnp.tile(lp[:, None], (1, 4))
    # B_LD
    p = A
    d = [e3(p[i], p[i + 1], p[i + 2]) for i in range(6)] + \
        [e3(p[6], p[7], p[7])]
    b_ld = jnp.stack([jnp.stack([d[0], d[1], d[2], d[3]]),
                      jnp.stack([d[1], d[2], d[3], d[4]]),
                      jnp.stack([d[2], d[3], d[4], d[5]]),
                      jnp.stack([d[3], d[4], d[5], d[6]])])
    # pp for RD/VR/HD
    pp = jnp.stack([L[3], L[2], L[1], L[0], tl, A[0], A[1], A[2], A[3]])
    ed = [e3(pp[i], pp[i + 1], pp[i + 2]) for i in range(7)]
    hd = [h2(pp[i], pp[i + 1]) for i in range(8)]
    b_rd = jnp.stack([jnp.stack([ed[3], ed[4], ed[5], ed[6]]),
                      jnp.stack([ed[2], ed[3], ed[4], ed[5]]),
                      jnp.stack([ed[1], ed[2], ed[3], ed[4]]),
                      jnp.stack([ed[0], ed[1], ed[2], ed[3]])])
    b_vr = _build_vr(ed, hd)
    b_hd = _build_hd(ed, hd, pp)
    # B_VL
    p = A
    evl = [e3(p[i], p[i + 1], p[i + 2]) for i in range(6)]
    hvl = [h2(p[i], p[i + 1]) for i in range(5)]
    b_vl = jnp.stack([jnp.stack([hvl[0], hvl[1], hvl[2], hvl[3]]),
                      jnp.stack([evl[0], evl[1], evl[2], evl[3]]),
                      jnp.stack([hvl[1], hvl[2], hvl[3], evl[4]]),
                      jnp.stack([evl[1], evl[2], evl[3], evl[5]])])
    # B_HU
    q = L
    b_hu = jnp.stack([
        jnp.stack([h2(q[0], q[1]), e3(q[0], q[1], q[2]),
                   h2(q[1], q[2]), e3(q[1], q[2], q[3])]),
        jnp.stack([h2(q[1], q[2]), e3(q[1], q[2], q[3]),
                   h2(q[2], q[3]), e3(q[2], q[3], q[3])]),
        jnp.stack([h2(q[2], q[3]), e3(q[2], q[3], q[3]), q[3], q[3]]),
        jnp.stack([q[3], q[3], q[3], q[3]])])
    return [b_dc, b_tm, b_ve, b_he, b_ld, b_rd, b_vr, b_vl, b_hd, b_hu]


def _build_vr(ed, hd):
    """B_VR layout (reconintra4x4.c:197-227)."""
    r0 = jnp.stack([hd[4], hd[5], hd[6], hd[7]])
    r1 = jnp.stack([ed[3], ed[4], ed[5], ed[6]])
    r2 = jnp.stack([ed[2], hd[4], hd[5], hd[6]])
    r3 = jnp.stack([ed[1], ed[3], ed[4], ed[5]])
    return jnp.stack([r0, r1, r2, r3])


def _build_hd(ed, hd, pp):
    """B_HD layout (reconintra4x4.c:258-287)."""
    r0 = jnp.stack([hd[3], ed[3], ed[4], ed[5]])
    r1 = jnp.stack([hd[2], ed[2], hd[3], ed[3]])
    r2 = jnp.stack([hd[1], ed[1], hd[2], ed[2]])
    r3 = jnp.stack([hd[0], ed[0], hd[1], ed[1]])
    return jnp.stack([r0, r1, r2, r3])
