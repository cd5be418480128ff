"""Pallas full-pel SAD search kernel (the encoder's hottest program).

The reference computes full-search SAD per MB with SIMD kernels
(vp8_full_search_sad, mcomp.c:1295; sad16x16 rtcd family).  The XLA
formulation of the same search materializes [N, k, 16, W] candidate
strips in HBM (~1.5 GB of intermediate traffic per reference frame at
720p with the 33x33 exhaustive grid) — pure bandwidth waste.  This
kernel keeps each MB's (2*RNG+16)^2 search window VMEM-resident with
the MB index on the lane dimension (128 MBs per grid program), and
walks the candidate grid as a fully static correlation:

    E_c[x]       = sum_r |win[dy+r, x] - src[r, c]|      (per column c)
    SAD[dy, dx]  = sum_c E_c[dx + c]

so every slice start is a Python constant — no dynamic sublane slicing
(unsupported in Mosaic), no HBM intermediates, one window read + one
[n_c*n_c] SAD write per MB.

Bit-exactness: integer SAD, identical values to ops/me.py's XLA grid —
differential-tested in tests/test_me_pallas.py; the argmin / MV-penalty
code is shared downstream, so mode decisions cannot diverge between
backends.

MEASUREMENT (2026-08-21, one v5e chip, 720p N=3600 RNG=16, forced host
fetch per run): this kernel 537 ms vs the XLA grid formulation 42 ms.
XLA's fusion streams the [N,k,16,W] candidate strips without
materializing them, and its layout keeps the 8x128 VPU saturated; the
correlation-form kernel pays 33x16 sequential sublane reductions per
window.  The production exhaustive search therefore uses the XLA grid;
this backend stays available behind VP8TPU_PALLAS_ME=1 (ops/me.py) as
the measured alternative — the same conclusion the reference's OpenCL
fork reached for its loop-filter wavefront headroom note
(vp8/common/opencl/loopfilter_cl.c:427-439): a hand kernel is not
automatically faster than the compiler's schedule.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _sad_kernel(n_c, win_ref, src_ref, out_ref):
    """win_ref [W, W, LANES] i32, src_ref [16, 16, LANES] i32,
    out_ref [n_c*n_c, LANES] i32.  Candidate (dy, dx) = (-rng + i,
    -rng + j); out row i*n_c+j holds that offset's SAD for all LANES
    macroblocks (step-1 grid; callers subsample for coarser steps)."""
    src = src_ref[:, :, :]
    for i in range(n_c):
        strip = win_ref[i:i + 16, :, :]               # [16, W, LANES]
        acc = jnp.zeros((n_c, src.shape[2]), jnp.int32)
        for c in range(16):
            # E_c[x] = sum_r |strip[r, x] - src[r, c]| ; its slice
            # [c : c+n_c] is the column-c contribution to every dx
            e_c = jnp.sum(jnp.abs(strip - src[:, c:c + 1, :]), axis=0)
            acc = acc + e_c[c:c + n_c, :]
        out_ref[i * n_c:(i + 1) * n_c, :] = acc


@functools.partial(jax.jit, static_argnums=(2, 3))
def sad_grid_pallas(win, src_blocks, rng, interpret=False):
    """All-candidate step-1 SAD grid on TPU.

    win [N, W, W] i32 windows (W = 2*rng + 16); src_blocks [N, 16, 16]
    i32.  Returns sads [N, n_c, n_c] i32 with candidate (dy, dx) =
    (-rng + i, -rng + j) — exactly ops/me.py's step-1 grid order.
    """
    n, w, _ = win.shape
    n_c = 2 * rng + 1
    npad = -(-n // LANES) * LANES
    win_t = jnp.transpose(
        jnp.pad(win, ((0, npad - n), (0, 0), (0, 0))), (1, 2, 0))
    src_t = jnp.transpose(
        jnp.pad(src_blocks, ((0, npad - n), (0, 0), (0, 0))), (1, 2, 0))
    out = pl.pallas_call(
        functools.partial(_sad_kernel, n_c),
        grid=(npad // LANES,),
        in_specs=[
            pl.BlockSpec((w, w, LANES), lambda j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 16, LANES), lambda j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_c * n_c, LANES), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_c * n_c, npad), jnp.int32),
        interpret=interpret,
    )(win_t, src_t)
    return jnp.transpose(out, (1, 0))[:n].reshape(n, n_c, n_c)
