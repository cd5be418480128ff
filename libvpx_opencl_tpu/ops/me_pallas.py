"""Pallas full-pel SAD search kernel (the encoder's hottest program).

The reference computes full-search SAD per MB with SIMD kernels
(vp8_full_search_sad, mcomp.c:1295; sad16x16 rtcd family).  The XLA
formulation of the same search materializes a [N, K, K, 16, 16]
candidate tensor in HBM (~4 GB per reference frame at 720p with the
33x33 exhaustive grid) — pure bandwidth waste.  This kernel keeps each
MB's (2*RNG+16)^2 search window VMEM-resident and walks the candidate
grid on the VPU, with the MB index on the lane dimension (128 MBs per
grid program), so HBM traffic is exactly one window read + one [K*K]
SAD write per MB.

Bit-exactness: integer SAD, identical values to ops/me.py's scan
fallback — the two paths are differential-tested and share the argmin /
penalty code, so mode decisions cannot diverge between backends.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _sad_kernel(n_c, step, rng, win_ref, src_ref, out_ref):
    """win_ref [W, W, LANES] i32, src_ref [16, 16, LANES] i32,
    out_ref [n_c*n_c, LANES] i32.  Candidate (dy, dx) = (-rng + i*step,
    -rng + j*step); out row i*n_c+j holds the SAD of that offset for all
    LANES macroblocks."""
    src = src_ref[:, :, :]
    for i in range(n_c):
        # static slice on the leading (non-tiled) dim: rows dy..dy+16
        strip = win_ref[i * step:i * step + 16, :, :]      # [16, W, LANES]

        def col(jc, _):
            blk = jax.lax.dynamic_slice_in_dim(
                strip, jc * step, 16, axis=1)              # [16,16,LANES]
            sad = jnp.sum(jnp.abs(blk - src), axis=(0, 1))  # [LANES]
            out_ref[pl.ds(i * n_c + jc, 1), :] = sad[None]
            return 0

        jax.lax.fori_loop(0, n_c, col, 0)


@functools.partial(jax.jit, static_argnums=(2, 3))
def sad_grid_pallas(win, src_blocks, step, rng):
    """All-candidate SAD grid on TPU.

    win [N, W, W] i32 windows (W = 2*rng + 16); src_blocks [N, 16, 16]
    i32.  Returns sads [N, n_c, n_c] i32 with candidate (dy, dx) =
    (-rng + i*step, -rng + j*step) — exactly ops/me.py's grid order.
    """
    n, w, _ = win.shape
    n_c = (2 * rng) // step + 1
    npad = -(-n // LANES) * LANES
    win_t = jnp.transpose(
        jnp.pad(win, ((0, npad - n), (0, 0), (0, 0))), (1, 2, 0))
    src_t = jnp.transpose(
        jnp.pad(src_blocks, ((0, npad - n), (0, 0), (0, 0))), (1, 2, 0))
    out = pl.pallas_call(
        functools.partial(_sad_kernel, n_c, step, rng),
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
    )(win_t, src_t)
    return jnp.transpose(out, (1, 0))[:n].reshape(n, n_c, n_c)
