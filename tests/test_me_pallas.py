"""Differential test: the Pallas exhaustive SAD grid (ops/me_pallas.py,
interpret mode on CPU) must match ops/me.py's XLA grid formulation
integer-exactly.  ref: vp8_full_search_sad mcomp.c:1295."""
import numpy as np
import jax.numpy as jnp

from libvpx_opencl_tpu.ops import me_pallas


def test_sad_grid_pallas_matches_xla_grid():
    rng_np = np.random.RandomState(0)
    N, RNG = 48, 16
    W = 2 * RNG + 16
    win = jnp.asarray(rng_np.randint(0, 255, size=(N, W, W))
                      .astype(np.int32))
    src = jnp.asarray(rng_np.randint(0, 255, size=(N, 16, 16))
                      .astype(np.int32))
    cands = list(range(-RNG, RNG + 1))
    rows = []
    for dy in cands:
        strip = win[:, dy + RNG:dy + RNG + 16, :]
        cols = jnp.stack([strip[:, :, dx + RNG:dx + RNG + 16]
                          for dx in cands], axis=1)
        rows.append(jnp.sum(jnp.abs(cols - src[:, None]), axis=(2, 3)))
    ref = np.asarray(jnp.stack(rows, axis=1))
    out = np.asarray(me_pallas.sad_grid_pallas(win, src, RNG,
                                               interpret=True))
    np.testing.assert_array_equal(ref, out)
