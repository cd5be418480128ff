"""Differential test: gather-free dense MC vs the golden per-MB MC.

mc_dense_plane must be bit-exact against P.mc_predict_blocks (which is
itself validated against the reference's sixtap/bilinear filters by the
stream conformance suite) for every in-bounds MV, both block sizes, all
subpel phases, and mixed reference selection.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from libvpx_opencl_tpu.ops import predict as P
from libvpx_opencl_tpu.ops import mc_dense as MD
from libvpx_opencl_tpu.ops.tables import SUBPEL_FILTERS

TAPS = np.ascontiguousarray(SUBPEL_FILTERS, dtype=np.int32)


@pytest.mark.parametrize("R,C,bw,B,seed", [
    (9, 11, 16, 32, 0),       # QCIF luma
    (9, 11, 8, 16, 1),        # QCIF chroma
    (12, 13, 16, 32, 2),      # odd geometry
    (18, 22, 16, 32, 3),      # CIF luma
    (18, 22, 8, 16, 4),       # CIF chroma
])
def test_mc_dense_bit_exact(R, C, bw, B, seed):
    rng = np.random.RandomState(seed)
    HP, WP = R * bw + 2 * B, ((C * bw + 2 * B + 127) // 128) * 128
    refs = rng.randint(0, 256, (3, HP, WP)).astype(np.uint8)
    N = R * C
    bx, by = MD.mv_bounds(bw)
    dx = rng.randint(-bx, bx + 1, (R, C)).astype(np.int32)
    dy = rng.randint(-by, by + 1, (R, C)).astype(np.int32)
    rr = np.tile(np.arange(R)[:, None], (1, C))
    cc = np.tile(np.arange(C), (R, 1))
    ok = MD.window_in_bounds(dx, dy, rr, cc, R, C, bw, B, HP, WP)
    dx = np.where(ok, dx, 0)
    dy = np.where(ok, dy, 0)
    ridx = rng.randint(0, 3, (R, C)).astype(np.int32)
    xph = rng.randint(0, 8, (R, C))
    yph = rng.randint(0, 8, (R, C))
    out = np.asarray(MD.mc_dense_plane(
        jnp.asarray(refs), jnp.asarray(ridx), jnp.asarray(dx),
        jnp.asarray(dy), jnp.asarray(TAPS[xph]), jnp.asarray(TAPS[yph]),
        R, C, bw, B))
    sy = (B + rr.reshape(N) * bw + dy.reshape(N)).astype(np.int32)
    sx = (B + cc.reshape(N) * bw + dx.reshape(N)).astype(np.int32)
    gold = np.asarray(P.mc_predict_blocks(
        jnp.asarray(refs), jnp.asarray(ridx.reshape(N)),
        jnp.stack([jnp.asarray(sy), jnp.asarray(sx)], 1),
        jnp.asarray(xph.reshape(N)), jnp.asarray(yph.reshape(N)),
        jnp.asarray(TAPS), bw))
    gp = gold.reshape(R, C, bw, bw).transpose(0, 2, 1, 3) \
        .reshape(R * bw, C * bw)
    assert (out == gp).all()


def test_mc_dense_bilinear_taps():
    """Bilinear streams pass the 2-tap bank embedded in sixtap form."""
    rng = np.random.RandomState(9)
    R, C, bw, B = 9, 11, 16, 32
    HP, WP = R * bw + 2 * B, 256
    refs = rng.randint(0, 256, (3, HP, WP)).astype(np.uint8)
    N = R * C
    dx = rng.randint(-10, 11, (R, C)).astype(np.int32)
    dy = rng.randint(-10, 11, (R, C)).astype(np.int32)
    ridx = np.zeros((R, C), np.int32)
    xph = rng.randint(0, 8, (R, C))
    yph = rng.randint(0, 8, (R, C))
    bil = np.asarray(P.BILINEAR_AS_SIXTAP, np.int32)
    out = np.asarray(MD.mc_dense_plane(
        jnp.asarray(refs), jnp.asarray(ridx), jnp.asarray(dx),
        jnp.asarray(dy), jnp.asarray(bil[xph]), jnp.asarray(bil[yph]),
        R, C, bw, B))
    rr = np.tile(np.arange(R)[:, None], (1, C))
    cc = np.tile(np.arange(C), (R, 1))
    sy = (B + rr.reshape(N) * bw + dy.reshape(N)).astype(np.int32)
    sx = (B + cc.reshape(N) * bw + dx.reshape(N)).astype(np.int32)
    gold = np.asarray(P.mc_predict_blocks(
        jnp.asarray(refs), jnp.asarray(ridx.reshape(N)),
        jnp.stack([jnp.asarray(sy), jnp.asarray(sx)], 1),
        jnp.asarray(xph.reshape(N)), jnp.asarray(yph.reshape(N)),
        jnp.asarray(bil), bw))
    gp = gold.reshape(R, C, bw, bw).transpose(0, 2, 1, 3) \
        .reshape(R * bw, C * bw)
    assert (out == gp).all()
