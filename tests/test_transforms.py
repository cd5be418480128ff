"""Device transforms vs golden scalar reference (differential kernel tests,
the role the RTCD C-vs-SIMD shadowing plays in the reference, SURVEY.md §4.4).
"""
import numpy as np

from conftest import vector  # noqa: F401  (ensures sys.path + cpu jax)
from libvpx_opencl_tpu.models import refdec
from libvpx_opencl_tpu.ops import transforms as tf


def test_idct_batch_matches_golden():
    rng = np.random.RandomState(0)
    for mag in (8, 128, 2048, 32767):
        blocks = rng.randint(-mag, mag + 1, size=(64, 16)).astype(np.int32)
        blocks16 = blocks.astype(np.int16).astype(np.int32)
        got = np.asarray(tf.idct4x4_batch(blocks16.reshape(64, 4, 4)))
        for i in range(64):
            dst = np.zeros((4, 4), dtype=np.uint8)
            base = np.full((4, 4), 128, dtype=np.uint8)
            dst[:] = base
            refdec.idct4x4_add(blocks16[i], dst, 0, 0)
            want = dst.astype(np.int32) - 0  # clip applied
            ours = np.clip(got[i] + 128, 0, 255)
            assert (ours == want).all(), i


def test_inv_walsh_matches_golden():
    rng = np.random.RandomState(1)
    for mag in (8, 512, 32767):
        blocks = rng.randint(-mag, mag + 1, size=(32, 16)) \
            .astype(np.int16).astype(np.int32)
        got = np.asarray(tf.inv_walsh_batch(blocks.reshape(32, 4, 4)))
        for i in range(32):
            want = refdec.inv_walsh(blocks[i])
            assert got[i].tolist() == want, i


def test_dc_only_equals_full_idct():
    # the reference's dc-only fast path (idctllm.c:112) must equal the full
    # IDCT on a dc-only block — this equivalence lets the TPU path drop the
    # per-block eob branch entirely
    for dc in (-32768, -4097, -5, 0, 3, 4, 4095, 32767):
        blk = np.zeros(16, dtype=np.int32)
        blk[0] = np.int16(dc)
        full = np.asarray(tf.idct4x4_batch(blk.reshape(1, 4, 4)))[0]
        a1 = (int(np.int16(dc)) + 4) >> 3
        dst = np.zeros((4, 4), dtype=np.uint8)
        refdec.dc_only_idct_add(np.int16(dc), dst, 0, 0)
        want = np.clip(a1, 0, 255)
        assert (np.clip(full, 0, 255) == want).all(), dc


def test_fdct_walsh_quant_batch_match_golden():
    from libvpx_opencl_tpu.models import encoder as enc
    import jax.numpy as jnp
    rng = np.random.RandomState(3)
    blocks = rng.randint(-255, 256, size=(64, 4, 4)).astype(np.int32)
    got = np.asarray(tf.fdct4x4_batch(jnp.asarray(blocks)))
    for i in range(64):
        want = enc.fdct4x4(blocks[i]).reshape(4, 4)
        assert (got[i] == want).all(), i
    dcs = rng.randint(-2048, 2048, size=(32, 16)).astype(np.int32)
    gotw = np.asarray(tf.walsh4x4_batch(jnp.asarray(dcs)))
    for i in range(32):
        want = enc.walsh4x4(dcs[i])
        assert (gotw[i] == want).all(), i
    coeffs = rng.randint(-3000, 3000, size=(48, 16)).astype(np.int32)
    dq = np.tile(np.array([[8, 17]], np.int32), (48, 1))
    first0 = (np.arange(48) % 2 == 0)
    lv, eob = tf.fast_quant_batch(jnp.asarray(coeffs), jnp.asarray(dq),
                                  jnp.asarray(first0))
    lv, eob = np.asarray(lv), np.asarray(eob)
    for i in range(48):
        want_lv, want_eob = enc.fast_quant(coeffs[i], (8, 17),
                                           first=1 if first0[i] else 0)
        assert (lv[i] == want_lv).all(), i
        assert eob[i] == want_eob, (i, eob[i], want_eob)
