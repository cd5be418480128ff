"""Device RD costing vs the host oracle (rdopt.cost_block / fast_quant)."""
import numpy as np
import jax.numpy as jnp

from conftest import vector  # noqa: F401
from libvpx_opencl_tpu.models import rdopt
from libvpx_opencl_tpu.models.encoder import (_default_token_costs,
                                              fdct4x4, regular_quant,
                                              walsh4x4)
from libvpx_opencl_tpu.ops import rd_device as rd

TC = _default_token_costs()


def _rand_levels(rng, n):
    """Realistically sparse quantized blocks in the cat6 token range."""
    q = np.zeros((n, 16), np.int32)
    for i in range(n):
        k = rng.integers(0, 17)
        pos = rng.permutation(16)[:k]
        q[i, pos] = rng.integers(-2047, 2048, k)
    return q


def test_block_rate_matches_cost_block():
    rng = np.random.default_rng(7)
    q = _rand_levels(rng, 64)
    for btype, start in ((0, 1), (1, 0), (2, 0), (3, 0)):
        tcb = rd.banded_token_costs(TC, btype)
        for ctx in (0, 1, 2):
            ctx_a = jnp.full((64,), ctx, jnp.int32)
            rate_d, nz_d = rd.block_rate(jnp.asarray(q), tcb, start, ctx_a)
            rate_d = np.asarray(rate_d)
            nz_d = np.asarray(nz_d)
            for i in range(64):
                zz = q[i][np.asarray(rd.ZZ)]
                nzp = np.nonzero(zz)[0]
                eob = int(nzp[-1]) + 1 if len(nzp) else 0
                eob = max(eob, start)
                r, nz = rdopt.cost_block(q[i], eob, start, ctx, TC[btype])
                assert rate_d[i] == r, (btype, ctx, i)
                assert nz_d[i] == nz


def test_rd_y16_matches_host():
    rng = np.random.default_rng(3)
    resid = rng.integers(-64, 64, (8, 16, 16)).astype(np.int32)
    dq1 = np.tile(np.array([[8, 10]], np.int32), (8, 1))
    dq2 = np.tile(np.array([[16, 20]], np.int32), (8, 1))
    qidx = np.full(8, 40, np.int32)
    tcb0 = rd.banded_token_costs(TC, 0)
    tcb1 = rd.banded_token_costs(TC, 1)
    rate_d, dist_d, nz_d = rd.rd_y16(jnp.asarray(resid), jnp.asarray(dq1),
                                     jnp.asarray(dq2), jnp.asarray(qidx),
                                     tcb0, tcb1)
    rate_d, dist_d = np.asarray(rate_d), np.asarray(dist_d)
    for i in range(8):
        coeffs = np.zeros((17, 16), np.int32)
        for b in range(16):
            by, bx = (b >> 2) * 4, (b & 3) * 4
            coeffs[b] = fdct4x4(resid[i, by:by + 4, bx:bx + 4])
        coeffs[16] = walsh4x4(coeffs[:16, 0].copy())
        q = np.zeros((17, 16), np.int32)
        eobs = np.zeros(17, np.int32)
        for b in range(16):
            q[b], e = regular_quant(coeffs[b], dq1[i], int(qidx[i]),
                                    first=1)
            eobs[b] = max(e, 1)
        q[16], eobs[16] = regular_quant(coeffs[16], dq2[i], int(qidx[i]))
        # dist: AC error + Y2 error
        dqv2 = np.array([dq2[i, 0]] + [dq2[i, 1]] * 15, np.int64)
        err = (((coeffs[:16, 1:] -
                 q[:16, 1:].astype(np.int64) * dq1[i, 1]) ** 2).sum() +
               ((coeffs[16].astype(np.int64) - q[16] * dqv2) ** 2).sum())
        assert abs(dist_d[i] - err) <= 1e-3 * max(err, 1), i
        # rate with the device's ctx convention (external ctx = 0)
        nz = np.array([int(eobs[b] > 1) for b in range(16)]).reshape(4, 4)
        rate = 0
        for b in range(16):
            br, bc = b >> 2, b & 3
            ctx = (nz[br - 1, bc] if br else 0) + \
                  (nz[br, bc - 1] if bc else 0)
            r, _ = rdopt.cost_block(q[b], int(eobs[b]), 1, int(ctx), TC[0])
            rate += r
        r2, _ = rdopt.cost_block(q[16], int(eobs[16]), 0, 0, TC[1])
        rate += r2
        assert rate_d[i] == rate, i


def test_rd_uv_matches_host():
    rng = np.random.default_rng(4)
    ru = rng.integers(-48, 48, (8, 8, 8)).astype(np.int32)
    rv = rng.integers(-48, 48, (8, 8, 8)).astype(np.int32)
    dq = np.tile(np.array([[6, 7]], np.int32), (8, 1))
    qidx = np.full(8, 60, np.int32)
    tcb2 = rd.banded_token_costs(TC, 2)
    rate_d, dist_d = rd.rd_uv(jnp.asarray(ru), jnp.asarray(rv),
                              jnp.asarray(dq), jnp.asarray(qidx), tcb2)
    rate_d, dist_d = np.asarray(rate_d), np.asarray(dist_d)
    for i in range(8):
        rate, dist = 0, 0
        for resid in (ru[i], rv[i]):
            q = np.zeros((4, 16), np.int32)
            eobs = np.zeros(4, np.int32)
            coeffs = np.zeros((4, 16), np.int32)
            for b in range(4):
                by, bx = (b >> 1) * 4, (b & 1) * 4
                coeffs[b] = fdct4x4(resid[by:by + 4, bx:bx + 4])
                q[b], eobs[b] = regular_quant(coeffs[b], dq[i],
                                              int(qidx[i]))
            dqv = np.array([dq[i, 0]] + [dq[i, 1]] * 15, np.int64)
            dist += ((coeffs.astype(np.int64) - q * dqv[None]) ** 2).sum()
            nz = (eobs > 0).astype(int).reshape(2, 2)
            for b in range(4):
                br, bc = b >> 1, b & 1
                ctx = (nz[br - 1, bc] if br else 0) + \
                      (nz[br, bc - 1] if bc else 0)
                r, _ = rdopt.cost_block(q[b], int(eobs[b]), 0, int(ctx),
                                        TC[2])
                rate += r
        assert rate_d[i] == rate, i
        assert abs(dist_d[i] - dist) <= 1e-3 * max(dist, 1), i


def test_regular_quant_batch_bit_exact():
    from libvpx_opencl_tpu.ops import transforms as tf
    rng = np.random.default_rng(1)
    n = 256
    coeffs = (rng.normal(0, 200, (n, 16)) *
              (rng.random((n, 16)) < 0.5)).astype(np.int32)
    coeffs[::7] = rng.normal(0, 3000, (16,)).astype(np.int32)
    dqs = np.stack([rng.integers(4, 320, n),
                    rng.integers(4, 320, n)], 1).astype(np.int32)
    qidx = rng.integers(0, 128, n).astype(np.int32)
    first0 = rng.random(n) < 0.5
    lv, eb = tf.regular_quant_batch(jnp.asarray(coeffs), jnp.asarray(dqs),
                                    jnp.asarray(qidx), jnp.asarray(first0))
    lv, eb = np.asarray(lv), np.asarray(eb)
    for i in range(n):
        l, e = regular_quant(coeffs[i], tuple(dqs[i]), int(qidx[i]),
                             first=int(first0[i]))
        assert np.array_equal(l, lv[i]) and e == eb[i], i
