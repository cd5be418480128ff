"""Pallas wavefront kernels vs the golden XLA wavefront (bit-exact).

The golden models/wavefront.py path is itself MD5-verified against the
reference vpxdec on the conformance corpus (tests/test_tpu_decoder.py), so
matching it bit-exactly transitively proves conformance.  Runs in Pallas
interpret mode on the CPU mesh (conftest forces JAX_PLATFORMS=cpu).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from libvpx_opencl_tpu.models import wavefront as wf
from libvpx_opencl_tpu.ops import pallas_wavefront as PW


def _rand_case(rng, R, C):
    N = R * C
    yb = rng.integers(0, 256, (N, 16, 16)).astype(np.int32)
    ub = rng.integers(0, 256, (N, 8, 8)).astype(np.int32)
    vb = rng.integers(0, 256, (N, 8, 8)).astype(np.int32)
    flevel = rng.integers(0, 64, N).astype(np.int32)
    flevel[rng.random(N) < 0.2] = 0
    noskip = (rng.random(N) < 0.7).astype(np.int32)
    return yb, ub, vb, flevel, noskip


def _lf_params(flevel):
    # equivalence test: any consistent limit values exercise both paths
    mblim = (2 * (flevel + 2) + 1).astype(np.int32)
    blim = (2 * flevel + 1).astype(np.int32)
    lim = np.maximum(flevel // 2, 1).astype(np.int32)
    hev = np.clip(flevel // 16 + 1, 0, 3).astype(np.int32)
    return mblim, blim, lim, hev


@pytest.mark.parametrize("R,C", [(4, 6), (3, 3), (1, 5), (5, 1)])
@pytest.mark.parametrize("simple", [False, True])
def test_loop_filter_matches_golden(R, C, simple):
    rng = np.random.default_rng(R * 100 + C + int(simple))
    yb, ub, vb, flevel, noskip = _rand_case(rng, R, C)
    ml, bl, il, hv = _lf_params(flevel)
    sch = wf.schedule(R, C)
    j = jnp.asarray
    gy, gu, gv = wf.loop_filter_blocks(
        R, C, sch, simple, j(yb), j(ub), j(vb),
        j(flevel), j(ml), j(bl), j(il), j(hv), j(noskip))

    params = PW.pack_params([j(flevel), j(ml), j(bl), j(il), j(hv),
                             j(noskip)], R, C)
    outs = PW.loop_filter_pallas(R, C, simple, True,
                                 PW.to_diag(j(yb), R, C),
                                 PW.to_diag(j(ub), R, C),
                                 PW.to_diag(j(vb), R, C), params)
    fy, fu, fv = PW.lf_compose(outs, R, C, simple)
    np.testing.assert_array_equal(np.asarray(PW.from_diag(fy, R, C)),
                                  np.asarray(gy))
    np.testing.assert_array_equal(np.asarray(PW.from_diag(fu, R, C)),
                                  np.asarray(gu))
    np.testing.assert_array_equal(np.asarray(PW.from_diag(fv, R, C)),
                                  np.asarray(gv))


def test_diag_roundtrip():
    rng = np.random.default_rng(0)
    R, C = 5, 7
    b = rng.integers(0, 256, (R * C, 16, 16)).astype(np.int32)
    d = PW.to_diag(jnp.asarray(b), R, C)
    back = PW.from_diag(d, R, C)
    np.testing.assert_array_equal(np.asarray(back), b)


def _intra_case(rng, R, C):
    N = R * C
    inter_y = rng.integers(0, 256, (N, 16, 16)).astype(np.int32)
    inter_u = rng.integers(0, 256, (N, 8, 8)).astype(np.int32)
    inter_v = rng.integers(0, 256, (N, 8, 8)).astype(np.int32)
    ry = rng.integers(-80, 80, (N, 16, 16)).astype(np.int32)
    ru = rng.integers(-80, 80, (N, 8, 8)).astype(np.int32)
    rv = rng.integers(-80, 80, (N, 8, 8)).astype(np.int32)
    # mode 4 = B_PRED; include every 16x16/chroma/B sub-mode
    mode = rng.integers(0, 5, N).astype(np.int32)
    uv_mode = rng.integers(0, 4, N).astype(np.int32)
    intra = rng.random(N) < 0.6
    bmodes = rng.integers(0, 10, (N, 16)).astype(np.int32)
    return inter_y, inter_u, inter_v, ry, ru, rv, mode, uv_mode, intra, \
        bmodes


@pytest.mark.parametrize("R,C", [(4, 6), (3, 3), (1, 5), (5, 1)])
def test_intra_recon_matches_golden(R, C):
    """ADVICE r1: differential coverage for the intra Pallas kernel —
    random modes/intra/bmodes vs wf.intra_recon_blocks (itself MD5-verified
    against the reference vpxdec)."""
    rng = np.random.default_rng(R * 31 + C)
    (inter_y, inter_u, inter_v, ry, ru, rv, mode, uv_mode, intra,
     bmodes) = _intra_case(rng, R, C)
    sch = wf.schedule(R, C)
    j = jnp.asarray
    gy, gu, gv = wf.intra_recon_blocks(
        R, C, sch, j(inter_y), j(inter_u), j(inter_v), j(ry), j(ru), j(rv),
        j(mode), j(uv_mode), j(intra), j(bmodes))

    params = PW.pack_params([j(mode), j(uv_mode), j(intra.astype(np.int32))],
                            R, C)
    bmd = jnp.stack([PW.vec_to_diag(j(bmodes[:, k]), R, C)
                     for k in range(16)], 1)
    D = PW.diag_depth(R, C)
    nidx = np.arange(R * C)
    isb = (mode == PW.B_PRED_M) & intra
    flags = np.zeros(D, np.int32)
    flags[2 * (nidx[isb] // C) + nidx[isb] % C] = 1
    yd, ud, vd = PW.intra_recon_pallas(
        R, C, True, j(flags),
        PW.to_diag(j(inter_y), R, C), PW.to_diag(j(inter_u), R, C),
        PW.to_diag(j(inter_v), R, C), PW.to_diag(j(ry), R, C),
        PW.to_diag(j(ru), R, C), PW.to_diag(j(rv), R, C), params, bmd)
    np.testing.assert_array_equal(np.asarray(PW.from_diag(yd, R, C)),
                                  np.asarray(gy))
    np.testing.assert_array_equal(np.asarray(PW.from_diag(ud, R, C)),
                                  np.asarray(gu))
    np.testing.assert_array_equal(np.asarray(PW.from_diag(vd, R, C)),
                                  np.asarray(gv))
