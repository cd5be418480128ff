"""TPU encoder: conforming streams + closed-loop device reconstruction."""
import numpy as np

from conftest import vector  # noqa: F401
from libvpx_opencl_tpu.models.tpu_encoder import TPUEncoder
from libvpx_opencl_tpu.models.refdec import RefDecoder
from test_encoder import synth, psnr


def test_tpu_encoder_roundtrip_closed_loop():
    frames = synth(176, 144, 3)
    enc = TPUEncoder(176, 144, qindex=24)
    dec = type("D", (RefDecoder,), {"use_native": True})()
    for i, (y, u, v) in enumerate(frames):
        payload = enc.encode_frame(y, u, v)
        show, (dy, du, dv) = dec.decode_frame(payload)
        assert psnr(y, dy) > 33.0, i
        ey, eu, ev = enc.ref_last.visible()
        assert np.array_equal(ey, dy), f"closed loop diverged at frame {i}"
        assert np.array_equal(eu, du)
        assert np.array_equal(ev, dv)


def test_tpu_encoder_segmentation_closed_loop():
    """ROI map through the TPU encoder: the decoder applies per-segment
    dequant and LF deltas, so the encoder's device recon must match the
    decoded stream exactly (round-2 drift bug regression test)."""
    frames = synth(176, 144, 3)
    enc = TPUEncoder(176, 144, qindex=40)
    R, C = enc.R, enc.C
    seg = np.zeros((R, C), np.int32)
    seg[:R // 2] = 1
    seg[:, :C // 3] = 2
    enc.set_roimap(seg, q_deltas=[0, -20, 16, 0],
                   lf_deltas=[0, 4, -6, 0])
    dec = type("D", (RefDecoder,), {"use_native": True})()
    for i, (y, u, v) in enumerate(frames):
        payload = enc.encode_frame(y, u, v)
        show, (dy, du, dv) = dec.decode_frame(payload)
        ey, eu, ev = enc.ref_last.visible()
        assert np.array_equal(ey, dy), f"seg closed loop diverged, frame {i}"
        assert np.array_equal(eu, du)
        assert np.array_equal(ev, dv)


def test_near_mv_lattice_matches_find_near():
    """Device near-MV lattice (ME.near_mv_lattice) vs the golden
    encoder's _find_near under the all-inter assumption."""
    import jax.numpy as jnp
    from libvpx_opencl_tpu.ops import me as ME
    from libvpx_opencl_tpu.ops import tables as T
    from libvpx_opencl_tpu.models.encoder import Encoder
    from libvpx_opencl_tpu.models.refdec import LAST_FRAME, NEWMV

    rng = np.random.RandomState(11)
    R, C = 6, 7
    enc = Encoder(C * 16, R * 16, qindex=30)
    # random MV field with plenty of zeros and duplicates
    mvf = rng.randint(-3, 4, size=(R, C, 2)).astype(np.int32) * 8
    mvf[rng.rand(R, C) < 0.4] = 0
    enc.mode = np.full((R + 1, C + 1), NEWMV, np.int32)
    enc.reff = np.zeros((R + 1, C + 1), np.int32)
    enc.reff[1:, 1:] = LAST_FRAME
    enc.mv = np.zeros((R + 1, C + 1, 2), np.int32)
    enc.mv[1:, 1:] = mvf

    nst_d, nr_d, best_d, cnt_d = map(
        np.asarray, ME.near_mv_lattice(jnp.asarray(mvf.reshape(-1, 2)),
                                       R, C))
    for r in range(R):
        for c in range(C):
            near, nearest, best, probs, cnt = enc._find_near(r, c)
            n = r * C + c
            assert tuple(nst_d[n]) == nearest, (r, c, nst_d[n], nearest)
            assert tuple(nr_d[n]) == near, (r, c)
            assert tuple(best_d[n]) == best, (r, c)
            dprobs = [int(T.MODE_CONTEXTS[cnt_d[n, i], i])
                      for i in range(4)]
            assert dprobs == probs, (r, c, dprobs, probs)
