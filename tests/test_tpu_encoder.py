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
        ey, eu, ev = enc.ref.visible()
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
        ey, eu, ev = enc.ref.visible()
        assert np.array_equal(ey, dy), f"seg closed loop diverged, frame {i}"
        assert np.array_equal(eu, du)
        assert np.array_equal(ev, dv)
