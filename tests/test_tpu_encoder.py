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
