"""Multi-resolution simulcast: both streams decode, low-res MVs seed hi-res."""
import numpy as np

from conftest import vector  # noqa: F401
from libvpx_opencl_tpu.models.multires import MultiResEncoder
from libvpx_opencl_tpu.models.refdec import RefDecoder
from test_encoder import synth, psnr


def test_multires_simulcast():
    frames = synth(128, 96, 3)
    enc = MultiResEncoder(128, 96, qindices=(36, 32))
    dhi = type("D", (RefDecoder,), {"use_native": True})()
    dlo = type("D", (RefDecoder,), {"use_native": True})()
    for y, u, v in frames:
        hi, lo = enc.encode_frame(y, u, v)
        _, (hy, hu, hv) = dhi.decode_frame(hi)
        _, (ly, lu, lv) = dlo.decode_frame(lo)
        assert hy.shape == (96, 128)
        assert ly.shape == (48, 64)
    assert psnr(frames[-1][0], hy) > 28
