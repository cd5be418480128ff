"""Temporal layers: enhancement frames must be droppable."""
import numpy as np

from conftest import vector  # noqa: F401
from libvpx_opencl_tpu.models.encoder import Encoder
from libvpx_opencl_tpu.models.layers import TemporalLayerEncoder
from libvpx_opencl_tpu.models.refdec import RefDecoder
from test_encoder import synth, psnr


def test_temporal_layer_drop():
    frames = synth(112, 96, 6)
    enc = Encoder(112, 96, qindex=30)
    tl = TemporalLayerEncoder(enc, pattern="L1T2",
                              layer_bitrates_kbps=(100, 200), fps=30.0)
    payloads = []
    for y, u, v in frames:
        p, layer = tl.encode_frame(y, u, v)
        payloads.append((p, layer))
    # full decode
    d1 = type("D", (RefDecoder,), {"use_native": True})()
    for p, _l in payloads:
        d1.decode_frame(p)
    # base-layer-only decode (drop all L1 frames) must still work
    d0 = type("D", (RefDecoder,), {"use_native": True})()
    n = 0
    for p, layer in payloads:
        if layer != 0:
            continue
        show, (dy, du, dv) = d0.decode_frame(p)
        n += 1
    assert n == 3
    # base layer frames are frames 0,2,4 — compare quality vs source
    assert psnr(frames[4][0], dy) > 25.0
