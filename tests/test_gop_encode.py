"""GOP-parallel encode: bit-exact vs sequential single-device encode.

cpu_used=7: the GOP-splitting property (keyframes reset all adaptive
state) is speed-level-independent, and the fast ladder compiles the
small encode-wavefront variant (the speed-0 closed loop is separately
gated by test_tpu_encoder).
"""
import numpy as np

from libvpx_opencl_tpu.models.tpu_encoder import TPUEncoder
from libvpx_opencl_tpu.models.refdec import RefDecoder
from libvpx_opencl_tpu.parallel.gop import encode_gops
from test_encoder import synth


def test_gop_parallel_encode_bit_exact():
    w, h, n, gop = 176, 144, 6, 3
    frames = synth(w, h, n)

    # sequential single-device encode with the same keyframe placement
    enc = TPUEncoder(w, h, qindex=40, cpu_used=7)
    seq = [enc.encode_frame(y, u, v, keyframe=(i % gop == 0))
           for i, (y, u, v) in enumerate(frames)]

    par = encode_gops(frames, w, h, gop, qindex=40, cpu_used=7)
    assert len(par) == len(seq)
    for i, (a, b) in enumerate(zip(seq, par)):
        assert a == b, f"frame {i}: GOP-parallel differs from sequential"

    # and the concatenation is a valid stream
    dec = type("D", (RefDecoder,), {"use_native": True})()
    for p in par:
        dec.decode_frame(p)
