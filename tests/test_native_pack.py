"""Differential tests for the C++ pack runtime (native/vp8_pack.cpp +
native/vp8_pack_modes.cpp): the native token-count/token-pack/mode-pack
walks must be byte-exact against the pure-Python golden encoder
(models/encoder.py), which is itself conformance-tested against the
reference decoder.  ref: vp8/encoder/bitstream.c, boolhuff.c."""
import numpy as np
import pytest

from libvpx_opencl_tpu.models.encoder import Encoder
from libvpx_opencl_tpu.utils import native


def _frames(rng, w, h, n):
    base = rng.randint(0, 255, size=(h, w)).astype(np.uint8)
    base[:h // 2, :w // 2] = 128        # flat region -> B_PRED/skip mix
    out = []
    for t in range(n):
        y = np.roll(base, 3 * t, axis=1).copy()
        y[h - 24:h - 16, (8 * t) % (w - 8):(8 * t) % (w - 8) + 8] = \
            rng.randint(0, 255, size=(8, 8))
        u = rng.randint(100, 160, size=(h // 2, w // 2)).astype(np.uint8)
        v = np.full((h // 2, w // 2), 120, np.uint8)
        out.append((y, u, v))
    return out


def _encode(frames, w, h, disable_native, **kw):
    if disable_native:
        orig = native.get_lib
        native.get_lib = lambda: None
    try:
        enc = Encoder(w, h, **kw)
        return [enc.encode_frame(y, u, v, keyframe=(i == 0))
                for i, (y, u, v) in enumerate(frames)]
    finally:
        if disable_native:
            native.get_lib = orig


@pytest.mark.skipif(native.get_lib() is None,
                    reason="native toolchain unavailable")
def test_native_pack_byte_exact_vs_python():
    """Full encode (modes incl. B_PRED/SPLITMV/NEW/NEAR/ZERO + tokens,
    2 token partitions) must produce identical bytes through the C++ and
    Python pack paths."""
    rng = np.random.RandomState(7)
    w, h = 80, 64
    frames = _frames(rng, w, h, 4)
    a = _encode(frames, w, h, True, qindex=20, token_parts=1, cpu_used=0)
    b = _encode(frames, w, h, False, qindex=20, token_parts=1, cpu_used=0)
    assert a == b
    # the streams decode bit-exactly through the golden decoder
    from libvpx_opencl_tpu.models.refdec import RefDecoder
    dec = RefDecoder()
    for p in b:
        dec.decode_frame(p)


@pytest.mark.skipif(native.get_lib() is None,
                    reason="native toolchain unavailable")
def test_native_pack_segmentation():
    """Per-MB segment-map writing goes through the native mode pack."""
    rng = np.random.RandomState(3)
    w, h = 64, 48
    frames = _frames(rng, w, h, 2)
    segmap = (np.arange((h // 16) * (w // 16)) % 4).reshape(h // 16, w // 16)

    def run(disable):
        if disable:
            orig = native.get_lib
            native.get_lib = lambda: None
        try:
            enc = Encoder(w, h, qindex=30)
            enc.set_roimap(segmap, [4, 0, -4, 8], [0, 0, 0, 0])
            return [enc.encode_frame(y, u, v, keyframe=(i == 0))
                    for i, (y, u, v) in enumerate(frames)]
        finally:
            if disable:
                native.get_lib = orig

    assert run(True) == run(False)
