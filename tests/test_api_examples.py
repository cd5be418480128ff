"""Public API layer + example workflows."""
import os
import sys

import numpy as np

from conftest import vector

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))


def test_decode_to_md5_example_matches_golden():
    import decode_to_md5
    from libvpx_opencl_tpu.utils.md5 import load_golden_md5s
    got = decode_to_md5.main(vector("kf_qcif.ivf"))
    assert got == load_golden_md5s(vector("kf_qcif.ivf.md5"))


def test_simple_decoder_example(tmp_path):
    import simple_decoder
    n = simple_decoder.main(vector("inter_qcif.ivf"),
                            str(tmp_path / "out.i420"))
    assert n == 10


def test_simple_encoder_example(tmp_path):
    import simple_encoder
    from libvpx_opencl_tpu.utils.y4m import write_y4m
    rng = np.random.RandomState(0)
    frames = [(rng.randint(0, 255, (64, 96), np.uint8).astype(np.uint8),
               np.full((32, 48), 128, np.uint8),
               np.full((32, 48), 128, np.uint8)) for _ in range(3)]
    y4m = str(tmp_path / "in.y4m")
    write_y4m(y4m, frames, 96, 64)
    n = simple_encoder.main(y4m, str(tmp_path / "out.ivf"))
    assert n == 3


def test_postproc_api():
    from libvpx_opencl_tpu.api import (CodecDecoder, PostProcCfg,
                                       USE_POSTPROC)
    from libvpx_opencl_tpu.utils.ivf import read_ivf
    dec = CodecDecoder(flags=(USE_POSTPROC,), use_tpu=False)
    dec.set_postproc(PostProcCfg(flags={"deblock"}))
    n = 0
    for payload, _ in read_ivf(vector("kf_qcif.ivf")).frames:
        dec.decode(payload)
        for y, u, v in dec.get_frame():
            assert y.shape == (144, 176)
            n += 1
    assert n == 3


def test_get_set_reference():
    from libvpx_opencl_tpu.api import CodecDecoder
    from libvpx_opencl_tpu.utils.ivf import read_ivf
    dec = CodecDecoder(use_tpu=False)
    frames = read_ivf(vector("inter_qcif.ivf")).frames
    dec.decode(frames[0][0])
    list(dec.get_frame())
    snap = dec.get_reference("last")
    dec.decode(frames[1][0])
    list(dec.get_frame())
    after = dec.get_reference("last")
    assert not np.array_equal(snap[0], after[0])
    dec.set_reference("last", snap)
    back = dec.get_reference("last")
    assert np.array_equal(snap[0], back[0])


def test_input_fragments():
    from libvpx_opencl_tpu.api import CodecDecoder, USE_INPUT_FRAGMENTS
    from libvpx_opencl_tpu.utils.ivf import read_ivf
    from libvpx_opencl_tpu.utils.md5 import frame_md5, load_golden_md5s
    dec = CodecDecoder(flags=(USE_INPUT_FRAGMENTS,), use_tpu=False)
    golden = load_golden_md5s(vector("kf_qcif.ivf.md5"))
    got = []
    for payload, _ in read_ivf(vector("kf_qcif.ivf")).frames:
        half = len(payload) // 2
        dec.decode(payload[:half])
        dec.decode(payload[half:])
        dec.decode(None)
        for y, u, v in dec.get_frame():
            got.append(frame_md5(y, u, v))
    assert got == golden
