"""Error concealment: corrupt/truncated frames conceal instead of failing."""
import numpy as np

from conftest import vector
from libvpx_opencl_tpu.api import (CodecDecoder, USE_ERROR_CONCEALMENT)
from libvpx_opencl_tpu.utils.ivf import read_ivf


def test_concealment_on_truncated_frame():
    frames = read_ivf(vector("inter_qcif.ivf")).frames
    dec = CodecDecoder(flags=(USE_ERROR_CONCEALMENT,), use_tpu=False)
    dec.decode(frames[0][0])
    ok = list(dec.get_frame())
    assert not dec.get_frame_corrupted()
    # severely truncate an inter frame: decoder must conceal + flag
    dec.decode(frames[1][0][:4])
    concealed = list(dec.get_frame())
    assert dec.get_frame_corrupted()
    assert len(concealed) == 1
    # concealed frame == previous reference
    assert np.array_equal(concealed[0][0], ok[0][0])
    # subsequent intact frames keep decoding
    dec.decode(frames[2][0])
    nxt = list(dec.get_frame())
    assert len(nxt) == 1
