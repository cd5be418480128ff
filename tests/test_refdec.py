"""Golden NumPy decoder conformance: bit-exact vs reference vpxdec --md5.

These MD5s were produced by the reference decoder (vpxdec --md5 --i420,
reference vpxdec.c:94-96,322-371) on the committed IVF streams — the same
conformance oracle the reference project uses (SURVEY.md §4.1).
"""
import pytest

from conftest import vector
from libvpx_opencl_tpu.models.refdec import decode_ivf
from libvpx_opencl_tpu.utils.md5 import frame_md5, load_golden_md5s

STREAMS = ["kf_qcif", "kf_cif", "inter_qcif", "inter_cif", "part4_cif",
           "odd_65x49", "lowrate_qcif", "profile1_qcif", "profile2_qcif",
           "profile3_qcif", "seg_roi_qcif"]


@pytest.mark.parametrize("name", STREAMS)
def test_refdec_bit_exact(name):
    golden = load_golden_md5s(vector(f"{name}.ivf.md5"))
    n = 0
    for i, (y, u, v) in enumerate(decode_ivf(vector(f"{name}.ivf"))):
        assert frame_md5(y, u, v) == golden[i], f"{name} frame {i}"
        n += 1
    assert n == len(golden)
