"""TPU-path decoder conformance: bit-exact vs reference vpxdec --md5.

Runs the full device pipeline (batched IDCT/MC + wavefront intra + wavefront
loop filter) on the CPU XLA backend; the same jitted program runs unchanged
on the TPU (bench.py).
"""
import pytest

from conftest import vector
from libvpx_opencl_tpu.models.tpu_decoder import decode_ivf_tpu
from libvpx_opencl_tpu.utils.md5 import frame_md5, load_golden_md5s

# the FULL conformance corpus runs through the device pipeline (VERDICT r1
# item 8: no stream may be CI-exempt from the production path)
STREAMS = ["kf_qcif", "inter_qcif", "odd_65x49", "lowrate_qcif",
           "profile1_qcif", "profile2_qcif", "profile3_qcif",
           "seg_roi_qcif", "kf_cif", "inter_cif", "part4_cif"]


@pytest.mark.parametrize("name", STREAMS)
def test_tpu_decoder_bit_exact(name):
    golden = load_golden_md5s(vector(f"{name}.ivf.md5"))
    n = 0
    for i, (y, u, v) in enumerate(decode_ivf_tpu(vector(f"{name}.ivf"))):
        assert frame_md5(y, u, v) == golden[i], f"{name} frame {i}"
        n += 1
    assert n == len(golden)


def test_dispatch_worker_failure_path():
    """A dispatch-worker exception surfaces exactly once on the next
    sync/pixel access, and the decoder's reference ring stays at the last
    committed frame so the stream keeps decoding (VERDICT r2 weak #10)."""
    import pytest
    from libvpx_opencl_tpu.models.tpu_decoder import TPUDecoder
    from libvpx_opencl_tpu.utils.ivf import read_ivf
    from libvpx_opencl_tpu.utils.md5 import frame_md5, load_golden_md5s
    frames = read_ivf(vector("inter_qcif.ivf")).frames
    golden = load_golden_md5s(vector("inter_qcif.ivf.md5"))
    dec = TPUDecoder()
    dec.decode_frame_core(frames[0][0])
    assert frame_md5(*dec.frame_to_show.visible()) == golden[0]

    real = dec._worker_dispatch

    def boom(np_args, meta):
        raise RuntimeError("injected dispatch failure")

    dec._worker_dispatch = boom
    dec.decode_frame_core(frames[1][0])
    with pytest.raises(RuntimeError, match="injected"):
        dec.frame_to_show.visible()
    # exception is not sticky...
    dec._worker_dispatch = real
    # ...but frame 1's device work never ran, so re-sync and re-feed:
    # the ring still holds frame 0; redecoding frame 1 must be exact
    dec.decode_frame_core(frames[1][0])
    assert frame_md5(*dec.frame_to_show.visible()) == golden[1]
