"""Shard-count invariance: the row-sharded multi-chip decoder must be
MD5-identical to the reference vpxdec for every shard count (SURVEY.md §4
multi-chip test plan; VERDICT r1 item 2).

Runs on the virtual 8-device CPU mesh (conftest). Covers the cross-shard
halo machinery end to end: intra strip ppermutes, loop-filter 4-px halo
down, U-seam edits up, all-gathered reference planes, grid padding for
non-divisible MB row counts (QCIF has 9 rows).
"""
import pytest

from conftest import vector
from libvpx_opencl_tpu.parallel.sharded_decode import (ShardedTPUDecoder,
                                                       make_row_mesh)
from libvpx_opencl_tpu.utils.ivf import read_ivf
from libvpx_opencl_tpu.utils.md5 import frame_md5, load_golden_md5s

# kf_qcif: keyframe, B_PRED, normal LF; inter_qcif: inter MC + SPLITMV;
# seg_roi: segmentation LF deltas; profile1: bilinear + simple LF
STREAMS = ["kf_qcif", "inter_qcif", "seg_roi_qcif", "profile1_qcif"]


def _decode_sharded(name, n_devices, limit=None):
    stream = read_ivf(vector(f"{name}.ivf"))
    dec = ShardedTPUDecoder(mesh=make_row_mesh(n_devices))
    out = []
    for payload, _pts in stream.frames:
        show, planes = dec.decode_frame(payload)
        if show:
            out.append(frame_md5(*planes))
        if limit and len(out) >= limit:
            break
    return out


@pytest.mark.parametrize("n", [1, 2, 4, 8])
def test_shard_invariance_kf(n):
    golden = load_golden_md5s(vector("kf_qcif.ivf.md5"))
    got = _decode_sharded("kf_qcif", n)
    assert got == golden[:len(got)] and len(got) == len(golden)


@pytest.mark.parametrize("name", STREAMS)
def test_sharded_bit_exact_4dev(name):
    golden = load_golden_md5s(vector(f"{name}.ivf.md5"))
    got = _decode_sharded(name, 4)
    assert got == golden[:len(got)] and len(got) == len(golden), name


@pytest.mark.parametrize("name", ["part4_cif", "inter_cif"])
def test_sharded_bit_exact_cif_8dev(name):
    """CIF geometry (18 MB rows) + the 4-token-partition stream across
    the full 8-way mesh (VERDICT r2 item 8: scale past QCIF)."""
    golden = load_golden_md5s(vector(f"{name}.ivf.md5"))
    got = _decode_sharded(name, 8)
    assert got == golden[:len(got)] and len(got) == len(golden), name


def test_sharded_bit_exact_odd_dims():
    """65x49 (non-multiple-of-16) on a 4-way mesh: grid padding +
    visible-area cropping across shard boundaries."""
    golden = load_golden_md5s(vector("odd_65x49.ivf.md5"))
    got = _decode_sharded("odd_65x49", 4)
    assert got == golden[:len(got)] and len(got) == len(golden)


def test_gop_axis_two_level_mesh():
    """('gop','row') mesh drives real work: 2 gop groups x 4 row shards
    decode two different streams concurrently, both MD5-exact
    (VERDICT r2 weak #6: the gop axis must be used by a pipeline)."""
    from libvpx_opencl_tpu.parallel.gop import decode_streams
    names = ["kf_qcif", "inter_qcif"]
    streams = [[p for p, _ in read_ivf(vector(f"{n}.ivf")).frames]
               for n in names]
    results = decode_streams(streams, n_devices=8, gop=2)
    for name, frames in zip(names, results):
        golden = load_golden_md5s(vector(f"{name}.ivf.md5"))
        got = [frame_md5(*planes) for planes in frames]
        assert got == golden[:len(got)] and len(got) == len(golden), name
