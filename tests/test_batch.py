"""Batch transcode driver: sharding + checkpoint/resume."""
import json
import os

from conftest import vector
from libvpx_opencl_tpu.parallel.batch import BatchTranscoder


def test_batch_transcode_resume(tmp_path):
    jobs = [vector("kf_qcif.ivf"), vector("lowrate_qcif.ivf")]
    out = str(tmp_path / "out")
    bt = BatchTranscoder(jobs, out, qindex=40)
    state = bt.run()
    assert len(state["done"]) == 2
    assert all(s["frames"] > 0 for s in state["stats"].values())
    # resume: nothing left to do, checkpoint remembered
    bt2 = BatchTranscoder(jobs, out, qindex=40)
    before = json.dumps(bt2.state, sort_keys=True)
    state2 = bt2.run()
    assert json.dumps(state2, sort_keys=True) == before


def test_batch_sharding(tmp_path):
    jobs = [vector("kf_qcif.ivf"), vector("lowrate_qcif.ivf")]
    b0 = BatchTranscoder(jobs, str(tmp_path / "s0"), shard_index=0,
                         shard_count=2)
    b1 = BatchTranscoder(jobs, str(tmp_path / "s1"), shard_index=1,
                         shard_count=2)
    assert b0.jobs == [jobs[0]]
    assert b1.jobs == [jobs[1]]
