"""Multi-chip MB-row-sharded encoder: payloads must be BIT-IDENTICAL to
the single-chip TPUEncoder under the same SpeedFeatures (bpred=False)
for every shard count — the encoder twin of test_sharded_decode's
shard-count-invariance gate.  ref: vp8/encoder/ethreading.c:60-126."""
from dataclasses import replace

import numpy as np
import pytest

from libvpx_opencl_tpu.models.tpu_encoder import TPUEncoder
from libvpx_opencl_tpu.parallel.sharded_encode import ShardedTPUEncoder
from libvpx_opencl_tpu.parallel.sharded_decode import make_row_mesh


def _frames(w, h, n):
    rng = np.random.RandomState(9)
    base = rng.randint(0, 255, size=(h, w)).astype(np.uint8)
    base[: h // 2, : w // 2] = 128
    out = []
    for t in range(n):
        y = np.roll(base, 2 * t, axis=1).copy()
        y[h - 16:, :16] = rng.randint(0, 255, size=(16, 16))
        u = rng.randint(90, 170, size=(h // 2, w // 2)).astype(np.uint8)
        v = np.full((h // 2, w // 2), 120, np.uint8)
        out.append((y, u, v))
    return out


def _encode_all(enc, frames):
    return [enc.encode_frame(y, u, v, keyframe=(i == 0))
            for i, (y, u, v) in enumerate(frames)]


@pytest.mark.parametrize("n_shards", [4, 8])
def test_sharded_encode_bit_exact(n_shards):
    w, h = 176, 128          # R=8 MB rows: divisible by 4 and 8
    frames = _frames(w, h, 3)
    ref = TPUEncoder(w, h, qindex=40, cpu_used=7)
    ref.sf = replace(ref.sf, bpred=False)
    want = _encode_all(ref, frames)

    mesh = make_row_mesh(n_shards)
    enc = ShardedTPUEncoder(w, h, qindex=40, cpu_used=7, mesh=mesh)
    got = _encode_all(enc, frames)
    assert [len(p) for p in got] == [len(p) for p in want]
    assert got == want


def test_sharded_encode_bit_exact_trellis_multiref():
    """RD + trellis + multi-ref ladder (cpu_used=2, bpred forced off)
    through the sharded programs, with a golden-frame refresh so the
    2-ref decide variant runs."""
    w, h = 176, 128
    frames = _frames(w, h, 4)
    ref = TPUEncoder(w, h, qindex=36, cpu_used=2)
    ref.sf = replace(ref.sf, bpred=False, exhaustive_me=False)
    want = [ref.encode_frame(*frames[0], keyframe=True),
            ref.encode_frame(*frames[1]),
            ref.encode_frame(*frames[2], refresh_golden=True),
            ref.encode_frame(*frames[3])]

    enc = ShardedTPUEncoder(w, h, qindex=36, cpu_used=2,
                            mesh=make_row_mesh(4))
    got = [enc.encode_frame(*frames[0], keyframe=True),
           enc.encode_frame(*frames[1]),
           enc.encode_frame(*frames[2], refresh_golden=True),
           enc.encode_frame(*frames[3])]
    assert got == want
