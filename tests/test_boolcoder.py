"""Bool coder round-trip: encoder (boolhuff dual) vs decoder (dboolhuff dual).

Also covers the detokenizer's special sign read (read_sign_det) against
bits written with prob 128 — the encoder/decoder pairing the reference
relies on (boolhuff.h vp8_encode_bool vs detokenize.c DECODE_AND_APPLYSIGN).
"""
import numpy as np

from conftest import vector  # noqa: F401
from libvpx_opencl_tpu.models.boolcoder import BoolDecoder
from libvpx_opencl_tpu.models.boolenc import BoolEncoder
from libvpx_opencl_tpu.ops import tables as T


def test_roundtrip_random_probs():
    rng = np.random.RandomState(0)
    for trial in range(20):
        n = rng.randint(1, 2000)
        probs = rng.randint(1, 255, size=n)
        bits = rng.randint(0, 2, size=n)
        enc = BoolEncoder()
        for b, p in zip(bits, probs):
            enc.write(int(b), int(p))
        data = enc.stop()
        dec = BoolDecoder(data)
        for i, (b, p) in enumerate(zip(bits, probs)):
            assert dec.read(int(p)) == b, (trial, i)


def test_roundtrip_literals_and_trees():
    rng = np.random.RandomState(1)
    tree = T.KF_YMODE_TREE.tolist()
    probs = T.KF_YMODE_PROB.tolist()
    vals = rng.randint(0, 5, size=200)
    lits = rng.randint(0, 256, size=200)
    enc = BoolEncoder()
    for v, l in zip(vals, lits):
        enc.write_tree(tree, probs, int(v))
        enc.write_literal(int(l), 8)
    data = enc.stop()
    dec = BoolDecoder(data)
    for v, l in zip(vals, lits):
        assert dec.read_tree(tree, probs) == v
        assert dec.read_literal(8) == l


def test_roundtrip_sign_det():
    """signs written with prob 128 must decode via the detokenizer's
    special sign read (range can transiently hit 256)."""
    rng = np.random.RandomState(2)
    for trial in range(10):
        n = rng.randint(10, 500)
        probs = rng.randint(1, 255, size=n)
        bits = rng.randint(0, 2, size=n)
        is_sign = rng.randint(0, 2, size=n)
        enc = BoolEncoder()
        for b, p, s in zip(bits, probs, is_sign):
            enc.write(int(b), 128 if s else int(p))
        data = enc.stop()
        dec = BoolDecoder(data)
        for i, (b, p, s) in enumerate(zip(bits, probs, is_sign)):
            got = dec.read_sign_det() if s else dec.read(int(p))
            assert got == b, (trial, i)
