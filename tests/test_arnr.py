"""ARNR temporal filter + altref: quality gain and conformance."""
import os
import subprocess

import numpy as np
import pytest

from libvpx_opencl_tpu.models.arnr import (synthesize_altref,
                                           encode_sequence_altref)
from libvpx_opencl_tpu.models.encoder import Encoder
from libvpx_opencl_tpu.models.refdec import RefDecoder
from test_encoder import synth, psnr

VPXDEC = os.environ.get("REF_BUILD", "/tmp/vpxsrc") + "/vpxdec"


def noisy_synth(w, h, n, seed=3, sigma=6.0):
    """Static textured scene + temporal noise: the ARNR sweet spot —
    intra cannot predict the texture, LAST carries 2 frames' noise, the
    denoised altref carries almost none."""
    rng = np.random.RandomState(seed)
    base = rng.randint(40, 216, size=(h, w)).astype(np.float32)
    base_u = rng.randint(90, 166, size=(h // 2, w // 2)).astype(np.float32)
    base_v = rng.randint(90, 166, size=(h // 2, w // 2)).astype(np.float32)
    frames = []
    for t in range(n):
        y = np.clip(base + rng.normal(0, sigma, (h, w)),
                    0, 255).astype(np.uint8)
        u = np.clip(base_u + rng.normal(0, sigma / 2, (h // 2, w // 2)),
                    0, 255).astype(np.uint8)
        v = np.clip(base_v + rng.normal(0, sigma / 2, (h // 2, w // 2)),
                    0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def _decode_all(payloads, w, h):
    dec = type("D", (RefDecoder,), {"use_native": True})()
    shown = []
    for p in payloads:
        show, planes = dec.decode_frame(p)
        if show:
            shown.append(tuple(x.copy() for x in planes))
    return shown


def test_synthesize_altref_denoises():
    w, h = 176, 144
    frames = noisy_synth(w, h, 9)
    ay, au, av = synthesize_altref(frames, 4, strength=6, max_frames=5)
    clean = np.random.RandomState(3).randint(
        40, 216, size=(h, w)).astype(np.float32)
    # the filtered anchor must be closer to the noise-free scene than the
    # raw anchor frame is
    raw_err = float(np.abs(frames[4][0].astype(np.float32) - clean).mean())
    flt_err = float(np.abs(ay.astype(np.float32) - clean).mean())
    assert flt_err < raw_err


def test_altref_stream_decodes_and_gains():
    w, h, n = 176, 144, 17
    frames = noisy_synth(w, h, n)
    q = 50
    # plain encode at fixed Q
    enc0 = Encoder(w, h, qindex=q, rd=False)
    plain = [enc0.encode_frame(y, u, v) for (y, u, v) in frames]
    # altref encode at the same Q
    enc1 = Encoder(w, h, qindex=q, rd=False)
    arf = encode_sequence_altref(enc1, None, frames, gf_interval=8)
    shown0 = _decode_all(plain, w, h)
    shown1 = _decode_all(arf, w, h)
    assert len(shown0) == len(shown1) == n   # ARF frames are invisible
    p0 = np.mean([psnr(f[0], d[0]) for f, d in zip(frames, shown0)])
    p1 = np.mean([psnr(f[0], d[0]) for f, d in zip(frames, shown1)])
    s0 = sum(len(p) for p in plain)
    s1 = sum(len(p) for p in arf)
    # RD gain: at the same Q the altref stream must be meaningfully
    # smaller without losing quality (denoised prediction), or better in
    # PSNR at no size cost
    assert (s1 < s0 and p1 > p0 - 0.15) or (p1 > p0 + 0.2 and s1 < s0 * 1.02), \
        f"no ARNR gain: {s0}B/{p0:.2f}dB -> {s1}B/{p1:.2f}dB"


@pytest.mark.skipif(not os.path.exists(VPXDEC),
                    reason="reference vpxdec not built")
def test_altref_stream_reference_conformance(tmp_path):
    """Streams with altref in play must decode bit-exact in the reference
    vpxdec (VERDICT round-2 'done' criterion for ARNR)."""
    from libvpx_opencl_tpu.utils.ivf import IvfStream, write_ivf
    from libvpx_opencl_tpu.utils.md5 import frame_md5
    w, h, n = 176, 144, 12
    frames = noisy_synth(w, h, n)
    enc = Encoder(w, h, qindex=44, rd=False)
    payloads = encode_sequence_altref(enc, None, frames, gf_interval=6)
    stream = IvfStream(width=w, height=h)
    for i, p in enumerate(payloads):
        stream.frames.append((p, i))
    ivf = tmp_path / "arf.ivf"
    write_ivf(str(ivf), stream)
    out = subprocess.run(
        [VPXDEC, "--md5", "--i420", "-o", "f-%4.md5", str(ivf)],
        capture_output=True, check=True, text=True, cwd=str(tmp_path))
    ref_md5 = [line.split()[0] for line in out.stdout.splitlines()
               if line.strip()]
    ours = [frame_md5(*planes) for planes in _decode_all(payloads, w, h)]
    assert ref_md5 == ours
