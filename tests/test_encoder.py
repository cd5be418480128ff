"""Encoder conformance: round-trip through the (vpxdec-bit-exact) decoder,
closed-loop reference consistency, and quality sanity."""
import os
import subprocess

import numpy as np
import pytest

from conftest import vector  # noqa: F401
from libvpx_opencl_tpu.models.encoder import Encoder
from libvpx_opencl_tpu.models.refdec import RefDecoder
from libvpx_opencl_tpu.utils.ivf import IvfStream, write_ivf
from libvpx_opencl_tpu.utils.md5 import frame_md5


def synth(w, h, n, seed=9):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        y = ((xx + yy + 7 * t) % 220 + 10).astype(np.uint8)
        y[20:60, 30 + 3 * t:70 + 3 * t] = 200
        u = ((xx[::2, ::2] // 2 + t) % 255).astype(np.uint8)
        v = ((yy[::2, ::2] // 2 + 255 - t) % 255).astype(np.uint8)
        out.append((y, u, v))
    return out


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255 ** 2 / mse) if mse > 0 else 99.0


def test_encode_decode_roundtrip():
    frames = synth(176, 144, 4)
    enc = Encoder(176, 144, qindex=24)
    dec = type("D", (RefDecoder,), {"use_native": True})()
    for i, (y, u, v) in enumerate(frames):
        payload = enc.encode_frame(y, u, v)
        show, (dy, du, dv) = dec.decode_frame(payload)
        assert show == 1
        p = psnr(y, dy)
        assert p > 33.0, f"frame {i} PSNR {p}"
    # closed loop: encoder's reference state == independent decode
    ey, eu, ev = enc.dec.frame_to_show.visible()
    assert np.array_equal(ey, dy)


def test_encode_odd_dims():
    frames = synth(66, 50, 3, seed=3)
    enc = Encoder(66, 50, qindex=30)
    dec = type("D", (RefDecoder,), {"use_native": True})()
    for y, u, v in frames:
        payload = enc.encode_frame(y, u, v)
        show, (dy, du, dv) = dec.decode_frame(payload)
        assert dy.shape == (50, 66)
        assert psnr(y, dy) > 30.0


VPXDEC = "/tmp/vpxsrc/vpxdec"


@pytest.mark.skipif(not os.path.exists(VPXDEC),
                    reason="reference vpxdec not built")
def test_reference_vpxdec_accepts_our_stream(tmp_path):
    frames = synth(176, 144, 4)
    enc = Encoder(176, 144, qindex=24)
    dec = type("D", (RefDecoder,), {"use_native": True})()
    stream = IvfStream(width=176, height=144)
    ours = []
    for i, (y, u, v) in enumerate(frames):
        p = enc.encode_frame(y, u, v)
        stream.frames.append((p, i))
        _, planes = dec.decode_frame(p)
        ours.append(frame_md5(*planes))
    ivf = str(tmp_path / "ours.ivf")
    write_ivf(ivf, stream)
    r = subprocess.run([VPXDEC, "--md5", "--i420", "-o", "f-%4.md5", ivf],
                       capture_output=True, text=True, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    ref = [l.split()[0] for l in r.stdout.splitlines() if l.strip()]
    assert ref == ours


def test_splitmv_and_picklpf_roundtrip():
    """SPLITMV encode (rdopt.c:1318 role) + in-encoder LF level search
    (picklpf.c:261 role): divergent intra-MB motion must select SPLITMV,
    and the picked filter level must survive the closed decode loop."""
    rng = np.random.RandomState(1)
    base = (rng.randint(0, 255, (160, 176)) // 2 + 60).astype(np.uint8)

    def frame(t):
        y = np.empty((144, 176), np.uint8)
        y[:72] = base[8 - t:8 - t + 72, :]
        y[72:] = base[8 + t:8 + t + 72, :]
        u = np.full((72, 88), 128, np.uint8)
        return y, u, u.copy()

    from libvpx_opencl_tpu.models.refdec import SPLITMV
    enc = Encoder(176, 144, qindex=50)
    dec = type("D", (RefDecoder,), {"use_native": True})()
    splits = 0
    for t in range(3):
        y, u, v = frame(t)
        payload = enc.encode_frame(y, u, v)
        show, (dy, du, dv) = dec.decode_frame(payload)
        splits += int((enc.mode == SPLITMV).sum())
        assert psnr(y, dy) > 29.0
    assert splits > 0, "divergent-motion clip never chose SPLITMV"
    assert enc.filter_level == enc._picked_level  # picklpf was in charge
    ey, _, _ = enc.dec.frame_to_show.visible()
    assert np.array_equal(ey, dy)


def test_speed_ladder_distinct_levels():
    """--cpu-used ladder (vp8_set_speed_features role): at least three
    distinct effort levels produce valid streams with graded
    size/quality at fixed Q."""
    from libvpx_opencl_tpu.models.encoder import speed_features
    from libvpx_opencl_tpu.models.refdec import RefDecoder
    s0, s4, s9 = speed_features(0), speed_features(4), speed_features(9)
    assert s0 != s4 != s9 and s0 != s9
    assert s0.exhaustive_me and not s4.exhaustive_me
    assert s0.splitmv and not s4.splitmv
    assert s4.rd and not s9.rd

    w, h, n = 176, 144, 4
    frames = synth(w, h, n)
    sizes, psnrs = {}, {}
    for spd in (0, 4, 9):
        enc = Encoder(w, h, qindex=40, cpu_used=spd)
        dec = type("D", (RefDecoder,), {"use_native": True})()
        tot, ps = 0, []
        for y, u, v in frames:
            p = enc.encode_frame(y, u, v)
            tot += len(p)
            show, (dy, du, dv) = dec.decode_frame(p)
            ps.append(psnr(y, dy))
        sizes[spd] = tot
        psnrs[spd] = sum(ps) / len(ps)
    # better effort never loses at fixed Q: size shrinks (or quality
    # rises) going from speed 9 -> 4 -> 0
    assert sizes[0] <= sizes[4] * 1.02, (sizes, psnrs)
    assert sizes[4] <= sizes[9] * 1.02, (sizes, psnrs)
    assert psnrs[0] >= psnrs[9] - 0.3, (sizes, psnrs)


def test_activity_masking_rate_ssim():
    """--tune=ssim activity masking (encodeframe.c:81-357): bigger dead
    zones on high-activity MBs shed bits where the eye can't see them;
    at fixed Q the masked encode must be smaller with (near-)unchanged
    SSIM."""
    from libvpx_opencl_tpu.ops.metrics import ssim_plane
    from libvpx_opencl_tpu.models.refdec import RefDecoder
    w, h, n = 176, 144, 4
    rng = np.random.RandomState(5)
    flat = np.tile(np.linspace(60, 200, w).astype(np.uint8), (h // 2, 1))
    frames = []
    for t in range(n):
        tex = rng.randint(0, 255, (h - h // 2, w)).astype(np.uint8)
        y = np.vstack([flat, tex])
        u = np.full((h // 2, w // 2), 110, np.uint8)
        v = np.full((h // 2, w // 2), 124, np.uint8)
        frames.append((y, u, v))

    def run(tune):
        enc = Encoder(w, h, qindex=40, rd=True)
        enc.tune_ssim = tune
        dec = type("D", (RefDecoder,), {"use_native": True})()
        size, ss = 0, []
        for y, u, v in frames:
            p = enc.encode_frame(y, u, v)
            size += len(p)
            show, (dy, du, dv) = dec.decode_frame(p)
            ss.append(ssim_plane(y, dy))
        return size, float(np.mean(ss))

    size0, ssim0 = run(False)
    size1, ssim1 = run(True)
    assert size1 < size0, (size0, size1)
    assert ssim1 >= ssim0 - 0.004, (ssim0, ssim1, size0, size1)
