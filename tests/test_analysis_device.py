"""Differential tests: device analysis kernels (ops/analysis_device.py)
vs their host twins (models/me_host.py, models/arnr.py, ops/metrics.py).
ref: vp8/encoder/{variance_c.c,ssim.c,temporal_filter.c,firstpass.c}."""
import numpy as np
import pytest

from libvpx_opencl_tpu.models import arnr, me_host
from libvpx_opencl_tpu.ops import analysis_device as AD
from libvpx_opencl_tpu.ops import metrics


@pytest.fixture(scope="module")
def planes():
    rng = np.random.RandomState(11)
    h, w = 96, 128
    a = rng.randint(0, 255, size=(h, w)).astype(np.uint8)
    b = np.roll(a, (2, -3), (0, 1)).copy()
    b[40:56, 40:56] = rng.randint(0, 255, size=(16, 16))
    return a, b


def test_fullpel_match_device_exact(planes):
    a, b = planes
    dy, dx, sse, zsse = me_host.fullpel_match(a, b, 7)
    ddy, ddx, dsse, dzsse = [np.asarray(x) for x in
                             AD.fullpel_match_device(a, b, 7)]
    np.testing.assert_array_equal(dy, ddy)
    np.testing.assert_array_equal(dx, ddx)
    np.testing.assert_array_equal(sse, dsse)
    np.testing.assert_array_equal(zsse, dzsse)


def test_temporal_filter_apply_device_exact(planes):
    a, b = planes
    accum = np.zeros(a.shape, np.int32)
    count = np.zeros(a.shape, np.int32)
    w = np.full(a.shape, 2, np.int32)
    arnr._weighted_accumulate(a, b, 6, w, accum, count)
    da, dc = AD.temporal_filter_apply_device(
        a, b, 6, w, np.zeros(a.shape, np.int32),
        np.zeros(a.shape, np.int32))
    np.testing.assert_array_equal(accum, np.asarray(da))
    np.testing.assert_array_equal(count, np.asarray(dc))
    out = AD.temporal_filter_normalize_device(da, dc, a)
    cnt1 = np.maximum(count, 1)
    ref = np.where(count > 0, (accum + (cnt1 >> 1)) // cnt1, a)
    np.testing.assert_array_equal(ref.astype(np.uint8), np.asarray(out))


def test_variance_blocks_device(planes):
    a, b = planes
    sse_d, var_d = [np.asarray(x) for x in AD.variance_blocks_device(a, b)]
    R, C = a.shape[0] // 16, a.shape[1] // 16
    d = a.astype(np.int64) - b.astype(np.int64)
    db = d.reshape(R, 16, C, 16)
    s = db.sum((1, 3))
    sse = (db * db).sum((1, 3))
    var = sse - ((s * s) >> 8)
    np.testing.assert_array_equal(sse.astype(np.int32), sse_d)
    np.testing.assert_array_equal(var.astype(np.int32), var_d)


def test_ssim_plane_device(planes):
    a, b = planes
    host = metrics.ssim_plane(a, b)
    dev = float(AD.ssim_plane_device(a, b))
    assert abs(host - dev) < 1e-5


def test_synthesize_altref_device_matches_host():
    rng = np.random.RandomState(5)
    h, w = 48, 64
    frames = []
    base = rng.randint(0, 255, size=(h, w)).astype(np.uint8)
    for t in range(5):
        y = np.roll(base, t, axis=1)
        u = rng.randint(90, 170, size=(h // 2, w // 2)).astype(np.uint8)
        v = np.full((h // 2, w // 2), 120, np.uint8)
        frames.append((y, u, v))
    host = arnr.synthesize_altref(frames, 2)
    dev = arnr.synthesize_altref(frames, 2, device=True)
    for hp, dp in zip(host, dev):
        np.testing.assert_array_equal(hp, np.asarray(dp))
