"""Rate control (host layer).

The reference's rate control (vp8/encoder/ratectrl.c) sets a per-frame bit
target from the buffer model and regulates Q via per-frame correction
factors (vp8_regulate_q ratectrl.c:1241, correction update :1137).  This
module implements the same control structure in compact form: a leaky
buffer model, a Q<->bits-per-MB estimate updated by measured output, and
keyframe boost, driving the Encoder's per-frame qindex.
"""
from __future__ import annotations


class RateController:
    def __init__(self, target_bitrate_kbps, fps, mb_count,
                 min_q=4, max_q=63 * 2 + 1):
        self.target_bits_per_frame = target_bitrate_kbps * 1000 / fps
        self.mb_count = mb_count
        self.min_q = min_q
        self.max_q = min(127, max_q)
        # correction factor: measured_bits = est_bits(q) * factor
        self.correction = 1.0
        self.kf_boost = 2.0
        self.buffer = 0.0  # bits ahead (+) / behind (-) of target

    def _est_bits(self, q):
        """Rough bits-per-frame estimate at quantizer index q (the role of
        vp8_bits_per_mb lookups in ratectrl.c)."""
        # inverse relation to the ac quantizer step
        from ..ops import tables as T
        step = int(T.AC_QLOOKUP[min(127, max(0, q))])
        return self.mb_count * (250.0 * 16.0 / step) * self.correction

    def frame_q(self, keyframe):
        target = self.target_bits_per_frame
        # soft buffer feedback
        target -= 0.1 * self.buffer
        if keyframe:
            target *= self.kf_boost
        best_q = self.max_q
        for q in range(self.min_q, self.max_q + 1):
            if self._est_bits(q) <= target:
                best_q = q
                break
        return best_q

    def update(self, q, used_bits, keyframe):
        est = self._est_bits(q)
        if est > 0:
            ratio = used_bits / est
            # exponential update of the correction factor (ratectrl.c:1137)
            self.correction = min(10.0, max(0.05,
                                            self.correction * (0.9 + 0.1 * ratio)))
        target = self.target_bits_per_frame * (self.kf_boost if keyframe
                                               else 1.0)
        self.buffer += used_bits - self.target_bits_per_frame
        # clamp runaway buffer
        self.buffer = min(self.buffer, 4 * self.target_bits_per_frame)
        self.buffer = max(self.buffer, -4 * self.target_bits_per_frame)
