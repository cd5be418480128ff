"""On-device entropy decode (SURVEY §7 stage 5): differential MD5-level
gate — the device detokenizer must produce bit-identical qcoeff/eobs/skip
vs the golden Python detokenizer on real conformance streams, including
multi-partition round-robin."""
import numpy as np
import pytest

from conftest import vector
from libvpx_opencl_tpu.models.refdec import RefDecoder, B_PRED, SPLITMV
from libvpx_opencl_tpu.utils.ivf import read_ivf


class _Compare(RefDecoder):
    """Runs the golden detokenizer, then the device scan on the same
    partition buffers, and asserts exact equality every frame."""
    use_native = False
    frames_checked = 0

    def _detokenize_all(self):
        import jax.numpy as jnp
        from libvpx_opencl_tpu.ops.entropy_device import (
            detokenize_frame_device)
        R, C = self.mb_rows, self.mb_cols
        P = len(self.bool_parts)
        bufs_np = [np.frombuffer(p.buf, np.uint8) for p in self.bool_parts]
        L = max(len(b) for b in bufs_np)
        bufs = np.zeros((P, L), np.uint8)
        for i, b in enumerate(bufs_np):
            bufs[i, :len(b)] = b
        blens = np.asarray([len(b) for b in bufs_np], np.int32)
        states0 = np.tile(np.asarray([0, 255, -8, 0], np.int32), (P, 1))
        modes = self.mode[1:, 1:].reshape(-1)
        has_y2 = ~np.isin(modes, (B_PRED, SPLITMV))
        skip_in = self.skip.reshape(-1).astype(np.int32).copy()
        probs = np.asarray(self.fc.coef_probs, np.int32)

        super()._detokenize_all()     # golden fills qcoeff/eobs/skip

        q, e, skipped, _ = detokenize_frame_device(
            R, C, P, jnp.asarray(bufs), jnp.asarray(blens),
            jnp.asarray(states0), jnp.asarray(probs),
            jnp.asarray(has_y2), jnp.asarray(skip_in))
        q = np.asarray(q).reshape(R, C, 25, 16)
        e = np.asarray(e).reshape(R, C, 25)
        sk = np.asarray(skipped).reshape(R, C)
        # non-skip MBs must match exactly; skip MBs carry no tokens
        live = (skip_in.reshape(R, C) == 0)
        assert np.array_equal(q[live], self.qcoeff[live]), \
            f"qcoeff diverged, frame {self.frames_checked}"
        assert np.array_equal(e[live], self.eobs[live]), \
            f"eobs diverged, frame {self.frames_checked}"
        want_skip = self.skip[live]
        assert np.array_equal(sk[live].astype(np.int32) |
                              skip_in.reshape(R, C)[live],
                              want_skip), "skip diverged"
        _Compare.frames_checked += 1


@pytest.mark.parametrize("name", ["inter_qcif", "part4_cif"])
def test_device_detokenize_matches_golden(name):
    _Compare.frames_checked = 0
    dec = _Compare()
    stream = read_ivf(vector(f"{name}.ivf"))
    for payload, _ in stream.frames:
        dec.decode_frame(payload)
    assert _Compare.frames_checked >= 3
