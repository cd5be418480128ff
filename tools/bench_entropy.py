#!/usr/bin/env python3
"""Measure on-device token decode (ops/entropy_device.py) vs the host
C++ detokenizer on a conformance stream.

The serial arithmetic decoder maps to the TPU scalar core; this tool
records the honest comparison for BASELINE.md (the reference's OpenCL
fork likewise kept entropy on the CPU — vp8/decoder/ has no CL
detokenizer).

Usage: python tools/bench_entropy.py [stream.ivf] [--frames N]
"""
import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stream", nargs="?",
                    default=os.path.join(os.path.dirname(HERE), "tests",
                                         "vectors", "part4_cif.ivf"))
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(HERE), ".jax_cache"))
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    from libvpx_opencl_tpu.models.refdec import RefDecoder, B_PRED, SPLITMV
    from libvpx_opencl_tpu.ops.entropy_device import detokenize_frame_device
    from libvpx_opencl_tpu.utils.ivf import read_ivf

    host_ms = []
    dev_ms = []
    upload_bytes = []

    class Probe(RefDecoder):
        use_native = True

        def _detokenize_all(self):
            R, C = self.mb_rows, self.mb_cols
            P = len(self.bool_parts)
            bufs_np = [np.frombuffer(p.buf, np.uint8)
                       for p in self.bool_parts]
            L = max(len(b) for b in bufs_np)
            bufs = np.zeros((P, L), np.uint8)
            for i, b in enumerate(bufs_np):
                bufs[i, :len(b)] = b
            blens = np.asarray([len(b) for b in bufs_np], np.int32)
            states0 = np.tile(np.asarray([0, 255, -8, 0], np.int32),
                              (P, 1))
            modes = self.mode[1:, 1:].reshape(-1)
            has_y2 = ~np.isin(modes, (B_PRED, SPLITMV))
            skip_in = self.skip.reshape(-1).astype(np.int32).copy()
            probs = np.asarray(self.fc.coef_probs, np.int32)

            t0 = time.perf_counter()
            super()._detokenize_all()          # host C++ path
            host_ms.append((time.perf_counter() - t0) * 1000)

            t0 = time.perf_counter()
            out = detokenize_frame_device(
                R, C, P, jnp.asarray(bufs), jnp.asarray(blens),
                jnp.asarray(states0), jnp.asarray(probs),
                jnp.asarray(has_y2), jnp.asarray(skip_in))
            jax.block_until_ready(out)
            dev_ms.append((time.perf_counter() - t0) * 1000)
            upload_bytes.append(bufs.nbytes)

    stream = read_ivf(args.stream)
    dec = Probe()
    for payload, _ in stream.frames[:args.frames]:
        dec.decode_frame(payload)

    # first device call includes compile; report the rest
    print(f"stream: {args.stream} ({len(host_ms)} frames, "
          f"{dec.mb_rows}x{dec.mb_cols} MBs, "
          f"{len(dec.bool_parts)} partitions)")
    print(f"host C++ detokenize : "
          f"{np.median(host_ms):8.2f} ms/frame (median)")
    if len(dev_ms) > 1:
        print(f"device scan        : "
              f"{np.median(dev_ms[1:]):8.2f} ms/frame "
              f"(median, compile excluded; first={dev_ms[0]:.0f} ms)")
    print(f"token partition upload: {np.median(upload_bytes)/1024:.1f} KB "
          f"(vs the ~0.8 MB/frame 1080p coefficient upload this replaces)")


if __name__ == "__main__":
    main()
