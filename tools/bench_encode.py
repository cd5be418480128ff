#!/usr/bin/env python3
"""Encode throughput benchmark: 720p30 synthetic clip, one TPU chip.

Measures the TPU encoder (device ME/decide/encode/LF pipeline,
models/tpu_encoder.py) against the reference `vpxenc` (generic C build,
single core, $REF_BUILD or /tmp/vpxsrc) on the same content at the same
fixed quantizer, reporting fps, bytes and PSNR for both so quality and
speed are compared on equal footing (BASELINE.md config-4 metric:
"encode fps at matched PSNR/bitrate").

Usage: python tools/bench_encode.py [--frames 30] [--q 24] [--w 1280 --h 720]
"""
import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

REF = os.environ.get("REF_BUILD", "/tmp/vpxsrc")

# vpxenc CLI quantizer (0-63) -> frame qindex (0-127): q_trans
# (onyx_if.c q_trans[]); inverse used to hand vpxenc our qindex
Q_TRANS = [0, 1, 2, 3, 4, 5, 7, 8, 9, 10, 12, 13, 15, 17, 18, 19,
           20, 21, 23, 24, 25, 26, 27, 28, 29, 30, 31, 33, 35, 37,
           39, 41, 43, 45, 47, 49, 51, 53, 55, 57, 59, 61, 64, 67,
           70, 73, 76, 79, 82, 85, 88, 91, 94, 97, 100, 103, 106,
           109, 112, 115, 118, 121, 124, 127]


def _psnr_stream(ivf_path, frames):
    import numpy as np
    from libvpx_opencl_tpu.models.refdec import RefDecoder
    from libvpx_opencl_tpu.utils.ivf import read_ivf
    dec = type("D", (RefDecoder,), {"use_native": True})()
    acc = []
    for i, (payload, _) in enumerate(read_ivf(ivf_path).frames):
        show, (dy, du, dv) = dec.decode_frame(payload)
        y = frames[i][0].astype(np.float64)
        d = y - dy.astype(np.float64)
        mse = (d * d).mean()
        acc.append(99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse))
    return sum(acc) / len(acc)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--q", type=int, default=24, help="frame qindex")
    ap.add_argument("--w", type=int, default=1280)
    ap.add_argument("--h", type=int, default=720)
    ap.add_argument("--cpu-used", type=int, default=0,
                    help="TPU encoder speed level (SpeedFeatures ladder)")
    ap.add_argument("--skip-ref", action="store_true",
                    help="skip the reference vpxenc rows")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(HERE), ".jax_cache"))
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from make_test_vectors import synth_clip
    from libvpx_opencl_tpu.models.tpu_encoder import TPUEncoder
    from libvpx_opencl_tpu.utils.ivf import IvfStream, write_ivf
    from libvpx_opencl_tpu.utils.y4m import write_y4m

    frames = synth_clip(args.w, args.h, args.frames, seed=42)
    out = {}

    # --- TPU encoder ----------------------------------------------------
    enc = TPUEncoder(args.w, args.h, qindex=args.q,
                     cpu_used=args.cpu_used)
    # warm-up: compile every program variant (KF + inter at reference-
    # ring cardinalities 1/2/3 — refresh flags steer the identity dedup)
    enc.encode_frame(*frames[0], keyframe=True)
    enc.encode_frame(*frames[1], keyframe=False)          # 2 refs
    enc.encode_frame(*frames[2], keyframe=False,
                     refresh_golden=True)                 # gold != alt
    enc.encode_frame(*frames[1], keyframe=False)          # 3 refs
    enc = TPUEncoder(args.w, args.h, qindex=args.q,
                     cpu_used=args.cpu_used)
    t0 = time.time()
    payloads = [enc.encode_frame(*f, keyframe=(i == 0))
                for i, f in enumerate(frames)]
    dt = time.time() - t0
    ivf = "/tmp/bench_enc_tpu.ivf"
    s = IvfStream(width=args.w, height=args.h)
    s.frames = [(p, i) for i, p in enumerate(payloads)]
    write_ivf(ivf, s)
    out[f"tpu_speed{args.cpu_used}"] = {
        "fps": round(len(frames) / dt, 2),
        "bytes": sum(len(p) for p in payloads),
        "psnr_y": round(_psnr_stream(ivf, frames), 2)}

    # --- reference vpxenc (single core, generic C) ----------------------
    vpxenc = os.path.join(REF, "vpxenc")
    if os.path.exists(vpxenc) and not args.skip_ref:
        y4m = "/tmp/bench_enc.y4m"
        write_y4m(y4m, frames, args.w, args.h)
        cli_q = min(range(64), key=lambda i: abs(Q_TRANS[i] - args.q))

        def ref_row(tag, extra):
            ivf_p = f"/tmp/bench_enc_{tag}.ivf"
            cmd = [vpxenc, "--codec=vp8", "-o", ivf_p, y4m, "--ivf",
                   "--end-usage=0", "--target-bitrate=8000",
                   f"--min-q={cli_q}", f"--max-q={cli_q}",
                   "--kf-max-dist=9999", "--passes=1", "--threads=1",
                   "-t", "1"] + extra
            t0 = time.time()
            subprocess.run(cmd, check=True, capture_output=True)
            dt = time.time() - t0
            out[f"ref_vpxenc_{tag}"] = {
                "fps": round(len(frames) / dt, 2),
                "bytes": os.path.getsize(ivf_p) - 32 - 12 * len(frames),
                "psnr_y": round(_psnr_stream(ivf_p, frames), 2)}

        # quality-matched point for our speed-0 (vpxenc's best quality)
        ref_row("good0", ["--good", "--cpu-used=0"])
        ref_row("good4", ["--good", "--cpu-used=4"])
        # realtime speed point (the fork's fastest honest CPU config)
        ref_row("rt8", ["--rt", "--cpu-used=8"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
