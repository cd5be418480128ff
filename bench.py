#!/usr/bin/env python3
"""Headline benchmark: bit-exact 1080p VP8 decode throughput on one TPU chip.

Workload: tests/vectors/bench_1080p.ivf (30 frames, 1 keyframe + 29 inter,
synthesized clip encoded by the reference vpxenc — see BASELINE.md).
Baseline: the reference vpxdec on one CPU core decodes this stream at
19.6 fps (median of 3 runs, generic C build; x86 asm cannot be assembled in
this image — no yasm/nasm).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Correctness is gated: every frame's MD5 must match the reference decoder's
golden output or the benchmark reports failure.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 19.6


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(__file__),
                                       ".jax_cache"))
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from libvpx_opencl_tpu.models.tpu_decoder import TPUDecoder
    from libvpx_opencl_tpu.utils.ivf import read_ivf
    from libvpx_opencl_tpu.utils.md5 import frame_md5, load_golden_md5s

    here = os.path.dirname(os.path.abspath(__file__))
    ivf = os.path.join(here, "tests", "vectors", "bench_1080p.ivf")
    stream = read_ivf(ivf)
    golden = load_golden_md5s(ivf + ".md5")

    # warmup: decode the whole stream once so every program variant
    # (keyframe/inter, coefficient/SPLITMV bucket sizes) is compiled
    warm = TPUDecoder()
    for payload, _pts in stream.frames:
        warm.decode_frame_core(payload)
    warm.frame_to_show.visible()
    del warm

    # Timed region matches the reference baseline's semantics
    # (`vpxdec --noblit --summary`, vpxdec.c:82: decode only, no output
    # write, no checksum in the timed loop): every frame is fully decoded
    # and device-resident when the clock stops.  Bit-exactness is then
    # verified on every frame (hard gate) outside the clock, exactly like
    # `vpxdec --md5` is a separate invocation from the --summary timing.
    #
    # The decode runs RUNS times and the MEDIAN fps is reported: the
    # host<->TPU tunnel in this environment has 1.3-1.9x run-to-run
    # variance (BASELINE.md round-3/4 ledgers), so a single run is not a
    # result.  Per-run numbers go to stderr for the ledger.
    import jax as _jax
    RUNS = int(os.environ.get("BENCH_RUNS", "5"))
    run_fps = []
    md5s = []
    for run in range(RUNS):
        dec = TPUDecoder()
        shown = []
        t0 = time.time()
        for payload, _pts in stream.frames:
            show = dec.decode_frame_core(payload)
            shown.append(dec.frame_to_show if show else None)
        last = shown[-1]
        _jax.block_until_ready((last.y, last.u, last.v))
        dt = time.time() - t0
        if run == 0:
            for fr in shown:
                if fr is not None:
                    md5s.append(frame_md5(*fr.visible()))
        nf = sum(1 for fr in shown if fr is not None)
        run_fps.append(nf / dt)
        print(f"run {run}: {nf / dt:.2f} fps ({dt * 1000 / nf:.1f} ms/f)",
              file=sys.stderr)
        del dec

    n = len(md5s)
    bit_exact = md5s == golden[:n] and n == len(golden)
    med = sorted(run_fps)[len(run_fps) // 2]
    print(f"median of {RUNS}: {med:.2f} fps "
          f"(min {min(run_fps):.2f}, max {max(run_fps):.2f})",
          file=sys.stderr)
    fps = med if bit_exact else 0.0
    print(json.dumps({
        "metric": "1080p_decode_fps_bit_exact",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))
    if not bit_exact:
        print(f"FAIL: decode not bit-exact ({n} frames)", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
