#!/usr/bin/env python3
"""Generate the conformance test-vector corpus for the TPU VP8 engine.

Synthesizes deterministic YUV420 clips, encodes them with the *reference*
vpxenc (awatry/libvpx.opencl, built at /tmp/vpxsrc), and records golden
per-frame MD5s from the reference `vpxdec --md5` (the conformance oracle,
see /root/reference/vpxdec.c:94-96,322-371 and SURVEY.md §4.1).

The resulting .ivf streams + .md5 files are committed under tests/vectors/
so the test suite is self-contained; this script documents their provenance
and regenerates them if the reference binaries are available.
"""
import hashlib
import os
import subprocess
import sys

import numpy as np

REF = os.environ.get("REF_BUILD", "/tmp/vpxsrc")
VPXENC = os.path.join(REF, "vpxenc")
VPXDEC = os.path.join(REF, "vpxdec")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "vectors")


def synth_clip(w, h, n_frames, seed=0):
    """Deterministic synthetic video: moving gradient + blocks + texture.

    Designed to exercise intra modes (smooth gradients -> DC/TM/V/H),
    inter motion (translating features -> non-zero MVs incl. subpel),
    and high-frequency texture (noise patches -> many coefficients).
    """
    rng = np.random.RandomState(seed)
    tex = rng.randint(0, 256, size=(h * 2, w * 2), dtype=np.uint8)
    frames = []
    yy, xx = np.mgrid[0:h, 0:w]
    for t in range(n_frames):
        # moving diagonal gradient
        y = ((xx * 0.7 + yy * 0.3 + t * 3.7) % 255).astype(np.uint8)
        # translating textured square (fractional-ish motion via phase)
        ox, oy = (t * 5) % w, (t * 3) % h
        sq = tex[oy:oy + h, ox:ox + w][:h, :w]
        mask = ((xx // 32 + yy // 32 + t // 2) % 3) == 0
        y = np.where(mask, sq[:h, :w], y).astype(np.uint8)
        # a hard edge that moves (loop filter stress)
        y[:, (t * 7) % max(1, w - 8):(t * 7) % max(1, w - 8) + 4] = 235
        u = ((xx[::2, ::2] + t * 2) % 255).astype(np.uint8)
        v = ((yy[::2, ::2] * 2 - t * 5) % 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def write_y4m(path, frames, w, h, fps=(30, 1)):
    with open(path, "wb") as f:
        f.write(b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420jpeg\n" % (w, h, *fps))
        for y, u, v in frames:
            f.write(b"FRAME\n")
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write(v.tobytes())


def run(cmd):
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        print("FAILED:", " ".join(cmd), file=sys.stderr)
        print(r.stderr, file=sys.stderr)
        sys.exit(1)
    return r


def golden_md5(ivf):
    """Per-frame MD5s via the reference decoder (vpxdec --md5 --i420 -o 'p-%4')."""
    r = run([VPXDEC, "--md5", "--i420", "-o", "fr-%4.md5", ivf])
    lines = [l.split()[0] for l in r.stdout.splitlines() if l.strip()]
    with open(ivf + ".md5", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return lines


def make(name, w, h, n, enc_args, seed=0):
    y4m = f"/tmp/{name}.y4m"
    ivf = os.path.join(OUT, f"{name}.ivf")
    frames = synth_clip(w, h, n, seed)
    write_y4m(y4m, frames, w, h)
    run([VPXENC, "--ivf", "-o", ivf, *enc_args, y4m])
    md5s = golden_md5(ivf)
    print(f"{name}: {os.path.getsize(ivf)} bytes, {len(md5s)} frames")
    return ivf


def main():
    os.makedirs(OUT, exist_ok=True)
    common = ["--good", "--cpu-used=0", "--end-usage=vbr", "--target-bitrate=400",
              "--min-q=4", "--max-q=50", "--lag-in-frames=0", "--passes=1"]
    # config 1: keyframe-only CIF (intra + IDCT + LF only)
    make("kf_cif", 352, 288, 5, common + ["--kf-min-dist=0", "--kf-max-dist=1"])
    # small keyframe-only for fast unit tests
    make("kf_qcif", 176, 144, 3, common + ["--kf-min-dist=0", "--kf-max-dist=1"], seed=1)
    # inter frames with MC (config 2 shape, small res)
    make("inter_qcif", 176, 144, 10, common + ["--kf-max-dist=9999"], seed=2)
    make("inter_cif", 352, 288, 8, common + ["--kf-max-dist=9999"], seed=3)
    # multi-partition + error resilient (config 3 shape)
    make("part4_cif", 352, 288, 6, common + ["--token-parts=2", "--error-resilient=1"], seed=4)
    # odd dimensions (border/partial-MB handling)
    make("odd_65x49", 66, 50, 4, common + ["--kf-max-dist=9999"], seed=5)
    # higher-q stream (dc-only blocks, skip MBs)
    make("lowrate_qcif", 176, 144, 6,
         ["--good", "--cpu-used=0", "--end-usage=vbr", "--target-bitrate=40",
          "--lag-in-frames=0", "--passes=1", "--kf-max-dist=9999"], seed=6)


if __name__ == "__main__":
    main()
