#!/usr/bin/env python3
"""Encoder quality gate: bytes + PSNR vs the reference vpxenc at the SAME
fixed quantizer (isolates coding efficiency from rate control).

Usage: python tools/quality_compare.py [--w 352 --h 288 --frames 10 --q 40]

Reference build expected at $REF_BUILD (default /tmp/vpxsrc, generic-gnu;
see tools/make_test_vectors.py provenance notes).
"""
import argparse
import math
import os
import struct
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

REF = os.environ.get("REF_BUILD", "/tmp/vpxsrc")

# vpxenc CLI quantizer (0-63) -> frame qindex (0-127): q_trans
# (onyx_if.c:1144-1154) — the comparison must run both encoders at the
# SAME frame qindex
Q_TRANS = [0, 1, 2, 3, 4, 5, 7, 8, 9, 10, 12, 13, 15, 17, 18, 19,
           20, 21, 23, 24, 25, 26, 27, 28, 29, 30, 31, 33, 35, 37, 39, 41,
           43, 45, 47, 49, 51, 53, 55, 57, 59, 61, 64, 67, 70, 73, 76, 79,
           82, 85, 88, 91, 94, 97, 100, 103, 106, 109, 112, 115, 118, 121,
           124, 127]


def psnr(a, b):
    mse = float(((a.astype(np.int64) - b.astype(np.int64)) ** 2).mean())
    return 10 * math.log10(255 * 255 / max(mse, 1e-12))


def clip_psnr(frames, decoded):
    ps = []
    for (y, u, v), (dy, du, dv) in zip(frames, decoded):
        ps.append((6 * psnr(y, dy) + psnr(u, du) + psnr(v, dv)) / 8)
    return sum(ps) / len(ps)


def write_y4m(path, frames, w, h):
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F30:1 Ip A1:1 C420jpeg\n"
                .encode())
        for y, u, v in frames:
            f.write(b"FRAME\n")
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write(v.tobytes())


def run_reference(frames, w, h, q, tmp):
    y4m = os.path.join(tmp, "src.y4m")
    ivf = os.path.join(tmp, "ref.ivf")
    write_y4m(y4m, frames, w, h)
    subprocess.run(
        [os.path.join(REF, "vpxenc"), "--codec=vp8", "-o", ivf, y4m,
         "--good", "--cpu-used=0", "--end-usage=0",
         "--target-bitrate=1000",
         f"--min-q={q}", f"--max-q={q}", "--kf-max-dist=9999", "-p", "1",
         "--ivf"],
        check=True, capture_output=True)
    size = os.path.getsize(ivf)
    # decode with our (reference-verified) decoder for PSNR
    from libvpx_opencl_tpu.models.refdec import RefDecoder
    from libvpx_opencl_tpu.utils.ivf import read_ivf
    dec = type("D", (RefDecoder,), {"use_native": True})()
    decoded = []
    for payload, _ in read_ivf(ivf).frames:
        show, planes = dec.decode_frame(payload)
        if show:
            decoded.append(planes)
    return size, clip_psnr(frames, decoded)


def run_ours(frames, w, h, q, rd=True):
    from libvpx_opencl_tpu.models.encoder import Encoder
    enc = Encoder(w, h, qindex=q, rd=rd)
    total = 0
    decoded = []
    for y, u, v in frames:
        payload = enc.encode_frame(y, u, v)
        total += len(payload) + 12  # ivf frame header parity
        decoded.append(tuple(p.copy()
                             for p in enc.dec.frame_to_show.visible()))
    return total + 32, clip_psnr(frames, decoded)


def run_tpu(frames, w, h, q):
    from libvpx_opencl_tpu.models.tpu_encoder import TPUEncoder
    enc = TPUEncoder(w, h, qindex=q)
    total = 0
    decoded = []
    for y, u, v in frames:
        payload = enc.encode_frame(y, u, v)
        total += len(payload) + 12
        decoded.append(tuple(np.asarray(p).copy()
                             for p in enc.ref_last.visible()))
    return total + 32, clip_psnr(frames, decoded)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=352)
    ap.add_argument("--h", type=int, default=288)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--q", type=int, default=40)
    ap.add_argument("--sad", action="store_true",
                    help="also run the fast SAD path")
    ap.add_argument("--tpu", action="store_true",
                    help="also run the TPU device encoder")
    args = ap.parse_args()

    from tools.make_test_vectors import synth_clip
    frames = synth_clip(args.w, args.h, args.frames, seed=42)
    cli_q = Q_TRANS.index(args.q) if args.q in Q_TRANS else \
        min(range(64), key=lambda i: abs(Q_TRANS[i] - args.q))
    qindex = Q_TRANS[cli_q]
    with tempfile.TemporaryDirectory() as tmp:
        rsize, rpsnr = run_reference(frames, args.w, args.h, cli_q, tmp)
    print(f"reference vpxenc --good cpu-used=0 qindex={qindex}: "
          f"{rsize}B  psnr={rpsnr:.3f}dB")
    osize, opsnr = run_ours(frames, args.w, args.h, qindex)
    print(f"ours (rd+trellis)                 qindex={qindex}: "
          f"{osize}B  psnr={opsnr:.3f}dB  "
          f"size={100.0 * osize / rsize:.1f}% of reference  "
          f"dpsnr={opsnr - rpsnr:+.3f}dB")
    if args.sad:
        ssize, spsnr = run_ours(frames, args.w, args.h, qindex, rd=False)
        print(f"ours (sad fast path)              qindex={qindex}: "
              f"{ssize}B  psnr={spsnr:.3f}dB  "
              f"size={100.0 * ssize / rsize:.1f}%")
    if args.tpu:
        tsize, tpsnr = run_tpu(frames, args.w, args.h, qindex)
        print(f"ours (TPU device encoder)         qindex={qindex}: "
              f"{tsize}B  psnr={tpsnr:.3f}dB  "
              f"size={100.0 * tsize / rsize:.1f}%  "
              f"dpsnr={tpsnr - rpsnr:+.3f}dB")


if __name__ == "__main__":
    main()
