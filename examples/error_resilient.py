"""error_resilient — port of examples/error_resilient.txt: encode with
error-resilient settings (every frame's entropy context is reset —
refresh_entropy_probs=0, the g_error_resilient=1 behavior), then simulate
a lossy channel by dropping inter frames and show the decoder survives.

Reference behavior: examples/error_resilient.txt (g_error_resilient,
random frame drops, decoder continues on remaining frames)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
from libvpx_opencl_tpu.api import (CodecDecoder, CodecEncoder,
                                  EncoderConfig, USE_ERROR_CONCEALMENT)
from libvpx_opencl_tpu.utils.ivf import IvfStream, write_ivf
from libvpx_opencl_tpu.utils.y4m import Y4MReader


def main(infile, outfile, drop_percent=20, seed=7, use_tpu=False):
    rd = Y4MReader(infile)
    # our bitstream layer always writes refresh_entropy_probs=0
    # (encoder.py:1535) — the error-resilient entropy behavior; frequent
    # keyframes bound the damage of a dropped reference.
    cfg = EncoderConfig(width=rd.w, height=rd.h, kf_max_dist=8)
    enc = CodecEncoder(cfg, use_tpu=use_tpu)
    stream = IvfStream(width=rd.w, height=rd.h,
                       timebase_num=rd.fps[1], timebase_den=rd.fps[0])
    for i, frame in enumerate(rd):
        enc.encode(frame, pts=i)
        for pkt in enc.get_cx_data():
            if pkt["kind"] == "frame":
                stream.frames.append((pkt["data"], pkt["pts"]))
    write_ivf(outfile, stream)

    # lossy channel: drop drop_percent% of the inter frames
    rng = np.random.RandomState(seed)
    dec = CodecDecoder(flags=(USE_ERROR_CONCEALMENT,), use_tpu=use_tpu)
    decoded = dropped = 0
    for payload, _pts in stream.frames:
        keyframe = not (payload[0] & 1)
        if not keyframe and rng.rand() * 100 < drop_percent:
            dropped += 1
            continue
        dec.decode(payload)
        decoded += len(list(dec.get_frame()))
    print(f"encoded {len(stream.frames)} frames, dropped {dropped}, "
          f"decoded {decoded} (corrupted flag: {dec.get_frame_corrupted()})")
    return decoded


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 20)
