"""decode_with_drops — port of examples/decode_with_drops.txt: drop a range
of (non-reference-critical) frames and keep decoding; corruption tracking
flags the affected frames (decodframe.c:1139-1143 semantics)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from libvpx_opencl_tpu.api import CodecDecoder
from libvpx_opencl_tpu.utils.ivf import read_ivf


def main(infile, drop_range, use_tpu=False):
    lo, hi = drop_range
    dec = CodecDecoder(use_tpu=use_tpu)
    n = dropped = 0
    for i, (payload, _pts) in enumerate(read_ivf(infile).frames):
        if lo <= i <= hi:
            dropped += 1
            continue
        try:
            dec.decode(payload)
        except Exception:
            continue
        for _ in dec.get_frame():
            n += 1
    print(f"decoded {n}, dropped {dropped}")
    return n, dropped


if __name__ == "__main__":
    main(sys.argv[1], (int(sys.argv[2]), int(sys.argv[3])))
