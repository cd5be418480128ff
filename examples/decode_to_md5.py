"""decode_to_md5 — port of examples/decode_to_md5.txt: the bit-exactness
oracle workflow (per-frame MD5 of decoded planes)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from libvpx_opencl_tpu.api import CodecDecoder
from libvpx_opencl_tpu.utils.ivf import read_ivf
from libvpx_opencl_tpu.utils.md5 import frame_md5


def main(infile, use_tpu=False):
    dec = CodecDecoder(use_tpu=use_tpu)
    out = []
    for payload, _pts in read_ivf(infile).frames:
        dec.decode(payload)
        for y, u, v in dec.get_frame():
            digest = frame_md5(y, u, v)
            print(f"{digest}  frame-{len(out)+1}")
            out.append(digest)
    return out


if __name__ == "__main__":
    main(sys.argv[1])
