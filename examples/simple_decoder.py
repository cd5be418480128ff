"""simple_decoder — port of examples/simple_decoder.txt: decode an IVF file
to raw I420."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from libvpx_opencl_tpu.api import CodecDecoder
from libvpx_opencl_tpu.utils.ivf import read_ivf


def main(infile, outfile, use_tpu=False):
    dec = CodecDecoder(use_tpu=use_tpu)
    stream = read_ivf(infile)
    n = 0
    with open(outfile, "wb") as f:
        for payload, _pts in stream.frames:
            dec.decode(payload)
            for y, u, v in dec.get_frame():
                f.write(y.tobytes() + u.tobytes() + v.tobytes())
                n += 1
    print(f"decoded {n} frames")
    return n


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
