"""postproc — port of examples/postproc.txt: decode with deblocking and
noise postprocessing enabled (VP8_SET_POSTPROC, vp8.h:43)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from libvpx_opencl_tpu.api import CodecDecoder, PostProcCfg, USE_POSTPROC
from libvpx_opencl_tpu.utils.ivf import read_ivf


def main(infile, use_tpu=False):
    dec = CodecDecoder(flags=(USE_POSTPROC,), use_tpu=use_tpu)
    dec.set_postproc(PostProcCfg(flags={"deblock", "addnoise"},
                                 noise_level=2))
    n = 0
    for payload, _pts in read_ivf(infile).frames:
        dec.decode(payload)
        for y, u, v in dec.get_frame():
            n += 1
    print(f"postprocessed {n} frames")
    return n


if __name__ == "__main__":
    main(sys.argv[1])
