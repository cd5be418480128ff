"""vp8cx_set_ref — port of examples/vp8cx_set_ref.txt: snapshot/restore
reference frames through the codec control surface (onyxd_if.c:161-232)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from libvpx_opencl_tpu.api import CodecDecoder
from libvpx_opencl_tpu.utils.ivf import read_ivf


def main(infile, use_tpu=False):
    dec = CodecDecoder(use_tpu=use_tpu)
    frames = read_ivf(infile).frames
    dec.decode(frames[0][0])
    list(dec.get_frame())
    snap = dec.get_reference("last")
    for payload, _ in frames[1:3]:
        dec.decode(payload)
        list(dec.get_frame())
    dec.set_reference("last", snap)  # roll the LAST reference back
    print("reference restored:", snap[0].shape)
    return snap


if __name__ == "__main__":
    main(sys.argv[1])
