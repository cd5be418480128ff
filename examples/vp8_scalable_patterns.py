"""vp8_scalable_patterns — port of vp8_scalable_patterns.c: temporal-layer
encoding where dropping enhancement-layer frames still decodes."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from libvpx_opencl_tpu.models.encoder import Encoder
from libvpx_opencl_tpu.models.layers import TemporalLayerEncoder
from libvpx_opencl_tpu.utils.ivf import IvfStream, write_ivf
from libvpx_opencl_tpu.utils.y4m import Y4MReader


def main(infile, outfile, pattern="L1T2"):
    rd = Y4MReader(infile)
    enc = Encoder(rd.w, rd.h)
    tl = TemporalLayerEncoder(enc, pattern=pattern,
                              layer_bitrates_kbps=(150, 300),
                              fps=rd.fps[0] / max(1, rd.fps[1]))
    stream = IvfStream(width=rd.w, height=rd.h)
    layers = []
    for i, (y, u, v) in enumerate(rd):
        payload, layer = tl.encode_frame(y, u, v)
        stream.frames.append((payload, i))
        layers.append(layer)
    write_ivf(outfile, stream)
    print("layers:", layers)
    return layers


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
