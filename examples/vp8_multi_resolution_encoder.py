"""vp8_multi_resolution_encoder — port of
vp8_multi_resolution_encoder.c: encode the same clip simultaneously at
full and half resolution (simulcast), the low-res motion field seeding
the high-res search, and write one IVF per level.

Reference behavior: vp8_multi_resolution_encoder.c
(vpx_codec_enc_init_multi, mr_dissim.c low-res-guides-high-res)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from libvpx_opencl_tpu.models.multires import MultiResEncoder
from libvpx_opencl_tpu.utils.ivf import IvfStream, write_ivf
from libvpx_opencl_tpu.utils.y4m import Y4MReader


def main(infile, out_hi, out_lo):
    rd = Y4MReader(infile)
    enc = MultiResEncoder(rd.w, rd.h)
    hi = IvfStream(width=rd.w, height=rd.h,
                   timebase_num=rd.fps[1], timebase_den=rd.fps[0])
    lo = IvfStream(width=rd.w // 2, height=rd.h // 2,
                   timebase_num=rd.fps[1], timebase_den=rd.fps[0])
    for i, (y, u, v) in enumerate(rd):
        hp, lp = enc.encode_frame(y, u, v, keyframe=(i == 0))
        hi.frames.append((hp, i))
        lo.frames.append((lp, i))
    write_ivf(out_hi, hi)
    write_ivf(out_lo, lo)
    print(f"simulcast {len(hi.frames)} frames: "
          f"hi {sum(len(p) for p, _ in hi.frames)}B, "
          f"lo {sum(len(p) for p, _ in lo.frames)}B")
    return len(hi.frames)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
