"""force_keyframe — port of examples/force_keyframe.txt: request a keyframe
on a fixed cadence with VPX_EFLAG_FORCE_KF."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from libvpx_opencl_tpu.api import CodecEncoder, EncoderConfig
from libvpx_opencl_tpu.utils.ivf import IvfStream, write_ivf
from libvpx_opencl_tpu.utils.y4m import Y4MReader


def main(infile, outfile, kf_interval=8, use_tpu=False):
    rd = Y4MReader(infile)
    cfg = EncoderConfig(width=rd.w, height=rd.h, kf_max_dist=0, fps=rd.fps)
    enc = CodecEncoder(cfg, use_tpu=use_tpu)
    stream = IvfStream(width=rd.w, height=rd.h)
    kfs = []
    for i, frame in enumerate(rd):
        flags = ("force_kf",) if i % kf_interval == 0 else ()
        enc.encode(frame, pts=i, flags=flags)
        for pkt in enc.get_cx_data():
            if pkt["kind"] == "frame":
                stream.frames.append((pkt["data"], pkt["pts"]))
                if pkt["keyframe"]:
                    kfs.append(i)
    write_ivf(outfile, stream)
    print(f"keyframes at {kfs}")
    return kfs


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
