"""simple_encoder — port of examples/simple_encoder.txt: encode a .y4m file
to IVF."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from libvpx_opencl_tpu.api import CodecEncoder, EncoderConfig
from libvpx_opencl_tpu.utils.ivf import IvfStream, write_ivf
from libvpx_opencl_tpu.utils.y4m import Y4MReader


def main(infile, outfile, bitrate=256, use_tpu=False):
    rd = Y4MReader(infile)
    cfg = EncoderConfig(width=rd.w, height=rd.h, target_bitrate=bitrate,
                        fps=rd.fps)
    enc = CodecEncoder(cfg, use_tpu=use_tpu)
    stream = IvfStream(width=rd.w, height=rd.h,
                       timebase_num=rd.fps[1], timebase_den=rd.fps[0])
    for i, frame in enumerate(rd):
        enc.encode(frame, pts=i)
        for pkt in enc.get_cx_data():
            if pkt["kind"] == "frame":
                stream.frames.append((pkt["data"], pkt["pts"]))
    write_ivf(outfile, stream)
    print(f"encoded {len(stream.frames)} frames")
    return len(stream.frames)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
