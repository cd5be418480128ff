"""vp8_set_maps — port of examples/vp8_set_maps.txt: drive the encoder's
ROI and active maps mid-stream.  An ROI map (4 segments with distinct
q/loop-filter deltas in columns) is set at frame 4, an active map at
frame 8, and the active map is cleared at frame 12.

Reference behavior: examples/vp8_set_maps.txt (VP8E_SET_ROI_MAP at frame
22, VP8E_SET_ACTIVEMAP at 33, cleared at 44 — scaled down here)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
from libvpx_opencl_tpu.api import CodecEncoder, EncoderConfig
from libvpx_opencl_tpu.utils.ivf import IvfStream, write_ivf
from libvpx_opencl_tpu.utils.y4m import Y4MReader


def main(infile, outfile, use_tpu=False):
    rd = Y4MReader(infile)
    rows, cols = (rd.h + 15) // 16, (rd.w + 15) // 16
    cfg = EncoderConfig(width=rd.w, height=rd.h, kf_max_dist=9999)
    enc = CodecEncoder(cfg, use_tpu=use_tpu)
    stream = IvfStream(width=rd.w, height=rd.h,
                       timebase_num=rd.fps[1], timebase_den=rd.fps[0])
    for i, frame in enumerate(rd):
        if i == 4:
            # column-striped 4-segment ROI map (vp8_set_maps.txt roi map)
            seg = (np.arange(cols)[None, :] % 4) * np.ones((rows, 1), int)
            enc.set_roimap(seg.astype(np.int32),
                           q_deltas=(0, -2, -4, -6),
                           lf_deltas=(0, 1, 2, 3))
        if i == 8:
            # active map: alternating column pairs active/inactive
            act = ((np.arange(cols)[None, :] // 2) % 2 == 0)
            enc.set_active_map(np.broadcast_to(act, (rows, cols)))
        if i == 12:
            enc.set_active_map(np.ones((rows, cols), bool))
        enc.encode(frame, pts=i)
        for pkt in enc.get_cx_data():
            if pkt["kind"] == "frame":
                stream.frames.append((pkt["data"], pkt["pts"]))
    write_ivf(outfile, stream)
    print(f"encoded {len(stream.frames)} frames with ROI/active maps")
    return len(stream.frames)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
