"""twopass_encoder — port of examples/twopass_encoder.txt: encode a .y4m
input twice (stats pass, then final pass driven by the two-pass rate
controller) and write the compressed frames to IVF.

Reference behavior: examples/twopass_encoder.txt (g_pass =
VPX_RC_FIRST_PASS then VPX_RC_LAST_PASS with rc_twopass_stats_in)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from libvpx_opencl_tpu.models import twopass
from libvpx_opencl_tpu.models.encoder import Encoder
from libvpx_opencl_tpu.utils.ivf import IvfStream, write_ivf
from libvpx_opencl_tpu.utils.y4m import Y4MReader


def main(infile, outfile, bitrate=256):
    # pass 1: collect FIRSTPASS_STATS (firstpass.c vp8_first_pass)
    stats = twopass.first_pass(Y4MReader(infile))

    # pass 2: encode under the two-pass controller
    rd = Y4MReader(infile)
    mb_count = ((rd.h + 15) // 16) * ((rd.w + 15) // 16)
    rc = twopass.TwoPassController(stats, bitrate,
                                   rd.fps[0] / max(1, rd.fps[1]), mb_count)
    enc = Encoder(rd.w, rd.h)
    stream = IvfStream(width=rd.w, height=rd.h,
                       timebase_num=rd.fps[1], timebase_den=rd.fps[0])
    for i, (y, u, v) in enumerate(rd):
        kf = (i == 0) or rc.want_keyframe()
        enc.qindex = rc.frame_q(kf)
        payload = enc.encode_frame(y, u, v, keyframe=kf)
        rc.update(enc.qindex, len(payload) * 8, kf)
        stream.frames.append((payload, i))
    write_ivf(outfile, stream)
    print(f"two-pass encoded {len(stream.frames)} frames "
          f"({sum(len(p) for p, _ in stream.frames)} bytes)")
    return len(stream.frames)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 256)
