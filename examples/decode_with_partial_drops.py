"""decode_with_partial_drops — port of
examples/decode_with_partial_drops.txt: feed each frame to the decoder as
fragments (VPX_CODEC_USE_INPUT_FRAGMENTS) and randomly truncate some
frames' data mid-stream; error concealment keeps the decode going.

Reference behavior: examples/decode_with_partial_drops.txt (fragment
input + throw_packets loss simulation + VPX_CODEC_USE_ERROR_CONCEALMENT)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
from libvpx_opencl_tpu.api import (CodecDecoder, USE_ERROR_CONCEALMENT,
                                   USE_INPUT_FRAGMENTS)
from libvpx_opencl_tpu.utils.ivf import read_ivf


def main(infile, loss_percent=10, seed=3, use_tpu=False):
    stream = read_ivf(infile)
    dec = CodecDecoder(flags=(USE_INPUT_FRAGMENTS, USE_ERROR_CONCEALMENT),
                       use_tpu=use_tpu)
    rng = np.random.RandomState(seed)
    shown = concealed = 0
    for payload, _pts in stream.frames:
        keyframe = not (payload[0] & 1)
        # split the frame into two "packets": first partition + the rest
        # (decodframe.c fragment semantics)
        cut = max(10, len(payload) // 2)
        dec.decode(payload[:cut])
        if keyframe or rng.rand() * 100 >= loss_percent:
            dec.decode(payload[cut:])          # second packet arrives
        # else: second packet lost — decode what we have
        dec.decode(None)                       # end of fragment group
        n = len(list(dec.get_frame()))
        shown += n
        if dec.get_frame_corrupted():
            concealed += 1
    print(f"decoded {shown} frames, {concealed} with concealment")
    return shown, concealed


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 10)
