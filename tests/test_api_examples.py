"""Public API layer + example workflows."""
import os
import sys

import numpy as np

from conftest import vector

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))


def test_decode_to_md5_example_matches_golden():
    import decode_to_md5
    from libvpx_opencl_tpu.utils.md5 import load_golden_md5s
    got = decode_to_md5.main(vector("kf_qcif.ivf"))
    assert got == load_golden_md5s(vector("kf_qcif.ivf.md5"))


def test_simple_decoder_example(tmp_path):
    import simple_decoder
    n = simple_decoder.main(vector("inter_qcif.ivf"),
                            str(tmp_path / "out.i420"))
    assert n == 10


def test_simple_encoder_example(tmp_path):
    import simple_encoder
    from libvpx_opencl_tpu.utils.y4m import write_y4m
    rng = np.random.RandomState(0)
    frames = [(rng.randint(0, 255, (64, 96), np.uint8).astype(np.uint8),
               np.full((32, 48), 128, np.uint8),
               np.full((32, 48), 128, np.uint8)) for _ in range(3)]
    y4m = str(tmp_path / "in.y4m")
    write_y4m(y4m, frames, 96, 64)
    n = simple_encoder.main(y4m, str(tmp_path / "out.ivf"))
    assert n == 3


def test_postproc_api():
    from libvpx_opencl_tpu.api import (CodecDecoder, PostProcCfg,
                                       USE_POSTPROC)
    from libvpx_opencl_tpu.utils.ivf import read_ivf
    dec = CodecDecoder(flags=(USE_POSTPROC,), use_tpu=False)
    dec.set_postproc(PostProcCfg(flags={"deblock"}))
    n = 0
    for payload, _ in read_ivf(vector("kf_qcif.ivf")).frames:
        dec.decode(payload)
        for y, u, v in dec.get_frame():
            assert y.shape == (144, 176)
            n += 1
    assert n == 3


def test_get_set_reference():
    from libvpx_opencl_tpu.api import CodecDecoder
    from libvpx_opencl_tpu.utils.ivf import read_ivf
    dec = CodecDecoder(use_tpu=False)
    frames = read_ivf(vector("inter_qcif.ivf")).frames
    dec.decode(frames[0][0])
    list(dec.get_frame())
    snap = dec.get_reference("last")
    dec.decode(frames[1][0])
    list(dec.get_frame())
    after = dec.get_reference("last")
    assert not np.array_equal(snap[0], after[0])
    dec.set_reference("last", snap)
    back = dec.get_reference("last")
    assert np.array_equal(snap[0], back[0])


def test_input_fragments():
    from libvpx_opencl_tpu.api import CodecDecoder, USE_INPUT_FRAGMENTS
    from libvpx_opencl_tpu.utils.ivf import read_ivf
    from libvpx_opencl_tpu.utils.md5 import frame_md5, load_golden_md5s
    dec = CodecDecoder(flags=(USE_INPUT_FRAGMENTS,), use_tpu=False)
    golden = load_golden_md5s(vector("kf_qcif.ivf.md5"))
    got = []
    for payload, _ in read_ivf(vector("kf_qcif.ivf")).frames:
        half = len(payload) // 2
        dec.decode(payload[:half])
        dec.decode(payload[half:])
        dec.decode(None)
        for y, u, v in dec.get_frame():
            got.append(frame_md5(y, u, v))
    assert got == golden


def _moving_clip(tmp_path, n=6, w=96, h=64, name="mv.y4m"):
    from libvpx_opencl_tpu.utils.y4m import write_y4m
    rng = np.random.RandomState(11)
    base = rng.randint(0, 255, (h + 32, w + 32), np.uint8)
    frames = []
    for i in range(n):
        y = base[i:i + h, 2 * i:2 * i + w].copy()
        frames.append((y, np.full((h // 2, w // 2), 120, np.uint8),
                       np.full((h // 2, w // 2), 130, np.uint8)))
    y4m = str(tmp_path / name)
    write_y4m(y4m, frames, w, h)
    return y4m


def test_twopass_encoder_example(tmp_path):
    import twopass_encoder
    from libvpx_opencl_tpu.models.refdec import RefDecoder
    from libvpx_opencl_tpu.utils.ivf import read_ivf
    out = str(tmp_path / "out.ivf")
    n = twopass_encoder.main(_moving_clip(tmp_path), out, bitrate=200)
    assert n == 6
    d = RefDecoder()
    shown = sum(d.decode_frame(p)[0] for p, _ in read_ivf(out).frames)
    assert shown == 6


def test_error_resilient_example(tmp_path):
    import error_resilient
    out = str(tmp_path / "out.ivf")
    decoded = error_resilient.main(_moving_clip(tmp_path, n=8), out,
                                   drop_percent=30)
    assert decoded >= 2  # keyframes always survive


def test_decode_with_partial_drops_example():
    import decode_with_partial_drops
    shown, concealed = decode_with_partial_drops.main(
        vector("part4_cif.ivf"), loss_percent=50)
    assert shown == 6
    assert concealed >= 1


def test_vp8_set_maps_example(tmp_path):
    import vp8_set_maps
    from libvpx_opencl_tpu.models.refdec import RefDecoder
    from libvpx_opencl_tpu.utils.ivf import read_ivf
    out = str(tmp_path / "out.ivf")
    n = vp8_set_maps.main(_moving_clip(tmp_path, n=14), out)
    assert n == 14
    d = RefDecoder()
    shown = sum(d.decode_frame(p)[0] for p, _ in read_ivf(out).frames)
    assert shown == 14


def test_multi_resolution_encoder_example(tmp_path):
    import vp8_multi_resolution_encoder
    from libvpx_opencl_tpu.models.refdec import RefDecoder
    from libvpx_opencl_tpu.utils.ivf import read_ivf
    hi, lo = str(tmp_path / "hi.ivf"), str(tmp_path / "lo.ivf")
    n = vp8_multi_resolution_encoder.main(_moving_clip(tmp_path, n=3),
                                          hi, lo)
    assert n == 3
    for path, shape in ((hi, (64, 96)), (lo, (32, 48))):
        d = RefDecoder()
        for p, _ in read_ivf(path).frames:
            show, planes = d.decode_frame(p)
            assert show and planes[0].shape == shape


def test_mfqe_and_debug_overlays():
    """VP8D_MFQE blending + mode/ref colorization (postproc.c:802,
    vp8.h:44-47)."""
    from libvpx_opencl_tpu.api import (CodecDecoder, PostProcCfg,
                                       USE_POSTPROC)
    from libvpx_opencl_tpu.utils.ivf import read_ivf
    frames = read_ivf(vector("inter_qcif.ivf")).frames
    plain = CodecDecoder(use_tpu=False)
    dec = CodecDecoder(flags=(USE_POSTPROC,), use_tpu=False)
    dec.set_postproc(PostProcCfg(flags={"deblock", "mfqe"}))
    got = []
    for payload, _ in frames[:4]:
        plain.decode(payload)
        dec.decode(payload)
        got += list(dec.get_frame())
    base = list(plain.get_frame())
    assert len(got) == 4
    # MFQE output stays a valid image close to the decode
    d = got[-1][0].astype(np.int32) - base[-1][0].astype(np.int32)
    assert (d * d).mean() < 400.0

    ov = CodecDecoder(flags=(USE_POSTPROC,), use_tpu=False)
    ov.set_postproc(PostProcCfg(flags={"debug_clr_blk_modes",
                                       "debug_clr_frm_ref_blks"}))
    ov.decode(frames[0][0])
    y, u, v = next(iter(ov.get_frame()))
    ov.decode(frames[1][0])
    y2, u2, v2 = next(iter(ov.get_frame()))
    # luma untouched, chroma tinted (differs from the plain decode)
    assert np.array_equal(y2.shape, (144, 176))
    assert not np.array_equal(u2, base[1][1])

    # VP8D_DEBUG_DRAW_MV: motion vectors drawn into the luma plane
    mv = CodecDecoder(flags=(USE_POSTPROC,), use_tpu=False)
    mv.set_postproc(PostProcCfg(flags={"debug_draw_mv"}))
    mv.decode(frames[0][0])
    next(iter(mv.get_frame()))
    mv.decode(frames[1][0])
    ym, um, vm = next(iter(mv.get_frame()))
    assert not np.array_equal(ym, base[1][0])   # luma now carries arrows
    assert np.array_equal(um, base[1][1])       # chroma untouched


def test_output_partition_packets(tmp_path):
    """VPX_CODEC_USE_OUTPUT_PARTITION: per-partition fragment packets
    that reassemble into the normal stream (vpx_encoder.h:76)."""
    from libvpx_opencl_tpu.api import (CodecDecoder, CodecEncoder,
                                       EncoderConfig, USE_INPUT_FRAGMENTS,
                                       USE_OUTPUT_PARTITION)
    rng = np.random.RandomState(3)
    frames = [(rng.randint(0, 255, (64, 96), np.uint8),
               np.full((32, 48), 128, np.uint8),
               np.full((32, 48), 128, np.uint8)) for _ in range(3)]
    cfg = EncoderConfig(width=96, height=64, token_partitions=2,
                        end_usage="cq")
    enc = CodecEncoder(cfg, flags=(USE_OUTPUT_PARTITION,), use_tpu=False)
    dec = CodecDecoder(flags=(USE_INPUT_FRAGMENTS,), use_tpu=False)
    plain = CodecDecoder(use_tpu=False)
    for i, f in enumerate(frames):
        enc.encode(f, pts=i)
        pkts = [p for p in enc.get_cx_data() if p["kind"] == "frame"]
        assert len(pkts) == 5  # header/modes + 4 token partitions
        assert [p["partition_id"] for p in pkts] == [0, 1, 2, 3, 4]
        assert pkts[-1]["fragment"] is False
        whole = b"".join(p["data"] for p in pkts)
        plain.decode(whole)
        for p in pkts:
            dec.decode(p["data"])
        dec.decode(None)
        a = next(iter(dec.get_frame()))
        b = next(iter(plain.get_frame()))
        assert np.array_equal(a[0], b[0])


def test_bicubic_scaler():
    """vpx_scale bicubic re-design (bicubic_scaler.c role)."""
    from libvpx_opencl_tpu.ops.scale import (bicubic_scale_plane,
                                             scale_frame)
    rng = np.random.RandomState(0)
    # smooth ramp: scaling up then back down must be near-lossless
    ramp = np.tile(np.arange(176, dtype=np.uint8), (144, 1))
    up = bicubic_scale_plane(ramp, 288, 352)
    assert up.shape == (288, 352)
    back = bicubic_scale_plane(up, 144, 176)
    err = np.abs(back.astype(int) - ramp.astype(int))
    assert err.mean() < 1.0
    # identity when dims match
    noise = rng.randint(0, 255, (48, 64), np.uint8)
    assert np.array_equal(bicubic_scale_plane(noise, 48, 64), noise)
    # 4-to-5 ratio (gen_scalers.c vp8_scale_4_to_5 role) + odd chroma
    y, u, v = scale_frame(noise, noise[:24, :32], noise[:24, :32], 80, 60)
    assert y.shape == (60, 80) and u.shape == (30, 40)
