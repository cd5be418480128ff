"""WebM container: mux/demux round trip + reference nestegg oracle."""
import os
import subprocess

import pytest

from conftest import vector
from libvpx_opencl_tpu.utils.ivf import read_ivf
from libvpx_opencl_tpu.utils.webm import WebMStream, write_webm, read_webm


def _mux(tmp_path, name):
    ivf = read_ivf(vector(f"{name}.ivf"))
    ws = WebMStream(width=ivf.width, height=ivf.height)
    for i, (payload, _pts) in enumerate(ivf.frames):
        ws.frames.append((payload, i * 33, not (payload[0] & 1)))
    out = str(tmp_path / f"{name}.webm")
    write_webm(out, ws)
    return ivf, out


def test_webm_roundtrip(tmp_path):
    ivf, path = _mux(tmp_path, "inter_qcif")
    back = read_webm(path)
    assert (back.width, back.height) == (ivf.width, ivf.height)
    assert [f[0] for f in back.frames] == [f[0] for f in ivf.frames]


VPXDEC = "/tmp/vpxsrc/vpxdec"


@pytest.mark.skipif(not os.path.exists(VPXDEC),
                    reason="reference vpxdec not built")
def test_reference_nestegg_reads_our_webm(tmp_path):
    _, path = _mux(tmp_path, "kf_qcif")
    r = subprocess.run([VPXDEC, "--md5", "--i420", "-o", "f-%4.md5", path],
                      capture_output=True, text=True, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    ref = [l.split()[0] for l in r.stdout.splitlines() if l.strip()]
    golden = [l.split()[0] for l in open(vector("kf_qcif.ivf.md5"))]
    assert ref == golden
