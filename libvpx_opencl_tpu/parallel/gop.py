"""GOP data parallelism on the ('gop', 'row') mesh.

The 'gop' axis of parallel/mesh.make_mesh carries independent streams (or
independent GOPs of one stream): each gop group owns a disjoint row-mesh
slice of the device grid and runs the full sharded frame program
(parallel/sharded_decode.ShardedTPUDecoder) on its own chips, while the
'row' axis shards each frame's MB rows inside the group.  This is the
two-level scale-out of SURVEY.md §2.6.6-7 / BASELINE.json config 5:
GOP-DP across hosts (DCN), MB-row sharding inside a host (ICI).

Host entropy decode for the G streams runs on G threads; each thread's
device dispatches target only its group's devices, so groups proceed
independently (no cross-group barrier — the reference's analogous
structure is one vpxdec process per stream, here it is one mesh program
per group inside a single runtime).
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np
from jax.sharding import Mesh

from .mesh import make_mesh
from .sharded_decode import ShardedTPUDecoder


def submeshes(mesh):
    """Split a ('gop', 'row') mesh into per-group ('row',) meshes."""
    assert mesh.axis_names == ("gop", "row")
    return [Mesh(row_devs, ("row",)) for row_devs in mesh.devices]


def decode_streams(streams, n_devices=None, gop=None):
    """Decode G streams concurrently, one gop group each.

    streams: list of frame-payload lists. Returns a list (per stream) of
    lists of (y, u, v) shown frames. len(streams) must equal the mesh's
    gop extent.
    """
    mesh = make_mesh(n_devices, gop=gop if gop is not None
                     else max(1, len(streams)))
    groups = submeshes(mesh)
    if len(streams) != len(groups):
        raise ValueError(f"{len(streams)} streams != gop={len(groups)}")

    def run(args):
        payloads, rows_mesh = args
        dec = ShardedTPUDecoder(mesh=rows_mesh)
        out = []
        for payload in payloads:
            show, planes = dec.decode_frame(payload)
            if show:
                out.append(tuple(np.asarray(p).copy() for p in planes))
        return out

    with ThreadPoolExecutor(max_workers=len(groups)) as pool:
        return list(pool.map(run, zip(streams, groups)))


def encode_gops(frames, w, h, gop_len, n_devices=None, qindex=24,
                **enc_kwargs):
    """GOP-parallel encode (the encode leg of BASELINE config 5): the
    clip is cut into keyframe-led groups of gop_len frames; each group
    encodes on its own device of a ('gop',) mesh concurrently.  Because
    keyframes reset every piece of encoder state the bitstream depends on
    (reference ring by definition; adaptive mode probabilities via
    vp8_setup_key_frame — Encoder._reset_key_frame_state), the
    concatenated payload list is BIT-IDENTICAL to a single-device
    sequential encode with the same keyframe placement
    (tests/test_gop_encode.py asserts this).

    Returns the flat payload list in display order."""
    import jax
    from ..models.tpu_encoder import TPUEncoder

    groups = [frames[i:i + gop_len] for i in range(0, len(frames),
                                                   gop_len)]
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]

    def run(args):
        gi, grp = args
        dev = devs[gi % len(devs)]
        with jax.default_device(dev):
            enc = TPUEncoder(w, h, qindex=qindex, **enc_kwargs)
            return [enc.encode_frame(y, u, v, keyframe=(i == 0))
                    for i, (y, u, v) in enumerate(grp)]

    with ThreadPoolExecutor(max_workers=len(groups)) as pool:
        outs = list(pool.map(run, enumerate(groups)))
    return [p for grp in outs for p in grp]
