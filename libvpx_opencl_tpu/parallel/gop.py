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
