"""Device-mesh construction for multi-chip/multi-host scale-out.

The sharding story (SURVEY.md §2.6.6-7, BASELINE.json configs 4-5):
  * 'gop'  axis — GOP/frame data parallelism (DCN across hosts): each group
    decodes/encodes independent frames or GOPs;
  * 'row'  axis — MB-row sharding of one frame across chips (ICI): the
    batched stages (residuals, MC, reconstruction add) partition by MB row;
    reference planes are made available to every row shard by an
    all-gather over the row axis (the "ref-frame replication" strategy —
    VP8 MVs reach ±127 px in either dimension so a fixed small halo cannot
    bound the MC window; loop-filter boundary exchange by contrast needs
    only a 4-px halo).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices=None, gop=None):
    """Build a ('gop', 'row') mesh over the available devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if gop is None:
        gop = 2 if n % 2 == 0 and n > 1 else 1
    row = n // gop
    arr = np.array(devs[:gop * row]).reshape(gop, row)
    return Mesh(arr, ("gop", "row"))
