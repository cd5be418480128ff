"""Multi-chip sharded decode step: GOP data-parallelism x MB-row sharding.

This is the scale-out skeleton of BASELINE.json configs 4-5: the batched
pixel stages (whole-frame residuals, batched MC, reconstruction add) run
under `shard_map` over a ('gop', 'row') mesh:

  * 'gop'  — independent frames decode on separate device groups (the DCN
    axis in a multi-host pod);
  * 'row'  — one frame's MB rows are partitioned across chips (the ICI
    axis). Reference planes are all-gathered along 'row' before MC (VP8
    MVs reach +-127px, so the MC window is unbounded relative to a shard);
    the 4-pixel loop-filter boundary rows are exchanged with `ppermute`
    (the halo pattern the wavefront filter needs at shard seams).

The wavefront stages (intra prediction, loop filter interior) currently run
per-shard on their own rows; cross-shard wavefront stitching via the halo
strips is the next scale-out stage (SURVEY.md §2.6.1 TPU plan).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as PSpec
from jax import shard_map

from ..ops import predict as P
from ..ops import transforms as tf


def make_sharded_recon_step(mesh, R, C, G):
    """Build a jitted sharded reconstruction step.

    Shapes (global):
      qcoeff  [G, R*C, 25, 16] int16   sharded (gop, row-of-MB)
      y2_big  [G, R*C] bool            sharded likewise
      dq      [G, R*C, 2] x3
      has_y2  [G, R*C] bool
      y_mv    [G, R*C, 2] int32        (uniform per-MB MV, tile 0)
      ref_idx [G, R*C]
      refs    [G, 3, R*16, C*16] uint8 sharded by rows
      taps    [8, 6] replicated
    Returns recon [G, R*16, C*16] uint8 (sharded), halo_check [G] int32
    (a psum'd checksum that forces the ppermute halo exchange to live).
    """
    n_row = mesh.shape["row"]
    assert R % n_row == 0, "MB rows must divide the row axis"
    Rs = R // n_row

    def per_shard(qcoeff, y2_big, dqy1, dqy2, dquv, has_y2, y_mv, ref_idx,
                  refs, taps):
        # shard-local shapes: leading G//gop batch dim
        g = qcoeff.shape[0]
        ridx = jax.lax.axis_index("row")

        def one_frame(qc, eo, d1, d2, du, h2, mv, ri, rf):
            # residuals for our Rs MB rows
            ry, ru, rv = tf.compute_residuals(qc, eo, d1, d2, du, h2)
            resid_y = tf.blocks_to_plane(ry, Rs, C, 16)
            # all-gather reference rows along the row axis (ICI collective)
            full_ref = jax.lax.all_gather(rf, "row", axis=1, tiled=True)
            # pad so clamped MVs stay in-bounds (border extension replicate)
            pad = 32
            full_ref = jnp.pad(full_ref, ((0, 0), (pad, pad), (pad, pad)),
                               mode="edge")
            # batched MC for our rows, absolute row offset = ridx * Rs
            n = Rs * C
            mb = jnp.arange(n)
            mb_r = mb // C + ridx * Rs
            mb_c = mb % C
            sy = pad + mb_r * 16 + (mv[:, 0] >> 3)
            sx = pad + mb_c * 16 + (mv[:, 1] >> 3)
            blocks = P.mc_predict_blocks(full_ref, ri,
                                         jnp.stack([sy, sx], 1),
                                         mv[:, 1] & 7, mv[:, 0] & 7, taps,
                                         16)
            pred_y = tf.mbs_to_plane(blocks, Rs, C, 16)
            recon = jnp.clip(pred_y + resid_y, 0, 255).astype(jnp.uint8)
            return recon

        recon = jax.vmap(one_frame)(qcoeff, y2_big, dqy1, dqy2, dquv, has_y2,
                                    y_mv, ref_idx, refs)
        # loop-filter boundary halo: send our bottom 4 rows to the next row
        # shard (they are its mbh p-side pixels), ring over 'row'
        bottom = recon[:, -4:, :].astype(jnp.int32)
        halo = jax.lax.ppermute(
            bottom, "row",
            [(i, (i + 1) % n_row) for i in range(n_row)])
        halo_check = jax.lax.psum(jnp.sum(halo, axis=(1, 2)), "row")
        return recon, halo_check

    spec_mb = PSpec("gop", "row")
    in_specs = (spec_mb, spec_mb, spec_mb, spec_mb, spec_mb, spec_mb,
                spec_mb, spec_mb, PSpec("gop", None, "row"), PSpec())
    out_specs = (PSpec("gop", "row"), PSpec("gop"))
    fn = shard_map(per_shard, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)
    return jax.jit(fn)
