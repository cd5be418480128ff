#!/usr/bin/env python3
"""Per-stage timing of the TPU decode pipeline on the real chip.

Splits decode_frame_device into its stages and times each with
block_until_ready on representative frames of the 1080p bench stream.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from libvpx_opencl_tpu.models.tpu_decoder import TPUDecoder, B, B2, _blk4_to_mb
from libvpx_opencl_tpu.models import wavefront as wf
from libvpx_opencl_tpu.ops import transforms as tf
from libvpx_opencl_tpu.ops import predict as P
from libvpx_opencl_tpu.utils.ivf import read_ivf

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ivf = os.path.join(here, "tests", "vectors", "bench_1080p.ivf")
stream = read_ivf(ivf)

dec = TPUDecoder()

# capture args for an inter frame (frame 5)
captured = {}
orig = dec.__class__._reconstruct


def capture(self):
    self._detokenize_all()
    captured['args'] = self._prep_arrays()
    captured['R'], captured['C'] = self.mb_rows, self.mb_cols
    captured['simple'] = bool(self.simple_filter)
    captured['do_lf'] = self.filter_level > 0
    orig(self)


dec.__class__._reconstruct = capture
for i in range(6):
    dec.decode_frame(stream.frames[i][0])
dec.__class__._reconstruct = orig

R, C = captured['R'], captured['C']
args = captured['args']
simple_lf, do_lf = captured['simple'], captured['do_lf']
(ref_y, ref_u, ref_v, ref_idx, qc_vals, qc_idx, y2_big, dq_y1, dq_y2, dq_uv,
 has_y2, intra, mode, uv_mode, bmodes, mv0, uvmv0, taps,
 sp_mb, sp_tile, sp_mv, sp_valid, sq_mb, sq_quad, sq_mv, sq_valid,
 flevel, mblim_a, blim_a, lim_a, hev_a, noskip_a) = args

N = R * C
sch = wf.schedule(R, C)


@jax.jit
def stage_resid(qc_vals, qc_idx, y2_big, dq_y1, dq_y2, dq_uv, has_y2):
    if qc_idx is None:
        qcoeff = qc_vals.reshape(N, 25, 16)
    else:
        dense = jnp.zeros((N * 25, 16), jnp.int16)
        dense = dense.at[qc_idx].set(qc_vals, mode="drop",
                                     unique_indices=True)
        qcoeff = dense.reshape(N, 25, 16)
    ry, ru, rv = tf.compute_residuals(qcoeff, y2_big, dq_y1, dq_y2, dq_uv,
                                      has_y2)
    return _blk4_to_mb(ry, 4), _blk4_to_mb(ru, 2), _blk4_to_mb(rv, 2)


@jax.jit
def stage_mc(ref_y, ref_u, ref_v, ref_idx, mv0, uvmv0, taps):
    mb = jnp.arange(N)
    ref_idx = ref_idx.astype(jnp.int32)
    mv0 = mv0.astype(jnp.int32)
    uvmv0 = uvmv0.astype(jnp.int32)
    mb_r, mb_c = mb // C, mb % C
    sy = B + mb_r * 16 + (mv0[:, 0] >> 3)
    sx = B + mb_c * 16 + (mv0[:, 1] >> 3)
    mc_y = P.mc_predict_blocks(ref_y, ref_idx, jnp.stack([sy, sx], 1),
                               mv0[:, 1] & 7, mv0[:, 0] & 7, taps, 16)
    csy = B2 + mb_r * 8 + (uvmv0[:, 0] >> 3)
    csx = B2 + mb_c * 8 + (uvmv0[:, 1] >> 3)
    cstarts = jnp.stack([csy, csx], 1)
    mc_u = P.mc_predict_blocks(ref_u, ref_idx, cstarts, uvmv0[:, 1] & 7,
                               uvmv0[:, 0] & 7, taps, 8)
    mc_v = P.mc_predict_blocks(ref_v, ref_idx, cstarts, uvmv0[:, 1] & 7,
                               uvmv0[:, 0] & 7, taps, 8)
    return mc_y, mc_u, mc_v


@jax.jit
def stage_intra(inter_y, inter_u, inter_v, resid_y_b, resid_u_b, resid_v_b,
                mode, uv_mode, intra, bmodes):
    return wf.intra_recon_blocks(R, C, sch, inter_y, inter_u, inter_v,
                                 resid_y_b, resid_u_b, resid_v_b,
                                 mode.astype(jnp.int32),
                                 uv_mode.astype(jnp.int32), intra,
                                 bmodes.astype(jnp.int32))


@jax.jit
def stage_lf(yb, ub, vb, flevel, mblim_a, blim_a, lim_a, hev_a, noskip_a):
    return wf.loop_filter_blocks(R, C, sch, simple_lf, yb, ub, vb,
                                 flevel.astype(jnp.int32),
                                 mblim_a.astype(jnp.int32),
                                 blim_a.astype(jnp.int32),
                                 lim_a.astype(jnp.int32),
                                 hev_a.astype(jnp.int32), noskip_a)


@jax.jit
def stage_assemble(yb, ub, vb):
    HP, WP = R * 16 + 2 * B, C * 16 + 2 * B
    HPc, WPc = R * 8 + 2 * B2, C * 8 + 2 * B2
    from libvpx_opencl_tpu.models.tpu_decoder import _extend_borders
    cy = jnp.zeros((HP, WP), jnp.uint8)
    cy = jax.lax.dynamic_update_slice(
        cy, tf.mbs_to_plane(yb, R, C, 16).astype(jnp.uint8), (B, B))
    cy = _extend_borders(cy, B, C * 16, R * 16)
    return cy


def timeit(name, fn, *a):
    out = fn(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:18s} {min(ts)*1e3:8.2f} ms")
    return out

print(f"frame geometry R={R} C={C} N={N} simple_lf={simple_lf} do_lf={do_lf}")
ry, ru, rv = timeit("residuals", stage_resid, qc_vals, qc_idx, y2_big,
                    dq_y1, dq_y2, dq_uv, has_y2)
mc_y, mc_u, mc_v = timeit("mc", stage_mc, ref_y, ref_u, ref_v, ref_idx,
                          mv0, uvmv0, taps)
iy = jnp.clip(mc_y + ry, 0, 255)
iu = jnp.clip(mc_u + ru, 0, 255)
iv = jnp.clip(mc_v + rv, 0, 255)
yb, ub, vb = timeit("intra_wavefront", stage_intra, iy, iu, iv, ry, ru, rv,
                    mode, uv_mode, intra, bmodes)
yb2, ub2, vb2 = timeit("lf_wavefront", stage_lf, yb, ub, vb, flevel,
                       mblim_a, blim_a, lim_a, hev_a, noskip_a)
timeit("assemble+extend", stage_assemble, yb2, ub2, vb2)

# upload/readback costs
h_qc = np.asarray(qc_vals)
t0 = time.perf_counter()
for _ in range(5):
    jax.block_until_ready(jax.device_put(h_qc))
print(f"{'upload qc_vals':18s} {(time.perf_counter()-t0)/5*1e3:8.2f} ms "
      f"({h_qc.nbytes/1e6:.2f} MB)")
cy = stage_assemble(yb2, ub2, vb2)
t0 = time.perf_counter()
for _ in range(5):
    np.asarray(cy)
print(f"{'readback y plane':18s} {(time.perf_counter()-t0)/5*1e3:8.2f} ms "
      f"({cy.nbytes/1e6:.2f} MB)")
