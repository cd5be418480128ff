#!/usr/bin/env python3
"""Pure device-compute timing: all inputs pre-uploaded (device-resident)."""
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

from libvpx_opencl_tpu.models.tpu_decoder import (TPUDecoder, B, B2,
                                                  decode_frame_device,
                                                  _blk4_to_mb)
from libvpx_opencl_tpu.models import wavefront as wf
from libvpx_opencl_tpu.ops import transforms as tf
from libvpx_opencl_tpu.ops import predict as P
from libvpx_opencl_tpu.utils.ivf import read_ivf

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
stream = read_ivf(os.path.join(here, "tests", "vectors", "bench_1080p.ivf"))
dec = TPUDecoder()
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
simple_lf, do_lf = captured['simple'], captured['do_lf']
args = jax.device_put(captured['args'])
jax.block_until_ready(args)
(ref_y, ref_u, ref_v, ref_idx, qc_vals, qc_idx, y2_big, dq_y1, dq_y2, dq_uv,
 has_y2, intra, mode, uv_mode, bmodes, mv0, uvmv0, taps,
 sp_mb, sp_tile, sp_mv, sp_valid, sq_mb, sq_quad, sq_mv, sq_valid,
 flevel, mblim_a, blim_a, lim_a, hev_a, noskip_a) = args
N = R * C
sch = wf.schedule(R, C)


def t(name, f, *a):
    out = f(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} {min(ts)*1e3:8.2f} ms")
    return out


t("full frame (device args)", lambda: decode_frame_device(
    R, C, simple_lf, do_lf, *args))


@jax.jit
def stage_resid(qc_vals, qc_idx, y2_big, dq_y1, dq_y2, dq_uv, has_y2):
    dense = jnp.zeros((N * 25, 16), jnp.int16)
    dense = dense.at[qc_idx].set(qc_vals, mode="drop", unique_indices=True)
    qcoeff = dense.reshape(N, 25, 16)
    ry, ru, rv = tf.compute_residuals(qcoeff, y2_big, dq_y1, dq_y2, dq_uv,
                                      has_y2)
    return _blk4_to_mb(ry, 4), _blk4_to_mb(ru, 2), _blk4_to_mb(rv, 2)


@jax.jit
def stage_mc(ref_y, ref_u, ref_v, ref_idx, mv0, uvmv0, taps):
    mb = jnp.arange(N)
    ref_idx32 = ref_idx.astype(jnp.int32)
    mv032 = mv0.astype(jnp.int32)
    uvmv032 = uvmv0.astype(jnp.int32)
    mb_r, mb_c = mb // C, mb % C
    sy = B + mb_r * 16 + (mv032[:, 0] >> 3)
    sx = B + mb_c * 16 + (mv032[:, 1] >> 3)
    mc_y = P.mc_predict_blocks(ref_y, ref_idx32, jnp.stack([sy, sx], 1),
                               mv032[:, 1] & 7, mv032[:, 0] & 7, taps, 16)
    csy = B2 + mb_r * 8 + (uvmv032[:, 0] >> 3)
    csx = B2 + mb_c * 8 + (uvmv032[:, 1] >> 3)
    cstarts = jnp.stack([csy, csx], 1)
    mc_u = P.mc_predict_blocks(ref_u, ref_idx32, cstarts, uvmv032[:, 1] & 7,
                               uvmv032[:, 0] & 7, taps, 8)
    mc_v = P.mc_predict_blocks(ref_v, ref_idx32, cstarts, uvmv032[:, 1] & 7,
                               uvmv032[:, 0] & 7, taps, 8)
    return mc_y, mc_u, mc_v


@jax.jit
def stage_intra(iy, iu, iv, ry, ru, rv, mode, uv_mode, intra, bmodes):
    return wf.intra_recon_blocks(R, C, sch, iy, iu, iv, ry, ru, rv,
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


ry, ru, rv = t("residuals", stage_resid, qc_vals, qc_idx, y2_big, dq_y1,
               dq_y2, dq_uv, has_y2)
mc_y, mc_u, mc_v = t("mc", stage_mc, ref_y, ref_u, ref_v, ref_idx, mv0,
                     uvmv0, taps)
iy = jnp.clip(mc_y + ry, 0, 255)
iu = jnp.clip(mc_u + ru, 0, 255)
iv = jnp.clip(mc_v + rv, 0, 255)
yb, ub, vb = t("intra_wavefront", stage_intra, iy, iu, iv, ry, ru, rv,
               mode, uv_mode, intra, bmodes)
t("lf_wavefront", stage_lf, yb, ub, vb, flevel, mblim_a, blim_a, lim_a,
  hev_a, noskip_a)
