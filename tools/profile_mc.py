#!/usr/bin/env python3
"""Bisect the MC stage cost with real frame args."""
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

from libvpx_opencl_tpu.models.tpu_decoder import TPUDecoder, B, B2
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
    orig(self)


dec.__class__._reconstruct = capture
for i in range(6):
    dec.decode_frame(stream.frames[i][0])
dec.__class__._reconstruct = orig

R, C = captured['R'], captured['C']
N = R * C
args = jax.device_put(captured['args'])
jax.block_until_ready(args)
(ref_y, ref_u, ref_v, ref_idx, qc_vals, qc_idx, y2_big, dq_y1, dq_y2, dq_uv,
 has_y2, intra, mode, uv_mode, bmodes, mv0, uvmv0, taps,
 *rest) = args


def t(name, f, *a):
    jax.block_until_ready(f(*a))
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {min(ts)*1e3:8.2f} ms")


mb = np.arange(N)
mv0n = np.asarray(mv0, np.int32)
syn = (B + (mb // C) * 16 + (mv0n[:, 0] >> 3)).astype(np.int32)
sxn = (B + (mb % C) * 16 + (mv0n[:, 1] >> 3)).astype(np.int32)
sy_d = jax.device_put(jnp.asarray(syn))
sx_d = jax.device_put(jnp.asarray(sxn))
xph = jax.device_put(jnp.asarray(mv0n[:, 1] & 7))
yph = jax.device_put(jnp.asarray(mv0n[:, 0] & 7))
starts = jax.device_put(jnp.stack([jnp.asarray(syn), jnp.asarray(sxn)], 1))
jax.block_until_ready((sy_d, sx_d, xph, yph, starts))

t("mc_predict_blocks luma (real)",
  jax.jit(lambda: P.mc_predict_blocks(ref_y, ref_idx.astype(jnp.int32),
                                      starts, xph, yph, taps, 16)))


@jax.jit
def mc_inline(ref_y, ref_idx, sy, sx, xph, yph, taps):
    a21 = jnp.arange(21, dtype=jnp.int32)
    win = ref_y[ref_idx[:, None, None].astype(jnp.int32),
                (sy[:, None] + a21)[:, :, None],
                (sx[:, None] + a21)[:, None, :]].astype(jnp.int32)
    tx = taps[xph]
    ty = taps[yph]
    h = jnp.zeros((N, 21, 16), jnp.int32)
    for j in range(6):
        h = h + win[:, :, j:j + 16] * tx[:, j, None, None]
    h = jnp.clip((h + 64) >> 7, 0, 255)
    v = jnp.zeros((N, 16, 16), jnp.int32)
    for j in range(6):
        v = v + h[:, j:j + 16, :] * ty[:, j, None, None]
    return jnp.clip((v + 64) >> 7, 0, 255)


t("mc adv-index inline (real)", mc_inline, ref_y, ref_idx, sy_d, sx_d,
  xph, yph, taps)

# derive sy/sx on device from mv0 like the real code does
@jax.jit
def mc_derive2(ref_y, ref_idx, mv0, taps):
    mv = mv0.astype(jnp.int32)
    mbj = jnp.arange(N)
    sy = B + (mbj // C) * 16 + (mv[:, 0] >> 3)
    sx = B + (mbj % C) * 16 + (mv[:, 1] >> 3)
    a21 = jnp.arange(21, dtype=jnp.int32)
    win = ref_y[ref_idx[:, None, None].astype(jnp.int32),
                (sy[:, None] + a21)[:, :, None],
                (sx[:, None] + a21)[:, None, :]].astype(jnp.int32)
    tx = taps[mv[:, 1] & 7]
    ty = taps[mv[:, 0] & 7]
    h = jnp.zeros((N, 21, 16), jnp.int32)
    for j in range(6):
        h = h + win[:, :, j:j + 16] * tx[:, j, None, None]
    h = jnp.clip((h + 64) >> 7, 0, 255)
    v = jnp.zeros((N, 16, 16), jnp.int32)
    for j in range(6):
        v = v + h[:, j:j + 16, :] * ty[:, j, None, None]
    return jnp.clip((v + 64) >> 7, 0, 255)


t("mc adv-index derive-onchip", mc_derive2, ref_y, ref_idx, mv0, taps)

# chroma via mc_predict_blocks (bw=8)
uvmv0n = np.asarray(uvmv0, np.int32)
csy = jax.device_put(jnp.asarray(
    (B2 + (mb // C) * 8 + (uvmv0n[:, 0] >> 3)).astype(np.int32)))
csx = jax.device_put(jnp.asarray(
    (B2 + (mb % C) * 8 + (uvmv0n[:, 1] >> 3)).astype(np.int32)))
cstarts = jnp.stack([csy, csx], 1)
cxph = jax.device_put(jnp.asarray(uvmv0n[:, 1] & 7))
cyph = jax.device_put(jnp.asarray(uvmv0n[:, 0] & 7))
jax.block_until_ready((cstarts, cxph, cyph))
t("mc_predict_blocks chroma (real)",
  jax.jit(lambda: P.mc_predict_blocks(ref_u, ref_idx.astype(jnp.int32),
                                      cstarts, cxph, cyph, taps, 8)))
