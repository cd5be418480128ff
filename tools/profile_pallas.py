#!/usr/bin/env python3
"""Time the Pallas wavefront kernels + mc_dense at 1080p geometry on the
real chip (or CPU interpret with --cpu)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from libvpx_opencl_tpu.ops import pallas_wavefront as PW
from libvpx_opencl_tpu.ops import mc_dense as MD

interp = "--cpu" in sys.argv
R, C = 68, 120
N = R * C
D = PW.diag_depth(R, C)
M = R
rng = np.random.default_rng(0)


def t(name, f, *a):
    out = f(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        ts.append(time.perf_counter() - t0)
    print(f"{name:32s} {min(ts)*1e3:8.2f} ms")
    return out


j = jnp.asarray
yb = j(rng.integers(0, 256, (N, 16, 16)).astype(np.int32))
ub = j(rng.integers(0, 256, (N, 8, 8)).astype(np.int32))
vb = j(rng.integers(0, 256, (N, 8, 8)).astype(np.int32))
flevel = rng.integers(1, 64, N).astype(np.int32)
mblim = (2 * (flevel + 2) + 1).astype(np.int32)
blim = (2 * flevel + 1).astype(np.int32)
lim = np.maximum(flevel // 2, 1).astype(np.int32)
hev = np.clip(flevel // 16 + 1, 0, 3).astype(np.int32)
noskip = (rng.random(N) < 0.7).astype(np.int32)

to_diag16 = jax.jit(lambda x: PW.to_diag(x, R, C))
to_diag8 = jax.jit(lambda x: PW.to_diag(x, R, C))
from_diag16 = jax.jit(lambda x: PW.from_diag(x, R, C))

yd = t("to_diag 16", to_diag16, yb)
ud = to_diag8(ub)
vd = to_diag8(vb)
params = jax.jit(lambda *c: PW.pack_params(list(c), R, C))(
    j(flevel), j(mblim), j(blim), j(lim), j(hev), j(noskip))
jax.block_until_ready(params)

lf = jax.jit(lambda *a: PW.loop_filter_pallas(R, C, False, interp, *a))
outs = t("loop_filter_pallas", lf, yd, ud, vd, params)
comp = jax.jit(lambda o: PW.lf_compose(o, R, C, False))
t("lf_compose", comp, outs)
t("from_diag 16", from_diag16, yd)

# intra kernel
mode = rng.integers(0, 5, N).astype(np.int32)
uvmode = rng.integers(0, 4, N).astype(np.int32)
intra = (rng.random(N) < 0.4).astype(np.int32)
bmodes = rng.integers(0, 10, (N, 16)).astype(np.int32)
iy, iu, iv = yb, ub, vb
ry = j(rng.integers(-50, 50, (N, 16, 16)).astype(np.int32))
ru = j(rng.integers(-50, 50, (N, 8, 8)).astype(np.int32))
rv = j(rng.integers(-50, 50, (N, 8, 8)).astype(np.int32))
iparams = jax.jit(lambda *c: PW.pack_params(list(c), R, C))(
    j(mode), j(uvmode), j(intra))
bmd = jax.jit(lambda b: jnp.stack(
    [PW.vec_to_diag(b[:, k], R, C) for k in range(16)], 1))(j(bmodes))
# flags: any bpred per diagonal (host-computed in production)
isb = (mode == PW.B_PRED_M) & (intra != 0)
dd = np.zeros(D, np.int32)
for n in range(N):
    r, c = n // C, n % C
    if isb[n]:
        dd[2 * r + c] = 1
flags = j(dd)
jax.block_until_ready((iparams, bmd))

ik = jax.jit(lambda *a: PW.intra_recon_pallas(R, C, interp, *a))
t("intra_pallas (bpred flags)", ik, flags, to_diag16(iy), to_diag8(iu),
  to_diag8(iv), to_diag16(ry), to_diag8(ru), to_diag8(rv), iparams, bmd)
t("intra_pallas (no bpred)", ik, j(np.zeros(D, np.int32)), to_diag16(iy),
  to_diag8(iu), to_diag8(iv), to_diag16(ry), to_diag8(ru), to_diag8(rv),
  iparams, bmd)

# mc_dense
BORDER = 32
HP, WP = R * 16 + 2 * BORDER, C * 16 + 2 * BORDER
refs = j(rng.integers(0, 256, (3, HP, WP)).astype(np.uint8))
ridx = j(rng.integers(0, 3, (R, C)).astype(np.int32))
dx = j(rng.integers(-16, 17, (R, C)).astype(np.int32))
dy = j(rng.integers(-16, 17, (R, C)).astype(np.int32))
tx = j(rng.integers(0, 128, (R, C, 6)).astype(np.int32))
ty = j(rng.integers(0, 128, (R, C, 6)).astype(np.int32))
mcd = jax.jit(lambda *a: MD.mc_dense_plane(*a, R, C, 16, BORDER))
t("mc_dense luma", mcd, refs, ridx, dx, dy, tx, ty)
HPc, WPc = R * 8 + 2 * 16, C * 8 + 2 * 16
refsc = j(rng.integers(0, 256, (3, HPc, WPc)).astype(np.uint8))
dxc = j(rng.integers(-8, 9, (R, C)).astype(np.int32))
dyc = j(rng.integers(-8, 9, (R, C)).astype(np.int32))
mcdc = jax.jit(lambda *a: MD.mc_dense_plane(*a, R, C, 8, 16))
t("mc_dense chroma", mcdc, refsc, ridx, dxc, dyc, tx, ty)
