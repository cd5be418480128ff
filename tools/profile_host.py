#!/usr/bin/env python3
"""Per-frame host-side cost breakdown + tunnel bandwidth measurement."""
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

# tunnel bandwidth
for mb in (1, 4):
    x = np.random.randint(0, 255, (mb * 1024 * 1024,), np.uint8)
    d = jax.device_put(x)
    jax.block_until_ready(d)
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready(jax.device_put(x))
    up = 3 * mb / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(d)
    down = 3 * mb / (time.perf_counter() - t0)
    print(f"tunnel {mb}MB: up {up:.0f} MB/s, down {down:.0f} MB/s")

from libvpx_opencl_tpu.models.tpu_decoder import TPUDecoder
from libvpx_opencl_tpu.utils.ivf import read_ivf
from libvpx_opencl_tpu.utils.md5 import frame_md5

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
stream = read_ivf(os.path.join(here, "tests", "vectors", "bench_1080p.ivf"))

dec = TPUDecoder()
acc = dict(detok=0.0, prep=0.0, dispatch=0.0, readback=0.0, md5=0.0,
           header=0.0)
orig_detok = dec.__class__._detokenize_all
orig_prep = dec.__class__._prep_arrays


def timed(name, fn):
    def wrap(self, *a, **k):
        t0 = time.perf_counter()
        out = fn(self, *a, **k)
        acc[name] += time.perf_counter() - t0
        return out
    return wrap


dec.__class__._detokenize_all = timed("detok", orig_detok)
dec.__class__._prep_arrays = timed("prep", orig_prep)

# warm up compiles
dec.decode_frame(stream.frames[0][0])
dec.decode_frame(stream.frames[1][0])
for k in acc:
    acc[k] = 0.0

n = 0
t_total = time.perf_counter()
for payload, _ in stream.frames[2:22]:
    t0 = time.perf_counter()
    show = dec.decode_frame_core(payload)
    acc["dispatch"] += time.perf_counter() - t0
    t0 = time.perf_counter()
    y, u, v = dec.frame_to_show.visible()
    acc["readback"] += time.perf_counter() - t0
    t0 = time.perf_counter()
    frame_md5(y, u, v)
    acc["md5"] += time.perf_counter() - t0
    n += 1
t_total = time.perf_counter() - t_total
acc["dispatch"] -= acc["detok"] + acc["prep"]
print(f"frames: {n}, total {t_total/n*1e3:.1f} ms/frame")
for k, v in acc.items():
    print(f"  {k:10s} {v/n*1e3:8.2f} ms/frame")
