"""libvpx.opencl → TPU: a TPU-native VP8 video codec framework.

A from-scratch re-design of the capabilities of awatry/libvpx.opencl
(libvpx v1.0.0 "Duclair" + experimental OpenCL VP8 decode acceleration)
for TPU hardware: JAX/XLA/Pallas compute paths over HBM-resident YUV
planes, pjit/shard_map scale-out over device meshes, and a host-side
Python/C++ runtime for containers, entropy headers and rate control.

Layout (mirrors SURVEY.md §1's layer map):
  utils/     — containers (IVF/y4m), MD5 conformance oracle, config
  ops/       — normative tables + device kernels (IDCT, predict, loop
               filter, MC, quant, SAD/variance) in JAX/Pallas
  models/    — decoder and encoder pipelines (golden NumPy reference
               path + TPU path), bool-coder, header codecs
  parallel/  — mesh construction, MB-row sharding w/ halo exchange,
               GOP sharding, partition-parallel entropy coding
  cli/       — tpuvpxdec / tpuvpxenc command-line tools
"""

__version__ = "0.1.0"
