"""ctypes binding + on-demand build of the native host entropy runtime
(native/vp8_entropy.cpp).

The shared library is compiled with g++ on first use and cached beside the
source (pybind11 is not available in this environment; the C ABI + ctypes
keeps the binding dependency-free).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "vp8_entropy.cpp")
_SO = os.path.join(_NATIVE_DIR, "build", "libvp8entropy.so")

_lib = None


def _build():
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
         "-o", _SO, _SRC],
        check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library; returns None if the
    toolchain is unavailable (pure-Python fallback stays correct)."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
    except (OSError, subprocess.CalledProcessError):
        return None
    i8 = ctypes.POINTER(ctypes.c_int8)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    i16 = ctypes.POINTER(ctypes.c_int16)
    i32 = ctypes.POINTER(ctypes.c_int32)
    i64 = ctypes.POINTER(ctypes.c_int64)
    lib.vp8e_decode_modes.restype = ctypes.c_int
    lib.vp8e_decode_modes.argtypes = [
        u8, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        u8, u8, u8, u8, u8, i32,
        i32, i32, i32, i32, i32, i32, i32, i32, i32, i32,
        u8, i64]
    lib.vp8e_detokenize.restype = ctypes.c_int
    lib.vp8e_detokenize.argtypes = [
        u8, i64, i64, ctypes.c_int, u8, ctypes.c_int, ctypes.c_int,
        i32, i32, i16, i32]
    lib.vp8e_pack_coeffs.restype = ctypes.c_int
    lib.vp8e_pack_coeffs.argtypes = [
        i16, ctypes.c_int64, u8, u8, i32, i16, ctypes.c_int64, i64]
    _lib = lib
    return _lib


def _p(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def decode_modes_native(lib, bc, dec):
    """Run mode/MV decode in C++ starting from BoolDecoder `bc`'s state;
    fills dec.* grids and advances bc."""
    R, C = dec.mb_rows, dec.mb_cols
    ymode = dec.fc.ymode_prob.astype(np.uint8)
    uvmode = dec.fc.uv_mode_prob.astype(np.uint8)
    bmode_p = dec.fc.bmode_prob.astype(np.uint8)
    mvc = np.ascontiguousarray(dec.fc.mvc.astype(np.uint8))
    segp = dec.mb_segment_tree_probs.astype(np.uint8)
    sign_bias = np.asarray(dec.sign_bias, dtype=np.int32)
    out_probs = np.zeros(4, np.uint8)
    out_state = np.zeros(4, np.int64)
    buf = np.frombuffer(bc.buf, dtype=np.uint8)
    segmap = np.ascontiguousarray(dec.seg_map.astype(np.int32))
    lib.vp8e_decode_modes(
        _p(buf, ctypes.c_uint8), len(bc.buf), bc.pos,
        ctypes.c_uint64(bc.value), bc.count, bc.range,
        dec.frame_type, R, C, dec.mb_no_coeff_skip,
        dec.update_mb_seg_map,
        _p(segp, ctypes.c_uint8), _p(ymode, ctypes.c_uint8),
        _p(uvmode, ctypes.c_uint8), _p(bmode_p, ctypes.c_uint8),
        _p(mvc, ctypes.c_uint8), _p(sign_bias, ctypes.c_int32),
        _p(dec.mode, ctypes.c_int32), _p(dec.ref_frame, ctypes.c_int32),
        _p(dec.mv, ctypes.c_int32), _p(dec.bmode, ctypes.c_int32),
        _p(dec.bmv, ctypes.c_int32), _p(dec.uv_mode, ctypes.c_int32),
        _p(dec.skip, ctypes.c_int32), _p(dec.partitioning, ctypes.c_int32),
        _p(dec.need_clamp, ctypes.c_int32), _p(segmap, ctypes.c_int32),
        _p(out_probs, ctypes.c_uint8), _p(out_state, ctypes.c_int64))
    dec.fc.ymode_prob[:] = ymode
    dec.fc.uv_mode_prob[:] = uvmode
    dec.fc.mvc[:] = mvc.reshape(2, 19)
    dec.seg_map[:] = segmap
    dec.prob_skip_false = int(out_probs[0])
    dec.prob_intra = int(out_probs[1])
    dec.prob_last = int(out_probs[2])
    dec.prob_gf = int(out_probs[3])
    bc.pos = int(out_state[0])
    bc.value = int(np.uint64(out_state[1]))
    bc.count = int(out_state[2])
    bc.range = int(out_state[3])


def detokenize_native(lib, dec):
    """Whole-frame token decode in C++; fills dec.qcoeff/dec.eobs and
    updates dec.skip (eobtotal==0 rule)."""
    R, C = dec.mb_rows, dec.mb_cols
    N = R * C
    parts = dec.part_bytes
    data = b"".join(parts)
    buf = np.frombuffer(data, dtype=np.uint8)
    offs = np.zeros(len(parts), np.int64)
    sizes = np.zeros(len(parts), np.int64)
    o = 0
    for i, p in enumerate(parts):
        offs[i] = o
        sizes[i] = len(p)
        o += len(p)
    cp = np.ascontiguousarray(dec.fc.coef_probs.astype(np.uint8))
    qcoeff = np.zeros((N, 25, 16), np.int16)
    eobs = np.zeros((N, 25), np.int32)
    lib.vp8e_detokenize(
        _p(buf, ctypes.c_uint8), _p(offs, ctypes.c_int64),
        _p(sizes, ctypes.c_int64), len(parts), _p(cp, ctypes.c_uint8),
        R, C, _p(dec.mode, ctypes.c_int32), _p(dec.skip, ctypes.c_int32),
        _p(qcoeff, ctypes.c_int16), _p(eobs, ctypes.c_int32))
    # int16 end-to-end: the device casts on-chip; numpy promotion keeps the
    # golden pixel path exact
    dec.qcoeff = qcoeff.reshape(R, C, 25, 16)
    dec.eobs = eobs.reshape(R, C, 25)


class _PackScratch:
    """Reusable output buffers for vp8e_pack_coeffs (per block-count)."""

    def __init__(self, cap):
        self.cap = cap
        self.bitmap = np.empty((cap + 7) // 8, np.uint8)
        self.nib = np.empty((cap, 8), np.uint8)
        self.esc_idx = np.empty(16 * cap, np.int32)
        self.esc_val = np.empty(16 * cap, np.int16)
        self.counts = np.zeros(2, np.int64)


_pack_scratch = {}


def pack_coeffs_native(lib, qflat):
    """Nibble-pack the non-zero blocks of coefficients [nblocks, 16] i16.

    Returns (bitmap, nib[:K], esc_idx[:E], esc_val[:E]) as views into
    reusable scratch (caller must copy anything it keeps past the next
    call), or None when the native library rejects the input.  bitmap has
    bit b set (little-endian within bytes) when block b is non-zero."""
    nblocks = qflat.shape[0]
    sc = _pack_scratch.get(nblocks)
    if sc is None:
        sc = _pack_scratch[nblocks] = _PackScratch(nblocks)
    qflat = np.ascontiguousarray(qflat, dtype=np.int16)
    rc = lib.vp8e_pack_coeffs(
        _p(qflat, ctypes.c_int16), nblocks,
        _p(sc.bitmap, ctypes.c_uint8), _p(sc.nib, ctypes.c_uint8),
        _p(sc.esc_idx, ctypes.c_int32), _p(sc.esc_val, ctypes.c_int16),
        16 * nblocks, _p(sc.counts, ctypes.c_int64))
    if rc != 0:
        return None
    K, E = int(sc.counts[0]), int(sc.counts[1])
    return (sc.bitmap, sc.nib[:K], sc.esc_idx[:E], sc.esc_val[:E])
