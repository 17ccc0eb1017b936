"""ctypes bindings for the native host-side graph runtime (graphcore.cpp).

The C++ library owns host-side hot paths (edge weights, dst-sorting, merge
offsetting, Pallas plan chunking). Pure-numpy fallbacks keep everything
working when no compiler is available — `available()` reports which path is
active. The library is built lazily on first use and cached next to the
source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libgraphcore.so")
_SRC = os.path.join(_DIR, "graphcore.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")


def _build() -> Optional[str]:
    for cc in ("c++", "g++", "clang++"):
        try:
            # -ffp-contract=off: no FMA contraction — float kernels
            # (seg_rows, block_adj) must match numpy's rounding exactly
            subprocess.run([cc, "-O3", "-march=native", "-ffp-contract=off",
                            "-std=c++17", "-shared",
                            "-fPIC", _SRC, "-o", _SO], check=True,
                           capture_output=True, timeout=240)
            return _SO
        except Exception:
            continue
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if _build() is None:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.gc_edge_weights.argtypes = [_i32p, ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_int, _f32p]
        lib.gc_sort_edges_by_dst.argtypes = [_i32p, ctypes.c_int64, _i64p]
        lib.gc_merge_offset.argtypes = [_i32p, _i32p, _i64p, _i64p, ctypes.c_int64]
        lib.gc_plan_count.argtypes = [_i32p, _i32p, ctypes.c_int64,
                                      ctypes.c_int64, ctypes.c_int64]
        lib.gc_plan_count.restype = ctypes.c_int64
        lib.gc_plan_fill.argtypes = [_i32p, _i32p, _f32p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_int64,
                                     _i32p, _i32p, _f32p, _i32p, _i32p]
        lib.gc_in_degrees.argtypes = [_i32p, ctypes.c_int64, ctypes.c_int64, _i32p]
        lib.gc_block_adj.argtypes = [_i64p, _i64p, _f32p, ctypes.c_int64,
                                     ctypes.c_int64, _f32p]
        lib.gc_seg_rows.argtypes = [_f32p, _f32p, _i64p, ctypes.c_int64,
                                    ctypes.c_int64, _f32p]
        lib.gc_pack_hilo_T.argtypes = [_f32p, ctypes.c_int64, ctypes.c_int64,
                                       _u16p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


_AGG_MODE = {"sum": 0, "normalized": 1, "average": 2}


def edge_weights(dst: np.ndarray, n_nodes: int, mode: str) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    dst = np.ascontiguousarray(dst, np.int32)
    out = np.empty(len(dst), np.float32)
    lib.gc_edge_weights(dst, len(dst), n_nodes, _AGG_MODE[mode], out)
    return out


def sort_edges_by_dst(dst: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    dst = np.ascontiguousarray(dst, np.int32)
    out = np.empty(len(dst), np.int64)
    lib.gc_sort_edges_by_dst(dst, len(dst), out)
    return out


def block_adj(src: np.ndarray, dst: np.ndarray, w: np.ndarray, block_w: int,
              adj: np.ndarray) -> bool:
    """Accumulate intra-block edges into the pre-zeroed f32 [B, W, W]
    block-dense adjacency in place. Returns False when the native library is
    unavailable (caller falls back to np.add.at)."""
    lib = _load()
    if lib is None:
        return False
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    w = np.ascontiguousarray(w, np.float32)
    lib.gc_block_adj(src, dst, w, len(src), block_w, adj)
    return True


def seg_rows(values: np.ndarray, weights: np.ndarray, dst: np.ndarray,
             num_nodes: int) -> Optional[np.ndarray]:
    """out[n] = sum_{e: dst_e == n} w_e * values[e] as f32, or None when the
    native library is unavailable (caller falls back to np.add.at)."""
    lib = _load()
    if lib is None:
        return None
    vals = np.ascontiguousarray(values, np.float32)
    w = np.ascontiguousarray(weights, np.float32)
    d64 = np.ascontiguousarray(dst, np.int64)
    out = np.zeros((num_nodes, vals.shape[1]), np.float32)
    lib.gc_seg_rows(vals, w, d64, len(d64), vals.shape[1], out)
    return out


def pack_hilo_T(adj: np.ndarray) -> Optional[np.ndarray]:
    """Transpose + bf16 hi/lo pack of the f32 block adjacency in one pass:
    [B, W, W] f32 -> [B, W, 2W] bf16 [hi | lo] (round-to-nearest-even,
    bit-identical to the numpy/ml_dtypes reference). None when the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    import ml_dtypes
    B, W, _ = adj.shape
    adj = np.ascontiguousarray(adj, np.float32)
    out = np.empty((B, W, 2 * W), dtype=ml_dtypes.bfloat16)
    lib.gc_pack_hilo_T(adj, B, W, out.view(np.uint16))
    return out


def in_degrees(dst: np.ndarray, n_nodes: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    dst = np.ascontiguousarray(dst, np.int32)
    out = np.empty(n_nodes, np.int32)
    lib.gc_in_degrees(dst, len(dst), n_nodes, out)
    return out


def plan_chunks(src: np.ndarray, dst: np.ndarray, w: np.ndarray,
                block_w: int, chunk_c: int):
    """Native block-sparse plan builder. Returns the same arrays as the numpy
    path in ops/pallas_segment._build_one, or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    w = np.ascontiguousarray(w, np.float32)
    e = len(src)
    with _lock:  # plan scratch is thread_local but guard the two-phase call
        k = lib.gc_plan_count(src, dst, e, block_w, chunk_c)
        src_local = np.empty((k, chunk_c), np.int32)
        dst_local = np.empty((k, chunk_c), np.int32)
        w_out = np.empty((k, chunk_c), np.float32)
        csb = np.empty(k, np.int32)
        cdb = np.empty(k, np.int32)
        lib.gc_plan_fill(src, dst, w, e, block_w, chunk_c,
                         src_local, dst_local, w_out, csb, cdb)
    return src_local, dst_local, w_out, csb, cdb
