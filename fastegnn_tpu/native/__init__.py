"""Native host-side graph kernels (C++ via ctypes).

Compiled on first use with g++ -O3 into a cached shared library; every entry
point has a numpy/scipy fallback so the package works without a toolchain.
Set ``FASTEGNN_TPU_NO_NATIVE=1`` to force the fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_dir() -> str:
    d = os.path.join(os.path.dirname(__file__), "_build")
    os.makedirs(d, exist_ok=True)
    return d


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("FASTEGNN_TPU_NO_NATIVE"):
            return None
        src = os.path.join(os.path.dirname(__file__), "graphcore.cpp")
        so = os.path.join(_build_dir(), "libgraphcore.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", src, "-o", so],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(so)
        except (OSError, subprocess.CalledProcessError) as e:
            print(f"[fastegnn_tpu.native] build/load failed ({e}); "
                  "using python fallbacks", file=sys.stderr)
            return None
        lib.radius_graph.restype = ctypes.c_int64
        lib.radius_graph.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.sort_by_key.restype = None
        lib.sort_by_key.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.bincount.restype = None
        lib.bincount.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.counting_argsort.restype = None
        lib.counting_argsort.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.pack_v5.restype = ctypes.c_int64
        lib.pack_v5.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def radius_graph(loc: np.ndarray, r: float) -> Tuple[np.ndarray, np.ndarray]:
    """Directed edges strictly within radius r (both directions, no self
    loops); cell-list C++ kernel with scipy KD-tree fallback."""
    lib = _load()
    loc32 = np.ascontiguousarray(loc, np.float32)
    n = loc32.shape[0]
    if lib is None:
        from fastegnn_tpu.ops.neighbors import radius_graph_np

        return radius_graph_np(loc, r)
    count = lib.radius_graph(_fptr(loc32), n, r, None, None, 0)
    dst = np.empty(count, np.int32)
    src = np.empty(count, np.int32)
    got = lib.radius_graph(_fptr(loc32), n, r, _iptr(dst), _iptr(src), count)
    assert got == count, "radius_graph capacity mismatch"
    return dst, src


def argsort_i32(keys: np.ndarray) -> np.ndarray:
    lib = _load()
    k = np.ascontiguousarray(keys, np.int32)
    if lib is None:
        return np.argsort(k, kind="stable").astype(np.int32)
    out = np.empty(k.shape[0], np.int32)
    lib.sort_by_key(_iptr(k), k.shape[0], _iptr(out))
    return out


def counting_argsort(keys: np.ndarray, n_bins: int) -> np.ndarray:
    """Stable argsort for small-range int keys, O(n + n_bins); out-of-range
    keys sort last.  numpy stable-argsort fallback."""
    lib = _load()
    k = np.ascontiguousarray(keys, np.int32)
    if lib is None:
        return np.argsort(
            np.where((k >= 0) & (k < n_bins), k, n_bins), kind="stable"
        ).astype(np.int32)
    out = np.empty(k.shape[0], np.int32)
    lib.counting_argsort(_iptr(k), k.shape[0], n_bins, _iptr(out))
    return out


def bincount_f32(keys: np.ndarray, n_bins: int) -> np.ndarray:
    lib = _load()
    k = np.ascontiguousarray(keys, np.int32)
    if lib is None:
        return np.bincount(k[(k >= 0) & (k < n_bins)],
                           minlength=n_bins).astype(np.float32)
    out = np.empty(n_bins, np.float32)
    lib.bincount(_iptr(k), k.shape[0], n_bins, _fptr(out))
    return out


def pack_v5_native(
    dst: np.ndarray,
    src: np.ndarray,
    edge_attr: np.ndarray,
    edge_mask: np.ndarray,
    num_nodes: int,
    chunk: int,
    W: int,
    G: int,
    D: int = 128,
    S: int = 1,
):
    """C++ v5 edge-kernel packer.  Returns ``(idsx [8, n_slots] i32,
    w0 [n_chunks] i32, dw0 [n_chunks] i32, sdb [n_super] i32)`` or ``None``
    when the native library is unavailable (caller falls back to the
    python packer).

    Same greedy algorithm as ``ops/edge_kernel_v5.make_v5_meta`` — the two
    are tested bit-identical (tests/test_native.py)."""
    lib = _load()
    if lib is None:
        return None
    d = np.ascontiguousarray(dst, np.int32)
    s = np.ascontiguousarray(src, np.int32)
    ea = np.ascontiguousarray(edge_attr, np.float32)
    mk = np.ascontiguousarray(edge_mask, np.uint8)
    fe = ea.shape[1]
    n_chunks = lib.pack_v5(
        _iptr(d), _iptr(s), _fptr(ea),
        mk.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        d.shape[0], fe, num_nodes, chunk, W, G, D, S,
        None, None, None, None, 0)
    idsx = np.empty((8, n_chunks * chunk), np.int32)
    w0 = np.empty(n_chunks, np.int32)
    dw0 = np.empty(n_chunks, np.int32)
    sdb = np.empty(n_chunks // G, np.int32)
    got = lib.pack_v5(
        _iptr(d), _iptr(s), _fptr(ea),
        mk.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        d.shape[0], fe, num_nodes, chunk, W, G, D, S,
        _iptr(idsx), _iptr(w0), _iptr(dw0), _iptr(sdb), n_chunks)
    assert got == n_chunks, "pack_v5 capacity mismatch"
    return idsx, w0, dw0, sdb
