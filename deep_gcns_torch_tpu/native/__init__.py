"""Native (C++) host runtime: fast edge sorting / CSR / partition extraction.

Compiled on first use with the system g++ (no pybind11 in this image — plain C ABI
+ ctypes). Falls back silently to the numpy implementations in graph.py /
data/partition.py when no compiler is available; `available()` reports which path
is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "graphbuild.cpp")
_LIB = os.path.join(_HERE, "_graphbuild.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (os.path.getmtime(_LIB)
                                        < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.sort_edges_csr.argtypes = [i32p, i32p, ctypes.c_int64,
                                       ctypes.c_int32, i32p, i32p, i32p, i32p]
        lib.sort_edges_csr.restype = None
        lib.partition_edges.argtypes = [i32p, i32p, ctypes.c_int64, i32p,
                                        ctypes.c_int32, ctypes.c_int32, i32p,
                                        i64p, i32p]
        lib.partition_edges.restype = ctypes.c_int64
        lib.extract_cluster.argtypes = [i32p, i32p, ctypes.c_int64, i32p, i32p,
                                        ctypes.c_int32, i32p, i32p, i32p]
        lib.extract_cluster.restype = ctypes.c_int64
        if hasattr(lib, "rcm_order"):  # absent in a stale pre-round-3 .so
            lib.rcm_order.argtypes = [i32p, i32p, ctypes.c_int64,
                                      ctypes.c_int32, i32p]
            lib.rcm_order.restype = None
        if hasattr(lib, "cluster_order"):
            lib.cluster_order.argtypes = [i32p, i32p, ctypes.c_int64,
                                          ctypes.c_int32, ctypes.c_int32, i32p]
            lib.cluster_order.restype = None
        if hasattr(lib, "band_windows"):
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.band_windows.argtypes = [
                i32p, i64p, ctypes.c_int32, ctypes.c_int32, i32p,
                ctypes.c_int32, ctypes.c_double, ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int64, i32p, u8p]
            lib.band_windows.restype = ctypes.c_int32
        if hasattr(lib, "band_counts"):
            i8p = ctypes.POINTER(ctypes.c_int8)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.band_counts.argtypes = [
                i32p, i32p, u8p, ctypes.c_int64, i32p, ctypes.c_int32,
                ctypes.c_int32, i8p, i32p, i32p, ctypes.c_int64]
            lib.band_counts.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, typ=ctypes.c_int32):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def sort_edges_csr(senders: np.ndarray, receivers: np.ndarray, num_nodes: int
                   ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray,
                                       np.ndarray]]:
    """Counting-sort edges by receiver → (senders, receivers, order, row_ptr);
    None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    senders = np.ascontiguousarray(senders, np.int32)
    receivers = np.ascontiguousarray(receivers, np.int32)
    e = len(senders)
    out_s = np.empty(e, np.int32)
    out_r = np.empty(e, np.int32)
    order = np.empty(e, np.int32)
    row_ptr = np.empty(num_nodes + 1, np.int32)
    lib.sort_edges_csr(_ptr(senders), _ptr(receivers), e, num_nodes,
                       _ptr(out_s), _ptr(out_r), _ptr(order), _ptr(row_ptr))
    return out_s, out_r, order, row_ptr


def rcm_order(senders: np.ndarray, receivers: np.ndarray, num_nodes: int
              ) -> Optional[np.ndarray]:
    """Reverse Cuthill-McKee permutation (perm[new_id] = old_id) of the
    symmetrized graph; None when the native library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "rcm_order"):
        return None
    senders = np.ascontiguousarray(senders, np.int32)
    receivers = np.ascontiguousarray(receivers, np.int32)
    perm = np.empty(num_nodes, np.int32)
    lib.rcm_order(_ptr(senders), _ptr(receivers), len(senders),
                  np.int32(num_nodes), _ptr(perm))
    return perm


def cluster_order(senders: np.ndarray, receivers: np.ndarray, num_nodes: int,
                  cluster_size: int) -> Optional[np.ndarray]:
    """Greedy max-connectivity cluster ordering (perm[new_id] = old_id);
    None when the native library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "cluster_order"):
        return None
    senders = np.ascontiguousarray(senders, np.int32)
    receivers = np.ascontiguousarray(receivers, np.int32)
    perm = np.empty(num_nodes, np.int32)
    lib.cluster_order(_ptr(senders), _ptr(receivers), len(senders),
                      np.int32(num_nodes), np.int32(cluster_size), _ptr(perm))
    return perm


def partition_clusters(senders: np.ndarray, receivers: np.ndarray,
                       parts: np.ndarray, n_clusters: int):
    """Native per-cluster edge extraction: returns (local_id [N], cluster_sizes,
    list of (local_senders, local_receivers, edge_idx)) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    senders = np.ascontiguousarray(senders, np.int32)
    receivers = np.ascontiguousarray(receivers, np.int32)
    parts = np.ascontiguousarray(parts, np.int32)
    n = len(parts)
    e = len(senders)
    local_id = np.empty(n, np.int32)
    sizes = np.empty(n_clusters, np.int64)
    edge_cluster = np.empty(e, np.int32)
    lib.partition_edges(_ptr(senders), _ptr(receivers), e, _ptr(parts), n,
                        n_clusters, _ptr(local_id), _ptr(sizes, ctypes.c_int64),
                        _ptr(edge_cluster))
    out = []
    for c in range(n_clusters):
        cap = int((edge_cluster == c).sum())  # cheap vectorized count
        ls = np.empty(cap, np.int32)
        lr = np.empty(cap, np.int32)
        ei = np.empty(cap, np.int32)
        k = lib.extract_cluster(_ptr(senders), _ptr(receivers), e,
                                _ptr(edge_cluster), _ptr(local_id), c,
                                _ptr(ls), _ptr(lr), _ptr(ei))
        out.append((ls[:k], lr[:k], ei[:k]))
    return local_id, sizes, out


def band_windows(s_sorted: np.ndarray, blk_start: np.ndarray, n_pad: int,
                 cands, target_cov: float, cost_div: int, align: int):
    """Window selection + per-block starts + in-band flags for the band
    builder (ops/band._build_window hot loop).  Returns (window, w_lo,
    in_band) or None when the native library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "band_windows"):
        return None
    s_sorted = np.ascontiguousarray(s_sorted, np.int32)
    blk_start = np.ascontiguousarray(blk_start, np.int64)
    cands = np.ascontiguousarray(cands, np.int32)
    nb = len(blk_start) - 1
    w_lo = np.empty(nb, np.int32)
    in_band = np.empty(len(s_sorted), np.uint8)
    window = lib.band_windows(
        _ptr(s_sorted), _ptr(blk_start, ctypes.c_int64), np.int32(nb),
        np.int32(n_pad), _ptr(cands), np.int32(len(cands)),
        ctypes.c_double(target_cov), ctypes.c_int64(cost_div),
        np.int32(align), ctypes.c_int64(nb * 128), _ptr(w_lo),
        _ptr(in_band, ctypes.c_uint8))
    return int(window), w_lo, in_band.astype(bool)


def band_counts(s_sorted: np.ndarray, r_sorted: np.ndarray,
                in_band: np.ndarray, w_lo: np.ndarray, window: int, bn: int,
                n_rows: int):
    """Fill the int8 band count matrix in one pass (saturation spills
    returned as extra leftover edges).  Returns (a_band, spill_s, spill_r)
    or None when the native library is unavailable / spill overflow."""
    lib = _load()
    if lib is None or not hasattr(lib, "band_counts"):
        return None
    s_sorted = np.ascontiguousarray(s_sorted, np.int32)
    r_sorted = np.ascontiguousarray(r_sorted, np.int32)
    in_band = np.ascontiguousarray(in_band, np.uint8)
    w_lo = np.ascontiguousarray(w_lo, np.int32)
    a_band = np.zeros((n_rows, window), np.int8)
    cap = 1 << 20
    spill_s = np.empty(cap, np.int32)
    spill_r = np.empty(cap, np.int32)
    n = lib.band_counts(_ptr(s_sorted), _ptr(r_sorted),
                        _ptr(in_band, ctypes.c_uint8), len(s_sorted),
                        _ptr(w_lo), np.int32(window), np.int32(bn),
                        _ptr(a_band, ctypes.c_int8), _ptr(spill_s),
                        _ptr(spill_r), ctypes.c_int64(cap))
    if n < 0:
        return None
    return a_band, spill_s[:n].copy(), spill_r[:n].copy()
