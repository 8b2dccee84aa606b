"""Native C++ host runtime vs numpy reference."""

import time

import numpy as np
import pytest

from deep_gcns_torch_tpu import native
from deep_gcns_torch_tpu.graph import build_graph


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain available")


def test_sort_edges_csr_matches_numpy(rng_np):
    n, e = 1000, 20000
    s = rng_np.integers(0, n, e).astype(np.int32)
    r = rng_np.integers(0, n, e).astype(np.int32)
    out_s, out_r, order, rp = native.sort_edges_csr(s, r, n)
    o = np.argsort(r, kind="stable")
    np.testing.assert_array_equal(out_r, r[o])
    np.testing.assert_array_equal(out_s, s[o])
    np.testing.assert_array_equal(order, o)
    counts = np.bincount(r, minlength=n)
    np.testing.assert_array_equal(np.diff(rp), counts)


def test_build_graph_native_equals_python(rng_np):
    n, e = 500, 4000
    s = rng_np.integers(0, n, e)
    r = rng_np.integers(0, n, e)
    x = rng_np.standard_normal((n, 4)).astype(np.float32)
    ea = rng_np.standard_normal((e, 3)).astype(np.float32)
    g1 = build_graph(x, s, r, edge_attr=ea)                  # native path
    import deep_gcns_torch_tpu.native as nat
    saved = nat.sort_edges_csr
    nat.sort_edges_csr = lambda *a, **k: None                 # force numpy path
    try:
        g2 = build_graph(x, s, r, edge_attr=ea)
    finally:
        nat.sort_edges_csr = saved
    np.testing.assert_array_equal(np.asarray(g1.senders), np.asarray(g2.senders))
    np.testing.assert_array_equal(np.asarray(g1.receivers), np.asarray(g2.receivers))
    np.testing.assert_array_equal(np.asarray(g1.row_ptr), np.asarray(g2.row_ptr))
    np.testing.assert_array_equal(np.asarray(g1.edge_attr), np.asarray(g2.edge_attr))


def test_partition_clusters_matches_numpy(rng_np):
    n, e, k = 800, 6000, 5
    s = rng_np.integers(0, n, e).astype(np.int32)
    r = rng_np.integers(0, n, e).astype(np.int32)
    parts = rng_np.integers(0, k, n).astype(np.int32)
    res = native.partition_clusters(s, r, parts, k)
    assert res is not None
    local_id, sizes, clusters = res
    # sizes/local ids
    for c in range(k):
        ids = np.flatnonzero(parts == c)
        assert sizes[c] == len(ids)
        np.testing.assert_array_equal(np.sort(local_id[ids]),
                                      np.arange(len(ids)))
    # per-cluster edges equal the numpy construction
    for c in range(k):
        m = (parts[s] == c) & (parts[r] == c)
        ls, lr, ei = clusters[c]
        np.testing.assert_array_equal(ei, np.flatnonzero(m))
        np.testing.assert_array_equal(ls, local_id[s[m]])
        np.testing.assert_array_equal(lr, local_id[r[m]])


def test_native_sort_speedup(rng_np):
    """Informational: native counting sort should beat numpy argsort at scale."""
    n, e = 200_000, 3_000_000
    s = rng_np.integers(0, n, e).astype(np.int32)
    r = rng_np.integers(0, n, e).astype(np.int32)
    native.sort_edges_csr(s, r, n)  # warmup (page faults / allocator)
    t0 = time.time()
    native.sort_edges_csr(s, r, n)
    t_nat = time.time() - t0
    t0 = time.time()
    o = np.argsort(r, kind="stable")
    s[o], r[o]
    t_np = time.time() - t0
    print(f"native {t_nat*1000:.0f}ms vs numpy {t_np*1000:.0f}ms")
    assert t_nat < t_np * 1.5  # at least comparable; typically much faster
