"""Host-side locality reordering (Reverse Cuthill-McKee).

The reference never reorders graphs — its partitioner is uniform-random
(`utils/data_util.py:43-45`), which maximizes cross-partition edges and gives
index-random gathers.  On TPU, locality is the whole game for the gather-free
aggregation path (ops/band.py): after RCM, each 128-row receiver block's
neighbors concentrate in a contiguous source window, so the SpMM becomes dense
block matmuls on the MXU instead of row gathers (ROOFLINE.md measures XLA's
gather as issue-rate bound at ~420M rows/s — the band path's ceiling is HBM
bandwidth instead).  RCM also shrinks spatial-parallel halo boundaries
(parallel/spatial.py): contiguous shards of an RCM-ordered graph have
near-minimal cross-shard edge cuts.

Primary implementation is native C++ (native/graphbuild.cpp:rcm_order);
fallbacks are scipy's reverse_cuthill_mckee, then a pure-numpy BFS.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def rcm_order(senders: np.ndarray, receivers: np.ndarray, num_nodes: int
              ) -> np.ndarray:
    """Reverse Cuthill-McKee permutation: ``perm[new_id] = old_id``.

    Operates on the symmetrized graph; isolated nodes land at the front of the
    reversed order (harmless).  O(E log deg).
    """
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    from .. import native

    perm = native.rcm_order(senders, receivers, num_nodes)
    if perm is not None:
        return perm.astype(np.int64)
    try:
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        a = sp.coo_matrix(
            (np.ones(len(senders), np.int8), (senders, receivers)),
            shape=(num_nodes, num_nodes)).tocsr()
        a = a + a.T
        return np.asarray(reverse_cuthill_mckee(a, symmetric_mode=True),
                          np.int64)
    except Exception:
        return _rcm_numpy(senders, receivers, num_nodes)


def _rcm_numpy(senders, receivers, num_nodes: int) -> np.ndarray:
    """Pure-numpy RCM (per-node python BFS loop — fallback for small graphs)."""
    s = np.concatenate([senders, receivers]).astype(np.int64)
    r = np.concatenate([receivers, senders]).astype(np.int64)
    order_e = np.argsort(s, kind="stable")
    s, r = s[order_e], r[order_e]
    ptr = np.zeros(num_nodes + 1, np.int64)
    np.add.at(ptr, s + 1, 1)
    np.cumsum(ptr, out=ptr)
    degree = np.diff(ptr)
    by_deg = np.argsort(degree, kind="stable")
    visited = np.zeros(num_nodes, bool)
    order = np.empty(num_nodes, np.int64)
    n_done = 0
    scan = 0
    while n_done < num_nodes:
        while visited[by_deg[scan]]:
            scan += 1
        start = by_deg[scan]
        visited[start] = True
        order[n_done] = start
        n_done += 1
        head = n_done - 1
        while head < n_done:
            u = order[head]
            head += 1
            nbrs = r[ptr[u]:ptr[u + 1]]
            nbrs = nbrs[~visited[nbrs]]
            if nbrs.size:
                nbrs = np.unique(nbrs)
                nbrs = nbrs[np.argsort(degree[nbrs], kind="stable")]
                visited[nbrs] = True
                order[n_done:n_done + nbrs.size] = nbrs
                n_done += nbrs.size
    return order[::-1].copy()


def cluster_order(senders: np.ndarray, receivers: np.ndarray, num_nodes: int,
                  cluster_size: int = 4096) -> np.ndarray:
    """Greedy max-connectivity cluster ordering: ``perm[new_id] = old_id``.

    Grows fixed-size clusters by absorbing the frontier node with the most
    edges into the current cluster (bucket queue, O(E+N) in C++).  Use instead
    of RCM for small-world / community graphs: RCM's BFS frontier leaks
    through long-range edges, so it cannot recover community structure — this
    pass directly minimizes the spatial-shard edge cut and the band-window
    density the TPU kernels consume.  ``cluster_size``: for spatial shards,
    match the shard size; for the BAND, larger clusters beat window-sized
    ones — the greedy absorption order is itself local, so 8-16× the window
    measures best (arxiv-scale sweep: cluster 16384 / window 1024 → coverage
    0.916 vs 0.884 at 4096; window-sized clusters LOSE coverage because the
    cluster boundary cuts through window-reachable neighborhoods).
    """
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    from .. import native

    perm = native.cluster_order(senders, receivers, num_nodes, cluster_size)
    if perm is not None:
        return perm.astype(np.int64)
    return _cluster_numpy(senders, receivers, num_nodes, cluster_size)


def _cluster_numpy(senders, receivers, num_nodes: int,
                   cluster_size: int) -> np.ndarray:
    """Pure-python fallback (heap-based; small graphs only)."""
    import heapq

    s = np.concatenate([senders, receivers]).astype(np.int64)
    r = np.concatenate([receivers, senders]).astype(np.int64)
    order_e = np.argsort(s, kind="stable")
    s, r = s[order_e], r[order_e]
    ptr = np.zeros(num_nodes + 1, np.int64)
    np.add.at(ptr, s + 1, 1)
    np.cumsum(ptr, out=ptr)
    degree = np.diff(ptr)
    by_deg = np.argsort(degree, kind="stable")
    placed = np.zeros(num_nodes, bool)
    score = np.zeros(num_nodes, np.int64)
    epoch = np.full(num_nodes, -1, np.int64)
    out = np.empty(num_nodes, np.int64)
    pos = 0
    scan = 0
    cur = 0
    while pos < num_nodes:
        while placed[by_deg[scan]]:
            scan += 1
        seed = int(by_deg[scan])
        cur += 1
        heap = [(-1, seed)]
        score[seed], epoch[seed] = 1, cur
        cnt = 0
        while cnt < cluster_size and heap:
            neg, u = heapq.heappop(heap)
            if placed[u] or epoch[u] != cur or score[u] != -neg:
                continue
            placed[u] = True
            out[pos] = u
            pos += 1
            cnt += 1
            for w in r[ptr[u]:ptr[u + 1]]:
                w = int(w)
                if placed[w]:
                    continue
                if epoch[w] != cur:
                    epoch[w], score[w] = cur, 0
                score[w] += 1
                heapq.heappush(heap, (-int(score[w]), w))
    return out


def invert_permutation(perm: np.ndarray) -> np.ndarray:
    """new_of_old[old_id] = new_id for perm[new_id] = old_id."""
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm), dtype=perm.dtype)
    return inv


def permute_graph(perm: np.ndarray, senders: np.ndarray, receivers: np.ndarray,
                  *arrays: Optional[np.ndarray]
                  ) -> Tuple[np.ndarray, ...]:
    """Relabel a graph by a node permutation (``perm[new_id] = old_id``).

    Returns (senders', receivers', *node_arrays') where node arrays (features,
    labels, masks — anything indexed by node id) are row-permuted to the new
    order.  Edge order is preserved (graph.build_graph re-sorts anyway).
    """
    perm = np.asarray(perm)
    inv = invert_permutation(perm)
    out = [inv[np.asarray(senders)], inv[np.asarray(receivers)]]
    for a in arrays:
        out.append(None if a is None else np.asarray(a)[perm])
    return tuple(out)


def bandwidth_stats(senders: np.ndarray, receivers: np.ndarray
                    ) -> Dict[str, float]:
    """Locality diagnostics: max/mean/percentile |s - r| over edges."""
    d = np.abs(np.asarray(senders, np.int64) - np.asarray(receivers, np.int64))
    if d.size == 0:
        return {"max": 0.0, "mean": 0.0, "p50": 0.0, "p95": 0.0, "p99": 0.0}
    return {
        "max": float(d.max()),
        "mean": float(d.mean()),
        "p50": float(np.percentile(d, 50)),
        "p95": float(np.percentile(d, 95)),
        "p99": float(np.percentile(d, 99)),
    }
