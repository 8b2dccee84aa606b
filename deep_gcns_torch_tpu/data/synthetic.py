"""Synthetic graph generators for tests and benchmarks (this image has no network
egress, so OGB downloads are unavailable; benchmark graphs are sized like the real
datasets: ogbn-arxiv ≈ 169k nodes / 2.3M directed edges, ogbn-proteins ≈ 132k nodes /
79M edges split into ~10 clusters)."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..graph import Graph, add_self_loops, build_graph, to_undirected


def random_node_graph(rng: np.random.Generator, n: int, avg_degree: int, c: int,
                      num_classes: int = 0, edge_dim: int = 0,
                      node_pad: Optional[int] = None, edge_pad: Optional[int] = None,
                      self_loops: bool = False, undirected: bool = False,
                      with_row_ptr: bool = True):
    """Uniform random graph with features (and labels), returns (Graph, labels)."""
    e = n * avg_degree
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    if undirected:
        s, r = to_undirected(s, r)
    if self_loops:
        s, r = add_self_loops(s, r, n)
    x = rng.standard_normal((n, c)).astype(np.float32)
    ea = rng.standard_normal((len(s), edge_dim)).astype(np.float32) if edge_dim else None
    g = build_graph(x, s, r, edge_attr=ea, num_nodes=n, node_pad=node_pad,
                    edge_pad=edge_pad, with_row_ptr=with_row_ptr)
    labels = rng.integers(0, num_classes, n) if num_classes else None
    return g, labels


def sbm_arxiv_like(rng: np.random.Generator, n: int = 4096, num_classes: int = 16,
                   c: int = 32, avg_degree: int = 12, homophily: float = 0.9,
                   node_pad: Optional[int] = None, edge_pad: Optional[int] = None
                   ) -> Tuple[Graph, np.ndarray]:
    """Stochastic-block-model node-classification task: learnable signal for
    end-to-end accuracy tests (the TPU stand-in for the ogbn-arxiv slice)."""
    labels = rng.integers(0, num_classes, n)
    # class-informative features + noise
    centers = rng.standard_normal((num_classes, c)).astype(np.float32)
    x = centers[labels] + 1.5 * rng.standard_normal((n, c)).astype(np.float32)
    # edges: homophilous w.p. `homophily`
    e = n * avg_degree
    src = rng.integers(0, n, e)
    same = rng.random(e) < homophily
    # sample targets from the same class where homophilous
    perm_by_class = {k: np.flatnonzero(labels == k) for k in range(num_classes)}
    dst = rng.integers(0, n, e)
    for k, idx in perm_by_class.items():
        m = same & (labels[src] == k)
        if idx.size and m.any():
            dst[m] = idx[rng.integers(0, idx.size, int(m.sum()))]
    s, r = to_undirected(src, dst)
    s, r = add_self_loops(s, r, n)
    g = build_graph(x, s, r, num_nodes=n, node_pad=node_pad, edge_pad=edge_pad)
    return g, labels


def powerlaw_community_edges(rng: np.random.Generator, n: int, avg_degree: int,
                             n_comm: int = 256, homophily: float = 0.9,
                             alpha: float = 0.8
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """Hub-heavy community graph: the adversarial REALISTIC shape for the
    band path (a citation/social graph stand-in, NOT a uniform band).

    Sender sampling weight follows a shuffled power law (exponent ``alpha`` —
    at 0.8/arxiv scale the top 512 senders carry ~25% of edges, max out-degree
    ~46k), receivers stay in the sender's community w.p. ``homophily`` and are
    uniform otherwise.  Node ids arrive SHUFFLED: callers must recover layout
    with data/reorder.cluster_order before attaching a band."""
    e = n * avg_degree
    comm = rng.integers(0, n_comm, n)
    w = (1.0 / (1.0 + np.arange(n, dtype=np.float64))) ** alpha
    rng.shuffle(w)
    s = rng.choice(n, e, p=w / w.sum())
    r = rng.integers(0, n, e)
    same = rng.random(e) < homophily
    for k in range(n_comm):
        m = same & (comm[s] == k)
        idx = np.flatnonzero(comm == k)
        if m.any() and idx.size:
            r[m] = idx[rng.integers(0, idx.size, int(m.sum()))]
    return s.astype(np.int64), r.astype(np.int64)
