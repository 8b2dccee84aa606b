"""Random graph partitioning for cluster-wise training (ogbn-proteins workflow).

Rebuild of `utils/data_util.py:43-61` + `examples/ogb/ogbn_proteins/dataset.py:111-151`:
uniform-random node partition into k clusters; per-cluster subgraph keeps only
intra-cluster edges (cross-cluster edges dropped — the loss is logged, reference
`dataset.py:141-142`); eval averages predictions over several independent partitions
(`main.py:158-173`).

Here every cluster is padded to one fixed (node_pad, edge_pad) bucket so a single
compiled train step serves all clusters — and N clusters can train simultaneously,
one per chip (parallel/data_parallel.py)."""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..graph import Graph, build_graph


def random_partition_graph(rng: np.random.Generator, num_nodes: int,
                           cluster_number: int = 10) -> np.ndarray:
    """parts[i] = cluster of node i (uniform random, `utils/data_util.py:43-45`)."""
    return rng.integers(0, cluster_number, num_nodes).astype(np.int32)


def locality_partition_graph(rng: np.random.Generator, senders: np.ndarray,
                             receivers: np.ndarray, num_nodes: int,
                             cluster_number: int = 10,
                             balance_multiple: int = 1) -> np.ndarray:
    """Locality-aware replacement for the reference's uniform-random partition:
    greedy max-connectivity cluster ordering (data/reorder.cluster_order), cut
    into `cluster_number` contiguous, equal-size chunks, chunk ids shuffled.

    Cluster training drops cross-cluster edges (reference
    `ogbn_proteins/dataset.py:141-142` logs the loss — ~(k−1)/k of all edges
    under random partition); a locality-aware partition keeps far more edges
    per epoch, at the same per-cluster cost.  Re-randomization across epochs
    comes from rotating the cut offset (rng) rather than reshuffling nodes.
    """
    from .reorder import cluster_order, invert_permutation

    size = -(-num_nodes // cluster_number)
    perm = cluster_order(senders, receivers, num_nodes, cluster_size=size)
    rank = invert_permutation(np.asarray(perm))
    # rotate the cut point so successive epochs see different boundaries
    shift = int(rng.integers(0, num_nodes)) if num_nodes else 0
    parts = ((rank + shift) % num_nodes) // size
    # shuffle cluster ids (training visits clusters in shuffled order anyway)
    relabel = rng.permutation(cluster_number).astype(np.int32)
    return relabel[np.minimum(parts, cluster_number - 1).astype(np.int64)]


def generate_sub_graphs(
    senders: np.ndarray,
    receivers: np.ndarray,
    parts: np.ndarray,
    cluster_number: int,
    *,
    edge_attr: Optional[np.ndarray] = None,
    node_feats: Optional[Sequence[np.ndarray]] = None,
    node_pad: Optional[int] = None,
    edge_pad: Optional[int] = None,
    log_edge_loss: bool = True,
) -> Tuple[List[Graph], List[np.ndarray], List[List[np.ndarray]]]:
    """Split into per-cluster padded Graphs.

    Returns (graphs, node_index_lists, per_cluster_node_feats) where
    node_index_lists[c] gives the ORIGINAL node ids of cluster c's rows (for
    reassembling full-graph predictions, `ogbn_proteins/main.py:112-120`).
    """
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    num_nodes = parts.shape[0]

    from .. import native

    nat = native.partition_clusters(senders, receivers, parts, cluster_number)
    if nat is not None:  # C++ path: single O(E) pass instead of k boolean scans
        local_id, sizes, cl = nat
        node_lists = [np.flatnonzero(parts == c) for c in range(cluster_number)]
        cl_edges = [(ls, lr, ei) for (ls, lr, ei) in cl]
        ecounts = [len(ls) for ls, _, _ in cl_edges]
        kept = sum(ecounts)
        if log_edge_loss and senders.size:
            logging.getLogger("deep_gcns_torch_tpu").info(
                "partition into %d clusters drops %.2f%% cross-cluster edges",
                cluster_number, 100 * (1.0 - kept / senders.size))
    else:
        # numpy fallback
        local_id = np.zeros(num_nodes, np.int64)
        node_lists = []
        for c in range(cluster_number):
            ids = np.flatnonzero(parts == c)
            local_id[ids] = np.arange(ids.size)
            node_lists.append(ids)
        same = parts[senders] == parts[receivers]
        if log_edge_loss:
            lost = 1.0 - same.mean() if senders.size else 0.0
            logging.getLogger("deep_gcns_torch_tpu").info(
                "partition into %d clusters drops %.2f%% cross-cluster edges",
                cluster_number, 100 * lost)
        cl_edges = []
        ecounts = []
        for c in range(cluster_number):
            m = same & (parts[senders] == c)
            cl_edges.append((local_id[senders[m]], local_id[receivers[m]],
                             np.flatnonzero(m)))
            ecounts.append(int(m.sum()))

    if node_pad is None:
        node_pad = ((max(len(l) for l in node_lists) + 255) // 256) * 256
    if edge_pad is None:
        edge_pad = ((max(ecounts) + 511) // 512) * 512

    graphs, feats_out = [], []
    for c in range(cluster_number):
        ls, lr, ei = cl_edges[c]
        ea = edge_attr[ei] if edge_attr is not None else None
        g = build_graph(None, ls, lr, edge_attr=ea,
                        num_nodes=len(node_lists[c]), node_pad=node_pad,
                        edge_pad=edge_pad)
        graphs.append(g)
        if node_feats is not None:
            padded = []
            for nf in node_feats:
                out = np.zeros((node_pad,) + nf.shape[1:], nf.dtype)
                out[: len(node_lists[c])] = nf[node_lists[c]]
                padded.append(out)
            feats_out.append(padded)
    return graphs, node_lists, feats_out


def scatter_predictions(preds: Sequence[np.ndarray], node_lists: Sequence[np.ndarray],
                        num_nodes: int) -> np.ndarray:
    """Reassemble per-cluster padded predictions into full-graph order."""
    out = np.zeros((num_nodes,) + preds[0].shape[1:], preds[0].dtype)
    for p, ids in zip(preds, node_lists):
        out[ids] = p[: len(ids)]
    return out
