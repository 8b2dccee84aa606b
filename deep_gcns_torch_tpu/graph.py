"""Statically-shaped graph containers for XLA.

The reference (lightaime/deep_gcns_torch) represents graphs as a flat node matrix
``N×C`` plus an ``edge_index (2, E)`` COO list (PyG convention: ``edge_index[0]`` =
senders/sources j, ``edge_index[1]`` = receivers/targets i; see
``gcn_lib/sparse/torch_edge.py:94-104``).  XLA requires static shapes, so this module
provides the TPU-native equivalent: nodes and edges padded to fixed bucket sizes with
validity masks, edges sorted by receiver (so segment reductions stream contiguous
output rows), and an optional CSR ``row_ptr`` for Pallas kernels.

Padding convention
------------------
* padded node rows are zero, ``node_mask`` False.
* padded edges have ``senders = receivers = num_nodes_padded`` (an out-of-range
  sentinel; JAX segment ops drop out-of-range ids, and we additionally mask).
  Because the sentinel sorts after every valid id, sortedness by receiver holds.
* batching is block-diagonal concatenation with node-offset, exactly PyG's
  semantics (``torch_geometric.data.Batch``), cf. reference loaders
  (``examples/ppi/main.py:120-142``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = Any


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Graph:
    """A padded, fixed-shape (batched) graph.

    All array fields are data (traced); shapes carry the static padding sizes.
    """

    # Node features [N_pad, C] (float) — may be None before encoding.
    x: Optional[Array]
    # COO edge list, each [E_pad] int32. senders = source j, receivers = target i.
    # Valid edges are sorted by receiver (non-decreasing); padding uses sentinel N_pad.
    senders: Array
    receivers: Array
    # Optional edge features [E_pad, Ce].
    edge_attr: Optional[Array]
    # Validity masks.
    node_mask: Array  # [N_pad] bool
    edge_mask: Array  # [E_pad] bool
    # Actual counts (scalars, traced so batches of different true size share a program).
    n_node: Array
    n_edge: Array
    # Graph id per node for batched multi-graph data, [N_pad] int32 (padding rows get
    # num_graphs sentinel). None for single-graph data.
    node_graph: Optional[Array] = None
    # CSR row pointer [N_pad + 1] int32 (edge offsets per receiver), optional.
    row_ptr: Optional[Array] = None
    # CSC auxiliaries (edges re-sorted by SENDER) for the gather VJP: permutation
    # from receiver-sorted order, sorted senders, column pointer. Optional.
    csc_perm: Optional[Array] = None
    csc_senders: Optional[Array] = None
    csc_col_ptr: Optional[Array] = None
    # receivers re-sorted by sender (receivers[csc_perm], sentinel-padded) — lets the
    # fused aggregation backward gather node-space cotangents directly in CSC order.
    csc_receivers: Optional[Array] = None
    # raw edge features re-sorted by sender (edge_attr[csc_perm], zero-padded) — the
    # edge encoder is applied to BOTH orderings so the fused backward can emit
    # d(edge_emb) in CSC order without any device-side edge permute.
    edge_attr_csc: Optional[Array] = None
    # band-dense adjacency (ops/band.BandPair) for locality-ordered graphs —
    # attach with `attach_band`; convs route their aggregation through the
    # gather-free band kernel when present (ops/band.band_ok).
    band: Optional[Any] = None
    # Static number of graphs in the batch (needed as static segment count for pooling).
    num_graphs: int = dataclasses.field(default=1, metadata=dict(static=True))

    @property
    def num_nodes_padded(self) -> int:
        return self.node_mask.shape[0]

    @property
    def num_edges_padded(self) -> int:
        return self.edge_mask.shape[0]

    def replace(self, **kw) -> "Graph":
        return dataclasses.replace(self, **kw)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_graph(
    x: Optional[np.ndarray],
    senders: np.ndarray,
    receivers: np.ndarray,
    *,
    edge_attr: Optional[np.ndarray] = None,
    num_nodes: Optional[int] = None,
    node_graph: Optional[np.ndarray] = None,
    num_graphs: int = 1,
    node_pad: Optional[int] = None,
    edge_pad: Optional[int] = None,
    pad_multiple: int = 256,
    edge_pad_multiple: int = 1024,
    sort_edges: bool = True,
    with_row_ptr: bool = True,
    with_csc: bool = True,
) -> Graph:
    """Host-side constructor: sorts edges by receiver, pads to bucket sizes.

    ``node_pad``/``edge_pad`` override the default round-up bucketing (use a fixed
    bucket across steps to avoid recompilation). Defaults align with the Pallas
    kernel tiles (ops/spmm_pallas.py: node-row blocks and the WIDE 1024-edge
    stream tile) and a CSR row_ptr is built by default so convs can take the
    fused kernel path.
    """
    senders = np.asarray(senders, np.int32)
    receivers = np.asarray(receivers, np.int32)
    n_edge = int(senders.shape[0])
    if num_nodes is None:
        if x is not None:
            num_nodes = int(x.shape[0])
        else:
            num_nodes = int(max(senders.max(initial=-1), receivers.max(initial=-1)) + 1)
    n_node = int(num_nodes)

    native_rp = None
    if sort_edges and n_edge > 0:
        from . import native

        res = native.sort_edges_csr(senders, receivers, n_node)
        if res is not None:  # C++ counting sort: O(E+N), ~10x numpy argsort
            senders, receivers, order, native_rp = res
        else:
            order = np.argsort(receivers, kind="stable")
            senders = senders[order]
            receivers = receivers[order]
        if edge_attr is not None:
            edge_attr = np.asarray(edge_attr)[order]

    n_pad = node_pad if node_pad is not None else _round_up(max(n_node, 1), pad_multiple)
    e_pad = edge_pad if edge_pad is not None else _round_up(max(n_edge, 1), edge_pad_multiple)
    if n_pad < n_node or e_pad < n_edge:
        raise ValueError(f"padding too small: nodes {n_node}>{n_pad} or edges {n_edge}>{e_pad}")

    def pad_rows(a: Optional[np.ndarray], rows: int, fill=0):
        if a is None:
            return None
        a = np.asarray(a)
        out = np.full((rows,) + a.shape[1:], fill, dtype=a.dtype)
        out[: a.shape[0]] = a
        return out

    sentinel = np.int32(n_pad)
    s_p = np.full((e_pad,), sentinel, np.int32)
    r_p = np.full((e_pad,), sentinel, np.int32)
    s_p[:n_edge] = senders
    r_p[:n_edge] = receivers

    node_mask = np.zeros((n_pad,), bool)
    node_mask[:n_node] = True
    edge_mask = np.zeros((e_pad,), bool)
    edge_mask[:n_edge] = True

    ng = None
    if node_graph is not None:
        ng = np.full((n_pad,), np.int32(num_graphs), np.int32)
        ng[:n_node] = np.asarray(node_graph, np.int32)[:n_node]

    rp = None
    if with_row_ptr:
        if native_rp is not None:
            rp = np.empty((n_pad + 1,), np.int32)
            rp[: n_node + 1] = native_rp
            rp[n_node + 1:] = native_rp[-1]
        else:
            counts = np.bincount(receivers[:n_edge], minlength=n_pad).astype(np.int64)
            rp = np.zeros((n_pad + 1,), np.int32)
            np.cumsum(counts, out=rp[1:][: n_pad])  # type: ignore[call-overload]
            rp = rp.astype(np.int32)

    csc_perm = csc_senders = csc_col_ptr = csc_receivers = edge_attr_csc = None
    if with_csc and n_edge > 0:
        from . import native

        res = native.sort_edges_csr(receivers[:n_edge], senders[:n_edge], n_node)
        if res is not None:
            _, ss, order, cp = res
        else:
            order = np.argsort(senders[:n_edge], kind="stable").astype(np.int32)
            ss = senders[order]
            counts = np.bincount(ss, minlength=n_node)
            cp = np.zeros(n_node + 1, np.int64)
            np.cumsum(counts, out=cp[1:])
            cp = cp.astype(np.int32)
        csc_perm = np.full((e_pad,), e_pad - 1, np.int32)
        csc_perm[:n_edge] = order
        csc_senders = np.full((e_pad,), sentinel, np.int32)
        csc_senders[:n_edge] = ss
        csc_col_ptr = np.empty((n_pad + 1,), np.int32)
        csc_col_ptr[: n_node + 1] = cp
        csc_col_ptr[n_node + 1:] = cp[-1]
        csc_receivers = np.full((e_pad,), sentinel, np.int32)
        csc_receivers[:n_edge] = receivers[order]
        if edge_attr is not None:
            ea = np.asarray(edge_attr)
            edge_attr_csc = np.zeros((e_pad,) + ea.shape[1:], ea.dtype)
            edge_attr_csc[:n_edge] = ea[order]

    return Graph(
        x=None if x is None else pad_rows(np.asarray(x), n_pad),
        senders=s_p,
        receivers=r_p,
        edge_attr=pad_rows(edge_attr, e_pad),
        node_mask=node_mask,
        edge_mask=edge_mask,
        n_node=np.int32(n_node),
        n_edge=np.int32(n_edge),
        node_graph=ng,
        row_ptr=rp,
        csc_perm=csc_perm,
        csc_senders=csc_senders,
        csc_col_ptr=csc_col_ptr,
        csc_receivers=csc_receivers,
        edge_attr_csc=edge_attr_csc,
        num_graphs=num_graphs,
    )


def batch_graphs(
    graphs: Sequence[dict],
    *,
    node_pad: Optional[int] = None,
    edge_pad: Optional[int] = None,
    pad_multiple: int = 256,
    with_row_ptr: bool = True,
) -> Graph:
    """Block-diagonal batch of raw host graphs (PyG `Batch.from_data_list` semantics).

    Each element is a dict with keys: ``x`` [n,C] (optional), ``senders``, ``receivers``
    (int arrays), optional ``edge_attr``, optional ``num_nodes``.
    """
    xs, ss, rs, eas, gids = [], [], [], [], []
    off = 0
    for g_i, g in enumerate(graphs):
        n = int(g["num_nodes"]) if "num_nodes" in g else int(np.asarray(g["x"]).shape[0])
        if "x" in g and g["x"] is not None:
            xs.append(np.asarray(g["x"]))
        ss.append(np.asarray(g["senders"], np.int64) + off)
        rs.append(np.asarray(g["receivers"], np.int64) + off)
        if g.get("edge_attr") is not None:
            eas.append(np.asarray(g["edge_attr"]))
        gids.append(np.full((n,), g_i, np.int32))
        off += n
    x = np.concatenate(xs, 0) if xs else None
    ea = np.concatenate(eas, 0) if eas else None
    return build_graph(
        x,
        np.concatenate(ss, 0),
        np.concatenate(rs, 0),
        edge_attr=ea,
        num_nodes=off,
        node_graph=np.concatenate(gids, 0),
        num_graphs=len(graphs),
        node_pad=node_pad,
        edge_pad=edge_pad,
        pad_multiple=pad_multiple,
        with_row_ptr=with_row_ptr,
    )


def attach_band(g: Graph, window="auto", hubs="auto") -> Graph:
    """Host-side: build the band-dense adjacency (ops/band.BandPair) from the
    graph's valid edges and attach it.  Profitable for locality-ordered graphs
    (run data/reorder.rcm_order or cluster_order first); `g.band.fwd.coverage`
    reports the gather-free edge fraction (window band + hub matmuls — see
    ops/band.Band; ``hubs="auto"`` extracts degree-≥256 nodes into dense hub
    corrections, a no-op on uniform-degree graphs).  Call before
    `jax.device_put`."""
    from .ops.band import build_band_pair

    n_edge = int(g.n_edge)
    senders = np.asarray(g.senders)[:n_edge]
    receivers = np.asarray(g.receivers)[:n_edge]
    pair = build_band_pair(senders, receivers, g.num_nodes_padded, window, hubs)
    return g.replace(band=pair)


def to_device(g: Graph, device=None) -> Graph:
    return jax.device_put(g, device)


def add_self_loops(senders: np.ndarray, receivers: np.ndarray, num_nodes: int,
                   remove_existing: bool = True):
    """Host-side: optionally drop existing self loops, then append one per node
    (reference: `torch_geometric.utils.add_self_loops` used at
    `gcn_lib/sparse/torch_vertex.py:176-177`, `examples/ogb/ogbn_arxiv/main.py:71-75`)."""
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    if remove_existing:
        keep = senders != receivers
        senders, receivers = senders[keep], receivers[keep]
    loop = np.arange(num_nodes, dtype=np.int64)
    return np.concatenate([senders, loop]), np.concatenate([receivers, loop])


def to_undirected(senders: np.ndarray, receivers: np.ndarray):
    """Host-side symmetrize + dedup (reference `examples/ogb/ogbn_arxiv/main.py:61-75`)."""
    s = np.concatenate([senders, receivers]).astype(np.int64)
    r = np.concatenate([receivers, senders]).astype(np.int64)
    n = max(int(s.max(initial=0)), int(r.max(initial=0))) + 1
    key = s * n + r
    _, idx = np.unique(key, return_index=True)
    return s[idx], r[idx]
