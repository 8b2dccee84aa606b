"""Spatial (edge-partitioned) graph parallelism — exact full-graph training across
chips.

This is the framework's novel distributed component (SURVEY §2.7): the reference
scales big graphs by *lossy sequential* random partitioning (cross-cluster edges
dropped, `examples/ogb/ogbn_proteins/dataset.py:117-144`); here the graph is
edge-partitioned across a device mesh and trained *exactly*:

  * nodes are sharded contiguously: device d owns rows [d·S, (d+1)·S);
  * each device owns every edge whose RECEIVER it owns (receivers re-indexed to the
    local shard; senders stay global), sorted by local receiver with a local CSR;
  * per layer, remote source activations cross ICI in one of two exchange modes:

    - **halo** (default when cheaper): the host precomputes, per ordered device
      pair (p → d), the boundary set H[p→d] = unique senders that d's edges need
      from p.  Each layer, device p gathers its boundary rows into a [D, H_pad, C]
      send buffer and ONE `all_to_all` delivers every boundary row to its
      consumers; senders were re-indexed on the host into the device's extended
      table [local S rows ‖ halo rows], so the message gather is local.  Comm
      volume ∝ boundary size, NOT N (SURVEY §7 hard-part 4).  The collective's
      autodiff transpose is the reverse all_to_all — gradients flow exactly.
    - **allgather** (fallback; optimal for boundary-dense graphs): the full [N, C]
      activation table is all-gathered per layer; the transpose is a
      reduce-scatter.  On an ER-random graph every shard needs almost every other
      node, so halo padding would exceed N and this path wins.

    `exchange="auto"` picks per-graph from the static shard shapes
    (D·H_pad vs (D−1)·S rows per device per layer).
  * aggregation lands on local receivers only; parameter grads are all-reduced.

No cross-partition edge is ever dropped: multi-chip output equals the single-chip
model bit-for-bit (see tests/test_spatial.py oracle).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..graph import Graph
from ..models.deeper_gcn import DeeperGCN, DeeperGCNConfig
from ..nn.core import dropout
from ..ops.segment import generalized_aggregate

Array = jax.Array


# ---------------------------------------------------------------------------
# host-side sharding
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SpatialShards:
    """Per-device edge shards, leading axis = device. All receivers are LOCAL row
    ids; senders are GLOBAL node ids."""

    senders: Array        # [D, E_pad] int32, global
    receivers: Array      # [D, E_pad] int32, local in [0, S) (+ sentinel S)
    edge_attr: Optional[Array]   # [D, E_pad, Ce]
    edge_mask: Array      # [D, E_pad]
    row_ptr: Array        # [D, S+1]
    node_mask: Array      # [D, S]
    # halo-exchange aux (None when built with halo=False):
    # senders re-indexed into the extended local table [S local ‖ D·H_pad halo]
    senders_ext: Optional[Array] = None   # [D, E_pad] int32, sentinel = S + D·H_pad
    # send_idx[p, d] = LOCAL rows device p sends to device d (0-padded)
    send_idx: Optional[Array] = None      # [D, D, H_pad] int32
    shard_size: int = dataclasses.field(default=0, metadata=dict(static=True))
    num_nodes_padded: int = dataclasses.field(default=0, metadata=dict(static=True))
    halo_pad: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def halo_rows_per_device(self) -> int:
        """Rows each device ships per layer on the halo path (incl. padding)."""
        return (self.send_idx.shape[1] * self.halo_pad
                if self.send_idx is not None else 0)


def shard_graph(senders: np.ndarray, receivers: np.ndarray, num_nodes: int,
                n_dev: int, *, edge_attr: Optional[np.ndarray] = None,
                node_multiple: int = 256, edge_multiple: int = 512,
                halo: bool = True, halo_multiple: int = 8) -> SpatialShards:
    """Build per-device shards (host side); with halo=True also precompute the
    boundary send/recv index sets for the halo-exchange path."""
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    S = ((num_nodes + n_dev * node_multiple - 1) // (n_dev * node_multiple)
         ) * node_multiple
    n_pad = S * n_dev

    owner = receivers // S
    e_max = 0
    per_dev = []
    for d in range(n_dev):
        m = owner == d
        s_d, r_d = senders[m], receivers[m] - d * S
        order = np.argsort(r_d, kind="stable")
        s_d, r_d = s_d[order], r_d[order]
        ea_d = edge_attr[m][order] if edge_attr is not None else None
        per_dev.append((s_d, r_d, ea_d))
        e_max = max(e_max, len(s_d))
    e_pad = ((e_max + edge_multiple - 1) // edge_multiple) * edge_multiple

    S_arr = np.full((n_dev, e_pad), S, np.int32)      # receiver sentinel = S
    G_arr = np.full((n_dev, e_pad), n_pad, np.int32)  # sender sentinel
    EA = (np.zeros((n_dev, e_pad, edge_attr.shape[1]), edge_attr.dtype)
          if edge_attr is not None else None)
    EM = np.zeros((n_dev, e_pad), bool)
    RP = np.zeros((n_dev, S + 1), np.int32)
    NM = np.zeros((n_dev, S), bool)
    for d, (s_d, r_d, ea_d) in enumerate(per_dev):
        ne = len(s_d)
        G_arr[d, :ne] = s_d
        S_arr[d, :ne] = r_d
        EM[d, :ne] = True
        if EA is not None and ne:
            EA[d, :ne] = ea_d
        counts = np.bincount(r_d, minlength=S)
        RP[d, 1:] = np.cumsum(counts)
        lo, hi = d * S, min((d + 1) * S, num_nodes)
        NM[d, : max(hi - lo, 0)] = True

    senders_ext = send_idx = None
    h_pad = 0
    if halo:
        # halo_sets[d][p] = sorted unique GLOBAL senders that d's edges need from
        # device p (p != d).  send_idx is its transpose view: rows p ships to d.
        halo_sets = []
        for d, (s_d, _, _) in enumerate(per_dev):
            owners = s_d // S
            halo_sets.append([
                np.unique(s_d[owners == p]) if p != d else np.empty(0, np.int64)
                for p in range(n_dev)])
        h_max = max((len(hs) for sets in halo_sets for hs in sets), default=0)
        h_pad = max(((h_max + halo_multiple - 1) // halo_multiple) * halo_multiple,
                    halo_multiple)
        ext_size = S + n_dev * h_pad
        send_idx = np.zeros((n_dev, n_dev, h_pad), np.int32)
        for d in range(n_dev):
            for p in range(n_dev):
                hs = halo_sets[d][p]
                send_idx[p, d, : len(hs)] = hs - p * S
        senders_ext = np.full((n_dev, e_pad), ext_size, np.int32)  # sentinel
        for d, (s_d, _, _) in enumerate(per_dev):
            ne = len(s_d)
            owners = s_d // S
            loc = np.empty(ne, np.int64)
            for p in range(n_dev):
                m = owners == p
                if not m.any():
                    continue
                if p == d:
                    loc[m] = s_d[m] - d * S
                else:
                    loc[m] = (S + p * h_pad
                              + np.searchsorted(halo_sets[d][p], s_d[m]))
            senders_ext[d, :ne] = loc

    return SpatialShards(senders=G_arr, receivers=S_arr, edge_attr=EA,
                         edge_mask=EM, row_ptr=RP, node_mask=NM,
                         senders_ext=senders_ext, send_idx=send_idx,
                         shard_size=S, num_nodes_padded=n_pad, halo_pad=h_pad)


def shard_nodes(x: np.ndarray, shards: SpatialShards) -> np.ndarray:
    """[N, C] → [D, S, C] zero-padded."""
    S, n_pad = shards.shard_size, shards.num_nodes_padded
    d = n_pad // S
    out = np.zeros((n_pad,) + x.shape[1:], x.dtype)
    out[: len(x)] = x
    return out.reshape(d, S, *x.shape[1:])


# ---------------------------------------------------------------------------
# boundary exchange (runs INSIDE shard_map) — shared by SpatialDeeperGCN and
# the reversible composition (parallel/spatial_rev.py)
# ---------------------------------------------------------------------------

def use_halo(sh: SpatialShards, exchange: str = "auto") -> bool:
    """Static (trace-time) choice between halo all-to-all and full all-gather."""
    if exchange == "allgather" or sh.send_idx is None:
        return False
    if exchange == "halo":
        return True
    # auto: halo wins when it ships fewer rows per device per layer than the
    # all-gather ((D-1)·S); all quantities are static → decided at trace time.
    d = sh.send_idx.shape[1]
    return d * sh.halo_pad < (d - 1) * sh.shard_size


def exchange_sources(h_local, sh: SpatialShards, axis: str,
                     exchange: str = "auto"):
    """Return (source table, sender index array [E_pad]) for this device."""
    if not use_halo(sh, exchange):
        # full-table all-gather (bwd transposes to reduce-scatter)
        h_full = jax.lax.all_gather(h_local, axis, axis=0, tiled=True)
        return h_full, sh.senders[0]
    # halo: gather my boundary rows per destination, one all-to-all delivers
    # every boundary row to its consumers; extended table = [local ‖ halo].
    my_send = sh.send_idx[0]                       # [D, H_pad] local rows
    send_buf = jnp.take(h_local, my_send, axis=0)  # [D, H_pad, C]
    recv = jax.lax.all_to_all(send_buf, axis, split_axis=0,
                              concat_axis=0, tiled=True)
    h_ext = jnp.concatenate(
        [h_local, recv.reshape(-1, h_local.shape[-1])], axis=0)
    return h_ext, sh.senders_ext[0]


# ---------------------------------------------------------------------------
# spatial DeeperGCN forward (runs INSIDE shard_map; params replicated)
# ---------------------------------------------------------------------------

class SpatialDeeperGCN:
    """Parallel twin of models.DeeperGCN (same params/state pytrees — init with a
    plain DeeperGCN): res+/res/plain blocks where each GENConv exchanges boundary
    activations over `axis` (halo all-to-all or full all-gather, see module doc)
    and aggregates into the local receiver shard.

    Graph-pooled workloads (ogbg_mol / ogbg_ppa virtual-node or pooling heads) are
    many-small-graph batches — spatial partitioning of one graph does not apply;
    use `parallel.cluster_dp_train_step` (one graph batch per device) for those.
    """

    def __init__(self, cfg: DeeperGCNConfig, axis: str = "gp",
                 exchange: str = "auto"):
        assert cfg.block in ("res+", "res", "plain"), (
            f"spatial path implements res+/res/plain blocks, not {cfg.block!r}")
        assert not cfg.add_virtual_node and not cfg.graph_pooling, (
            "graph-pooled / virtual-node workloads are per-graph batches — use "
            "parallel.cluster_dp_train_step instead of spatial partitioning")
        assert exchange in ("auto", "halo", "allgather")
        self.cfg = cfg
        self.axis = axis
        self.exchange = exchange
        self.inner = DeeperGCN(cfg)

    def init(self, key):
        return self.inner.init(key)

    # -- boundary exchange ----------------------------------------------------
    def _use_halo(self, sh: SpatialShards) -> bool:
        return use_halo(sh, self.exchange)

    def _exchange(self, h_local, sh: SpatialShards):
        return exchange_sources(h_local, sh, self.axis, self.exchange)

    # -- one GENConv on a shard --------------------------------------------
    def _gcn_apply(self, lp, ls, h_local, sh: SpatialShards, d_index, edge_emb,
                   train, rng, axis_name):
        cfg = self.cfg
        gcn = self.inner._gcn
        h_full, senders = self._exchange(h_local, sh)
        my = jax.tree_util.tree_map(lambda a: a[0], sh)  # strip device axis
        enc = gcn._edge_encoder()
        if edge_emb is None and enc is not None and my.edge_attr is not None:
            edge_emb, _ = enc.apply(lp["edge_encoder"], {}, my.edge_attr)
        msg = jnp.take(h_full, jnp.minimum(senders, h_full.shape[0] - 1), axis=0)
        if edge_emb is not None:
            msg = msg + edge_emb
        msg = jax.nn.relu(msg) + gcn.eps
        t = lp.get("t", gcn.t)
        if isinstance(t, jax.Array) and not (
                gcn.learn_t and gcn.aggr in ("softmax", "softmax_sum")):
            t = jax.lax.stop_gradient(t)
        m = generalized_aggregate(
            msg, my.receivers, my.node_mask.shape[0], aggr=gcn.aggr,
            t=t, p=lp.get("p", gcn.p), y=lp.get("y", gcn.y), learn_t=gcn.learn_t,
            mask=my.edge_mask, row_ptr=my.row_ptr)
        h = h_local + m
        out, mlp_state = gcn._mlp().apply(lp["mlp"], ls.get("mlp", {}), h,
                                          train=train, rng=rng,
                                          mask=my.node_mask, axis_name=axis_name)
        return out, {**ls, "mlp": mlp_state}

    # -- full forward (mirror of DeeperGCN.apply res+ branch) ---------------
    def apply_sharded(self, params, state, x_local, sh: SpatialShards, *,
                      train=False, rng=None):
        cfg = self.cfg
        L = cfg.num_layers
        axis = self.axis
        inner = self.inner
        my_mask = sh.node_mask[0]
        d_index = jax.lax.axis_index(axis)

        h, _ = inner._encoder.apply(params["encoder"], {}, x_local)
        edge_emb = None
        if inner._edge_encoder is not None and sh.edge_attr is not None:
            edge_emb, _ = inner._edge_encoder.apply(params["edge_encoder"], {},
                                                    sh.edge_attr[0])

        def layer_rng(i):
            if rng is None:
                return None
            # deterministic per (device, layer)
            return jax.random.fold_in(jax.random.fold_in(rng, i), d_index)

        sl = inner._slice
        if cfg.block == "res+":
            h, gs0 = self._gcn_apply(sl(params["gcns"], 0), sl(state["gcns"], 0),
                                     h, sh, d_index, edge_emb, train, layer_rng(0),
                                     axis)

            def body(carry, i):
                h = carry
                np_, ns_ = sl(params["norms"], i - 1), sl(state["norms"], i - 1)
                gp_, gss = sl(params["gcns"], i), sl(state["gcns"], i)
                r = layer_rng(i)
                h1, ns_out = inner._norm.apply(np_, ns_, h, train=train,
                                               mask=my_mask, axis_name=axis)
                h2 = jax.nn.relu(h1)
                h2 = dropout(h2, cfg.dropout, train=train,
                             rng=None if r is None else jax.random.fold_in(r, 1))
                res, gs_out = self._gcn_apply(gp_, gss, h2, sh, d_index, edge_emb,
                                              train, r, axis)
                return h + res, (ns_out, gs_out)

            body_fn = jax.checkpoint(body) if cfg.remat else body
            h, (norm_states, gcn_states) = jax.lax.scan(body_fn, h,
                                                        jnp.arange(1, L))

            npL, nsL = sl(params["norms"], L - 1), sl(state["norms"], L - 1)
            h1, nsL_out = inner._norm.apply(npL, nsL, h, train=train, mask=my_mask,
                                            axis_name=axis)
            h = jax.nn.relu(h1) if cfg.final_relu else h1
            if cfg.final_dropout:
                h = dropout(h, cfg.dropout, train=train, rng=layer_rng(L))
            new_state = {
                "gcns": jax.tree_util.tree_map(
                    lambda first, rest: jnp.concatenate([first[None], rest], 0),
                    gs0, gcn_states),
                "norms": jax.tree_util.tree_map(
                    lambda rest, last: jnp.concatenate([rest, last[None]], 0),
                    norm_states, nsL_out),
            }
        else:  # res / plain (`ogbn_arxiv/model.py:111-130` semantics)
            def body(carry, i):
                h = carry
                gp_, gss = sl(params["gcns"], i), sl(state["gcns"], i)
                np_, ns_ = sl(params["norms"], i), sl(state["norms"], i)
                r = layer_rng(i)
                h1, gs_out = self._gcn_apply(gp_, gss, h, sh, d_index, edge_emb,
                                             train, r, axis)
                h2, ns_out = inner._norm.apply(np_, ns_, h1, train=train,
                                               mask=my_mask, axis_name=axis)
                h3 = jax.nn.relu(h2)
                h_out = h3 + h if cfg.block == "res" else h3
                h_out = dropout(h_out, cfg.dropout, train=train,
                                rng=None if r is None else jax.random.fold_in(r, 1))
                return h_out, (ns_out, gs_out)

            body_fn = jax.checkpoint(body) if cfg.remat else body
            h, (norm_states, gcn_states) = jax.lax.scan(body_fn, h, jnp.arange(L))
            new_state = {"gcns": gcn_states, "norms": norm_states}

        out, _ = inner._pred.apply(params["pred"], {}, h)
        return out, new_state


def spatial_forward(model: SpatialDeeperGCN, mesh: Mesh, axis: str = "gp"):
    """Jitted sharded inference: (params, state, x [D,S,C], shards) → logits [D,S,T]."""

    def _fwd(params, state, x, sh):
        out, _ = model.apply_sharded(params, state, x[0], sh, train=False)
        return out[None]

    fn = shard_map(_fwd, mesh=mesh,
                   in_specs=(P(), P(), P(axis), P(axis)),
                   out_specs=P(axis), )
    return jax.jit(fn)


def spatial_train_step(model: SpatialDeeperGCN, tx, loss_fn, mesh: Mesh,
                       axis: str = "gp"):
    """Jitted sharded train step: per-shard loss (masked), psum'd grads, optax."""

    def _step(params, state, opt_state, x, sh, labels, lmask, rng):
        import optax

        x, labels, lmask = x[0], labels[0], lmask[0]

        def lossf(p):
            logits, s2 = model.apply_sharded(p, state, x, sh, train=True, rng=rng)
            # loss_fn must return (sum, count) so the cross-shard mean is exact
            ls, cnt = loss_fn(logits, labels, lmask)
            ls = jax.lax.psum(ls, axis)
            cnt = jax.lax.psum(cnt, axis)
            return ls / jnp.maximum(cnt, 1.0), s2

        (loss, s2), grads = jax.value_and_grad(lossf, has_aux=True)(params)
        # the loss is already globally reduced (psum inside lossf), and grads of
        # replicated params leave shard_map autodiff ALREADY psum'd across
        # devices (transpose of the implicit pbroadcast) — exactly the total
        # dL/dp this step needs; no further collective.
        updates, opt2 = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, s2, opt2, loss

    fn = shard_map(_step, mesh=mesh,
                   in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis), P()),
                   out_specs=(P(), P(), P(), P()))
    return jax.jit(fn, donate_argnums=(0, 2))
