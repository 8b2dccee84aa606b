"""Spatial (edge-partitioned) graph parallelism — exact full-graph training across
chips.

This is the framework's novel distributed component (SURVEY §2.7): the reference
scales big graphs by *lossy sequential* random partitioning (cross-cluster edges
dropped, `examples/ogb/ogbn_proteins/dataset.py:117-144`); here the graph is
edge-partitioned across a device mesh and trained *exactly*:

  * nodes are sharded contiguously: device d owns rows [d·S, (d+1)·S);
  * each device owns every edge whose RECEIVER it owns (receivers re-indexed to the
    local shard; senders stay global), sorted by local receiver with a local CSR;
  * per layer, node activations are all-gathered over ICI ([N, C] is small —
    ogbn-proteins at C=64 is 34 MB — and XLA overlaps the collective with compute),
    messages gather from the full table, aggregation lands on local receivers only;
  * the all-gather's autodiff transpose is a reduce-scatter — gradients flow
    exactly; parameter gradients are all-reduced.

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
    shard_size: int = dataclasses.field(default=0, metadata=dict(static=True))
    num_nodes_padded: int = dataclasses.field(default=0, metadata=dict(static=True))


def shard_graph(senders: np.ndarray, receivers: np.ndarray, num_nodes: int,
                n_dev: int, *, edge_attr: Optional[np.ndarray] = None,
                node_multiple: int = 256, edge_multiple: int = 512
                ) -> SpatialShards:
    """Build per-device shards (host side)."""
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
    return SpatialShards(senders=G_arr, receivers=S_arr, edge_attr=EA,
                         edge_mask=EM, row_ptr=RP, node_mask=NM,
                         shard_size=S, num_nodes_padded=n_pad)


def shard_nodes(x: np.ndarray, shards: SpatialShards) -> np.ndarray:
    """[N, C] → [D, S, C] zero-padded."""
    S, n_pad = shards.shard_size, shards.num_nodes_padded
    d = n_pad // S
    out = np.zeros((n_pad,) + x.shape[1:], x.dtype)
    out[: len(x)] = x
    return out.reshape(d, S, *x.shape[1:])


# ---------------------------------------------------------------------------
# spatial DeeperGCN forward (runs INSIDE shard_map; params replicated)
# ---------------------------------------------------------------------------

class SpatialDeeperGCN:
    """Parallel twin of models.DeeperGCN (same params/state pytrees — init with a
    plain DeeperGCN): res+ blocks where each GENConv all-gathers activations over
    `axis` and aggregates into the local receiver shard."""

    def __init__(self, cfg: DeeperGCNConfig, axis: str = "gp"):
        assert cfg.block == "res+", "spatial path implements the res+ block"
        assert not cfg.add_virtual_node
        self.cfg = cfg
        self.axis = axis
        self.inner = DeeperGCN(cfg)

    def init(self, key):
        return self.inner.init(key)

    # -- one GENConv on a shard --------------------------------------------
    def _gcn_apply(self, lp, ls, h_local, sh: SpatialShards, d_index, edge_emb,
                   train, rng, axis_name):
        cfg = self.cfg
        gcn = self.inner._gcn
        # gather sources from the full activation table (all-gather over ICI;
        # bwd transposes to reduce-scatter)
        h_full = jax.lax.all_gather(h_local, self.axis, axis=0, tiled=True)
        my = jax.tree_util.tree_map(lambda a: a[0], sh)  # strip device axis
        enc = gcn._edge_encoder()
        if edge_emb is None and enc is not None and my.edge_attr is not None:
            edge_emb, _ = enc.apply(lp["edge_encoder"], {}, my.edge_attr)
        msg = jnp.take(h_full, jnp.minimum(my.senders, h_full.shape[0] - 1), axis=0)
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
        h, gs0 = self._gcn_apply(sl(params["gcns"], 0), sl(state["gcns"], 0), h,
                                 sh, d_index, edge_emb, train, layer_rng(0), axis)

        def body(carry, i):
            h = carry
            np_, ns_ = sl(params["norms"], i - 1), sl(state["norms"], i - 1)
            gp_, gss = sl(params["gcns"], i), sl(state["gcns"], i)
            r = layer_rng(i)
            h1, ns_out = inner._norm.apply(np_, ns_, h, train=train, mask=my_mask,
                                           axis_name=axis)
            h2 = jax.nn.relu(h1)
            h2 = dropout(h2, cfg.dropout, train=train,
                         rng=None if r is None else jax.random.fold_in(r, 1))
            res, gs_out = self._gcn_apply(gp_, gss, h2, sh, d_index, edge_emb,
                                          train, r, axis)
            return h + res, (ns_out, gs_out)

        body_fn = jax.checkpoint(body) if cfg.remat else body
        h, (norm_states, gcn_states) = jax.lax.scan(body_fn, h, jnp.arange(1, L))

        npL, nsL = sl(params["norms"], L - 1), sl(state["norms"], L - 1)
        h1, nsL_out = inner._norm.apply(npL, nsL, h, train=train, mask=my_mask,
                                        axis_name=axis)
        h = jax.nn.relu(h1) if cfg.final_relu else h1
        if cfg.final_dropout:
            h = dropout(h, cfg.dropout, train=train, rng=layer_rng(L))
        out, _ = inner._pred.apply(params["pred"], {}, h)
        new_state = {
            "gcns": jax.tree_util.tree_map(
                lambda first, rest: jnp.concatenate([first[None], rest], 0),
                gs0, gcn_states),
            "norms": jax.tree_util.tree_map(
                lambda rest, last: jnp.concatenate([rest, last[None]], 0),
                norm_states, nsL_out),
        }
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
        grads = jax.lax.pmean(grads, axis)
        updates, opt2 = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, s2, opt2, loss

    fn = shard_map(_step, mesh=mesh,
                   in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis), P()),
                   out_specs=(P(), P(), P(), P()))
    return jax.jit(fn, donate_argnums=(0, 2))
