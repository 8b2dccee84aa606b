"""2-D mesh: spatial (edge-partitioned) × tensor (channel) parallelism.

The two axes shard DIFFERENT dimensions, so they compose cleanly on a
("gp", "tp") mesh:

  * "gp" shards NODES (parallel/spatial.py): each device row owns a node
    shard and its incoming edges; cross-shard source rows arrive by halo
    ppermutes or all-gather — per layer the exchange now moves [halo, C/T]
    rows (TP SHRINKS the spatial exchange by T×);
  * "tp" shards CHANNELS (parallel/tensor.py): message construction, the
    per-channel generalized softmax/power aggregation, and BatchNorm stats
    are channel-local; the update MLP is row-parallel with ONE psum_scatter
    over "tp" per layer; cross-replica BN statistics psum over "gp" only.

Parameters are channel-sharded with `tensor.shard_deeper_params` (the same
single-chip pytree — init a models.DeeperGCN, shard once, run on the mesh);
node arrays are sharded with `spatial.shard_graph`/`shard_nodes` exactly as
in the 1-D spatial runner.  Scope mirrors TPDeeperGCN: res+, linear
encoder, mlp_layers ≤ 2, batch/none/layer norms, no virtual node / one-hot /
msg_norm.  Oracle:
forward and one SGD step equal the single-chip model
(tests/test_spatial_tp.py).  The reference has no multi-GPU training at all.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.deeper_gcn import DeeperGCN, DeeperGCNConfig
from ..nn.core import dropout
from ..ops.segment import generalized_aggregate
from .spatial import SpatialShards, exchange_sources
from .tensor import check_tp_supported, tp_mlp_apply, tp_norm_apply

Array = jax.Array


class SpatialTPDeeperGCN:
    """DeeperGCN on a ("gp", "tp") mesh: nodes × channels sharded."""

    def __init__(self, cfg: DeeperGCNConfig, gp_axis: str = "gp",
                 tp_axis: str = "tp", exchange: str = "auto"):
        check_tp_supported(cfg)
        self.cfg = cfg
        self.gp = gp_axis
        self.tp = tp_axis
        self.exchange = exchange
        self.inner = DeeperGCN(cfg)

    def _aggregate(self, gp_params, h_local, sh, my, S):
        """GENConv message+aggregate on the (node-shard, channel-shard) tile;
        the source-row exchange crosses "gp", everything else is local.
        ``sh`` unstripped (exchange_sources' contract), ``my`` stripped."""
        gcn = self.inner._gcn
        t = gp_params.get("t", gcn.t)
        if isinstance(t, jax.Array) and not (
                gcn.learn_t and gcn.aggr in ("softmax", "softmax_sum")):
            t = jax.lax.stop_gradient(t)
        p_ = gp_params.get("p", gcn.p)
        if isinstance(p_, jax.Array) and not gcn.learn_p:
            p_ = jax.lax.stop_gradient(p_)
        y_ = gp_params.get("y", gcn.y)
        if isinstance(y_, jax.Array) and not gcn.learn_y:
            y_ = jax.lax.stop_gradient(y_)
        h_src, senders = exchange_sources(h_local, sh, self.gp, self.exchange)
        msg = jnp.take(h_src, jnp.minimum(senders, h_src.shape[0] - 1), axis=0)
        msg = jax.nn.relu(msg) + jnp.asarray(gcn.eps, h_local.dtype)
        return generalized_aggregate(
            msg, my.receivers, S, aggr=self.cfg.aggr, t=t, p=p_, y=y_,
            learn_t=gcn.learn_t, mask=my.edge_mask, row_ptr=my.row_ptr)

    def apply_sharded(self, params, state, x_local, sh: SpatialShards, *,
                      train: bool = False, rng: Optional[Array] = None):
        """Inside shard_map: params/state are this device's CHANNEL slices
        (tensor.shard_deeper_params leaves, leading axis stripped), x_local
        this device row's NODE shard [S, in_channels], sh its SpatialShards
        with the leading device axis INTACT (exchange_sources' contract)."""
        cfg = self.cfg
        L = cfg.num_layers
        my = jax.tree_util.tree_map(lambda a: a[0], sh)
        S = my.node_mask.shape[0]
        gp_i = jax.lax.axis_index(self.gp)
        tp_i = jax.lax.axis_index(self.tp)

        h = x_local @ params["encoder"]["w"] + params["encoder"]["b"]

        def layer_rng(i):
            if rng is None:
                return None
            r = jax.random.fold_in(rng, i)
            r = jax.random.fold_in(r, gp_i)
            return jax.random.fold_in(r, tp_i)

        def slice_l(tree, i):
            return jax.tree_util.tree_map(lambda a: a[i], tree)

        def gcn_block(gp_params, ws, h2):
            m = self._aggregate(gp_params, h2, sh, my, S)
            # the MLP's inter-layer BatchNorm reduces over GLOBAL nodes →
            # cross-replica stats over "gp"; channels stay shard-local
            return tp_mlp_apply(cfg, self.tp, gp_params["mlp"], ws, h2 + m,
                                train=train, mask=my.node_mask,
                                bn_axis=self.gp)

        def gcn_params(i):
            gp_params = {"mlp": slice_l(params["gcns"]["mlp"], i)}
            for k in ("t", "p", "y"):
                if k in params["gcns"]:
                    gp_params[k] = params["gcns"][k][i]
            return gp_params

        h, ws0 = gcn_block(gcn_params(0), slice_l(state["gcns"]["mlp"], 0), h)

        def body(carry, i):
            h = carry
            np_ = slice_l(params["norms"], i - 1)
            ns_ = slice_l(state["norms"], i - 1)
            # BatchNorm: stats per channel over the GLOBAL node set — the
            # cross-replica reduction runs over "gp" (channels are sharded,
            # not reduced); masked rows excluded as on one chip.  LayerNorm:
            # per-node over channels → one tp psum, no gp reduction.
            h1, ns_out = tp_norm_apply(self.inner._norm, cfg, self.tp, np_,
                                       ns_, h, train=train,
                                       mask=my.node_mask, bn_axis=self.gp)
            h2 = jax.nn.relu(h1)
            h2 = dropout(h2, cfg.dropout, train=train, rng=layer_rng(i))
            res, ws_out = gcn_block(gcn_params(i),
                                    slice_l(state["gcns"]["mlp"], i), h2)
            return h + res, (ns_out, ws_out)

        body_fn = jax.checkpoint(body) if cfg.remat else body
        h, (norm_states, mlp_states) = jax.lax.scan(body_fn, h,
                                                    jnp.arange(1, L))

        npL = slice_l(params["norms"], L - 1)
        nsL = slice_l(state["norms"], L - 1)
        h1, nsL_out = tp_norm_apply(self.inner._norm, cfg, self.tp, npL,
                                    nsL, h, train=train, mask=my.node_mask,
                                    bn_axis=self.gp)
        h = jax.nn.relu(h1) if cfg.final_relu else h1
        if cfg.final_dropout:
            h = dropout(h, cfg.dropout, train=train, rng=layer_rng(L))

        t_sz = jax.lax.psum(1, self.tp)
        logits = jax.lax.psum(
            h @ params["pred"]["w"] + params["pred"]["b"] / t_sz, self.tp)

        new_state = {
            "gcns": {"mlp": jax.tree_util.tree_map(
                lambda first, rest: jnp.concatenate([first[None], rest], 0),
                ws0, mlp_states)},
            "norms": jax.tree_util.tree_map(
                lambda rest, last: jnp.concatenate([rest, last[None]], 0),
                norm_states, nsL_out),
        }
        return logits, new_state


def spatial_tp_forward(model: SpatialTPDeeperGCN, mesh: Mesh):
    """Jitted 2-D inference: (params_tp, state_tp, x [D,S,Cin], shards) →
    logits [D, S, T] (node-sharded over gp, replicated over tp)."""
    gp, tp = model.gp, model.tp

    def _fwd(params, state, x, sh):
        pstrip, sstrip = jax.tree_util.tree_map(lambda a: a[0],
                                                (params, state))
        out, _ = model.apply_sharded(pstrip, sstrip, x[0], sh, train=False)
        return out[None]

    fn = shard_map(_fwd, mesh=mesh,
                   in_specs=(P(tp), P(tp), P(gp), P(gp)),
                   out_specs=P(gp))
    return jax.jit(fn)


def spatial_tp_train_step(model: SpatialTPDeeperGCN, tx, loss_fn, mesh: Mesh):
    """Jitted 2-D train step.  loss_fn returns (sum, count) per node shard;
    the mean psums over "gp".  Channel-sharded grads stay local on "tp";
    replicated leaves (t/p/y, head bias) psum over "tp" (their per-slice
    contributions are partial), while the "gp" reduction of ALL param grads
    happens automatically in shard_map's transpose."""
    gp, tp = model.gp, model.tp

    def _step(params, state, opt_state, x, sh, labels, lmask, rng):
        import optax

        x0, labels0, lmask0 = x[0], labels[0], lmask[0]

        def lossf(p):
            pstrip = jax.tree_util.tree_map(lambda a: a[0], p)
            sstrip = jax.tree_util.tree_map(lambda a: a[0], state)
            logits, s2 = model.apply_sharded(pstrip, sstrip, x0, sh,
                                             train=True, rng=rng)
            ls, cnt = loss_fn(logits, labels0, lmask0)
            ls = jax.lax.psum(ls, gp)
            cnt = jax.lax.psum(cnt, gp)
            return ls / jnp.maximum(cnt, 1.0), s2

        (loss, s2), grads = jax.value_and_grad(lossf, has_aux=True)(params)
        grads["pred"]["b"] = jax.lax.psum(grads["pred"]["b"], tp)
        for k in ("t", "p", "y"):
            if k in grads["gcns"]:
                grads["gcns"][k] = jax.lax.psum(grads["gcns"][k], tp)
        updates, opt2 = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        s2 = jax.tree_util.tree_map(lambda a: a[None], s2)
        return params, s2, opt2, loss

    cache = {}

    def call(params, state, opt_state, x, sh, labels, lmask, rng):
        leaves, treedef = jax.tree_util.tree_flatten(opt_state)
        key = (treedef, tuple(jnp.ndim(l) for l in leaves))
        if key not in cache:
            opt_spec = jax.tree_util.tree_unflatten(
                treedef, [P(tp) if jnp.ndim(l) else P() for l in leaves])
            fn = shard_map(_step, mesh=mesh,
                           in_specs=(P(tp), P(tp), opt_spec, P(gp), P(gp),
                                     P(gp), P(gp), P()),
                           out_specs=(P(tp), P(tp), opt_spec, P()))
            cache[key] = jax.jit(fn, donate_argnums=(0, 2))
        return cache[key](params, state, opt_state, x, sh, labels, lmask, rng)

    return call
