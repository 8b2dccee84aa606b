"""Tensor (channel) parallelism for DeeperGCN — the SURVEY §2.7 optional axis.

The TPU-native TP for GNNs shards the HIDDEN dimension, not the nodes: GENConv
is almost entirely channel-parallel —

  * message relu(x)+ε: elementwise, local;
  * the generalized softmax/power aggregation: per-CHANNEL weights
    (`torch_message.py:44-85` — t/p are scalars), local;
  * band / CSR / segment aggregation: channel-independent SpMM, local;
  * BatchNorm: per-channel statistics over nodes, local;
  * res+ residual add, relu, dropout: local.

The ONLY channel-mixing ops are the update-MLP matmul and the head: the MLP
weight is row-sharded and its output combined with ONE `psum_scatter` per
layer (the Megatron row-parallel pattern, sharded in and sharded out); the
prediction head row-shards and `psum`s to replicated logits.  Per layer per
step the TP axis moves exactly one [N, C] array through ICI — compare the
spatial axis, which moves halo rows per layer; the two compose on a 2-D mesh
("gp" × "tp") because they shard different dimensions.

Parameter memory is genuinely sharded: `shard_deeper_params` splits the
single-chip pytree host-side into per-device slices stacked on a leading
axis, so `init either way` interop with models.DeeperGCN holds (slice →
stack round-trips; oracle tests in tests/test_tensor_parallel.py).

Scope: block="res+", linear node encoder, mlp_layers ≤ 2 (the two-matmul
MLP is the Megatron column→row pair, one psum_scatter per matmul),
batch/none/layer norms (LayerNorm reduces across channels → one packed
(sum, sq) tp psum per call, `_tp_layernorm` — round 5; the proteins
112-layer norm="layer" config rides TP), no virtual node / one-hot /
msg_norm (msg_norm's L2 runs across channels and would need a psum —
assert-gated, not silently wrong).  The reference has no TP at all;
SURVEY §2.7 lists it as the optional axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..graph import Graph
from ..models.deeper_gcn import DeeperGCN, DeeperGCNConfig
from ..nn.core import dropout
from ..ops.segment import generalized_aggregate

Array = jax.Array


def _split(a, t, axis):
    """[..., D, ...] → [t, ..., D/t, ...] (leading device axis)."""
    a = np.asarray(a)
    assert a.shape[axis] % t == 0, (a.shape, axis, t)
    parts = np.split(a, t, axis=axis)
    return np.stack(parts, axis=0)


def _rep(a, t):
    a = np.asarray(a)
    return np.broadcast_to(a[None], (t,) + a.shape).copy()


def _tp_layernorm(axis: str, scale, bias, h, c_full, eps=1e-5):
    """LayerNorm over channels sharded across ``axis``: ONE psum of the
    packed (sum, sum-of-squares) pair per call.  Matches nn.core.LayerNorm to
    f32 reduction-order tolerance (E[x²]−E[x]² vs two-pass).  Shared by the
    TP DeeperGCN/RevGCN twins (round 5 lifts the r4 LayerNorm gate — the
    proteins 112-layer norm="layer" flagship config rides TP)."""
    s1 = jnp.sum(h, axis=-1)
    s2 = jnp.sum(jnp.square(h), axis=-1)
    stats = jax.lax.psum(jnp.stack([s1, s2], axis=-1), axis)   # [N, 2]
    mu = stats[..., 0:1] / c_full
    var = jnp.maximum(stats[..., 1:2] / c_full - jnp.square(mu), 0.0)
    return (h - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def tp_norm_apply(inner_norm, cfg, tp_axis, np_, ns_, h, *, train,
                  mask, bn_axis=None):
    """Inter-layer norm on the channel shard: BatchNorm stats are per
    channel over nodes (local; cross-replica over ``bn_axis`` when nodes are
    also sharded), LayerNorm reduces ACROSS channels → one tp psum
    (_tp_layernorm; per-node, so no gp reduction needed on a 2-D mesh)."""
    if cfg.norm == "layer":
        c_full = h.shape[1] * jax.lax.psum(1, tp_axis)
        return _tp_layernorm(tp_axis, np_["scale"], np_["bias"], h,
                             c_full), ns_
    return inner_norm.apply(np_, ns_, h, train=train, mask=mask,
                            axis_name=bn_axis)


def check_tp_supported(cfg: DeeperGCNConfig):
    assert cfg.block == "res+", "TP v1 covers the res+ flagship block"
    assert cfg.mlp_layers in (1, 2), "TP covers mlp_layers 1 (arxiv) and 2 (ogbg)"
    # norms under TP: BatchNorm stats are per-channel over nodes (local, or
    # psum over the node axis on a 2-D mesh); LayerNorm reduces ACROSS
    # channels → one packed (sum, sq) tp psum per call (_tp_layernorm)
    assert cfg.norm in ("batch", "none", "layer"), (
        f"TP supports batch/none/layer norms, got {cfg.norm!r}")
    assert not cfg.msg_norm, "msg_norm mixes channels (needs a psum) — off in v1"
    assert cfg.aggr in ("softmax", "softmax_sg", "softmax_sum", "add", "sum",
                        "mean", "power", "power_sum", "max", "min")


def shard_deeper_params(params, state, t: int, cfg: DeeperGCNConfig):
    """Host-side: single-chip DeeperGCN pytrees → TP pytrees with a leading
    device axis ([t, ...] per leaf) feeding shard_map in_specs=P('tp')."""
    check_tp_supported(cfg)
    # pytree layout (models.DeeperGCN, mlp_layers=1):
    #   gcns: {"mlp": [{"lin": {"w" [L,C,C], "b" [L,C]}}], "t"/"p"/"y" [L,1]}
    #   norms: {"scale"/"bias" [L,C]}; norm state: {"mean"/"var" [L,C]}
    p = {
        "encoder": {"w": _split(params["encoder"]["w"], t, 1),
                    "b": _split(params["encoder"]["b"], t, 0)},
        # head: row-parallel (input sharded), bias added post-psum, replicated
        "pred": {"w": _split(params["pred"]["w"], t, 0),
                 "b": _rep(params["pred"]["b"], t)},
        # update MLP: each Linear is row-parallel (input-sharded on axis 1 of
        # [L, Cin, Cout]); biases and any inter-layer norm live on the
        # psum_scatter'd OUTPUT shard (axis 2 / channel axis)
        "gcns": {"mlp": [
            jax.tree_util.tree_map(lambda a: _split(a, t, 1), layer)
            for layer in params["gcns"]["mlp"]
        ]},
        "norms": jax.tree_util.tree_map(lambda a: _split(a, t, 1),
                                        params["norms"]),
    }
    for k in ("t", "p", "y"):
        if k in params["gcns"]:
            p["gcns"][k] = _rep(params["gcns"][k], t)
    # gcn state = the MLP's inter-layer norm stats [L, channels] (empty for
    # mlp_layers=1) — channel-sharded like its params
    s = {"gcns": jax.tree_util.tree_map(lambda a: _split(a, t, 1),
                                        state["gcns"]),
         "norms": jax.tree_util.tree_map(lambda a: _split(a, t, 1),
                                         state["norms"])}
    return p, s


def unshard_deeper_params(params_tp, state_tp):
    """Inverse of shard_deeper_params (device axis → concatenated channels);
    lets a TP-trained run checkpoint back into the single-chip layout."""
    def cat(axis):
        return lambda a: np.concatenate(list(np.asarray(a)), axis=axis)

    p = {
        "encoder": {"w": cat(1)(params_tp["encoder"]["w"]),
                    "b": cat(0)(params_tp["encoder"]["b"])},
        "pred": {"w": cat(0)(params_tp["pred"]["w"]),
                 "b": np.asarray(params_tp["pred"]["b"])[0]},
        "gcns": {"mlp": [jax.tree_util.tree_map(cat(1), layer)
                         for layer in params_tp["gcns"]["mlp"]]},
        "norms": jax.tree_util.tree_map(cat(1), params_tp["norms"]),
    }
    for k in ("t", "p", "y"):
        if k in params_tp["gcns"]:
            p["gcns"][k] = np.asarray(params_tp["gcns"][k])[0]
    s = {"gcns": jax.tree_util.tree_map(cat(1), state_tp["gcns"]),
         "norms": jax.tree_util.tree_map(cat(1), state_tp["norms"])}
    return p, s


def tp_mlp_apply(cfg, tp_axis: str, wp, ws, h2, *, train=False, mask=None,
                 bn_axis=None):
    """Row-parallel GENConv update MLP on the channel shard: every Linear's
    input is sharded, so each matmul computes a full-width partial and ONE
    `psum_scatter` returns to the output shard; the inter-layer norm (batch:
    per-channel → local; cross-replica over ``bn_axis`` when nodes are also
    sharded) and relu mirror nn.core.MLP's lin → norm → act order.
    Returns (out, new_state) with the MLP's norm-state list."""
    from ..nn.core import make_norm

    n_lay = len(wp)
    h = h2
    new_ws = []
    for i, layer in enumerate(wp):
        lw = layer["lin"]
        h = jax.lax.psum_scatter(h @ lw["w"], tp_axis, scatter_dimension=1,
                                 tiled=True) + lw["b"]
        sentry = {}
        if i < n_lay - 1:  # hidden layer (last_lin=True ⇒ bare final Linear)
            if "norm" in layer:
                lstate = (ws[i] if ws is not None and len(ws) > i else {})
                if cfg.norm == "layer":
                    c_full = h.shape[1] * jax.lax.psum(1, tp_axis)
                    h = _tp_layernorm(tp_axis, layer["norm"]["scale"],
                                      layer["norm"]["bias"], h, c_full)
                    sentry["norm"] = lstate.get("norm", {})
                else:
                    nrm = make_norm(cfg.norm, h.shape[1])
                    h, ns = nrm.apply(layer["norm"], lstate.get("norm", {}),
                                      h, train=train, mask=mask,
                                      axis_name=bn_axis)
                    sentry["norm"] = ns
            h = jax.nn.relu(h)
        new_ws.append(sentry)
    return h, new_ws


class TPDeeperGCN:
    """Channel-parallel twin of models.DeeperGCN (res+, mlp_layers ≤ 2)."""

    def __init__(self, cfg: DeeperGCNConfig, axis: str = "tp"):
        check_tp_supported(cfg)
        self.cfg = cfg
        self.axis = axis
        self.inner = DeeperGCN(cfg)  # init delegate / param layout oracle

    # -- local (per-device) pieces ------------------------------------------
    def _norm_apply(self, np_, ns_, h, g, train):
        # BatchNorm: per-channel stats over nodes → local on the channel
        # shard; LayerNorm: one packed (sum, sq) tp psum (tp_norm_apply).
        return tp_norm_apply(self.inner._norm, self.cfg, self.axis, np_,
                             ns_, h, train=train, mask=g.node_mask)

    def _gcn_aggregate(self, gp, h, g):
        """GENConv message+aggregate on the channel shard (all local)."""
        cfg = self.cfg
        gcn = self.inner._gcn
        t = gp.get("t", gcn.t)
        if isinstance(t, jax.Array):
            t = jax.lax.stop_gradient(t) if not (
                gcn.learn_t and gcn.aggr in ("softmax", "softmax_sum")) else t
        p_ = gp.get("p", gcn.p)
        if isinstance(p_, jax.Array) and not gcn.learn_p:
            p_ = jax.lax.stop_gradient(p_)
        y_ = gp.get("y", gcn.y)
        if isinstance(y_, jax.Array) and not gcn.learn_y:
            y_ = jax.lax.stop_gradient(y_)
        n = h.shape[0]
        msg = jax.nn.relu(jnp.take(h, jnp.minimum(g.senders, n - 1), axis=0)
                          ) + jnp.asarray(gcn.eps, h.dtype)
        return generalized_aggregate(
            msg, g.receivers, n, aggr=cfg.aggr, t=t, p=p_, y=y_,
            learn_t=gcn.learn_t, mask=g.edge_mask, row_ptr=g.row_ptr)

    def _mlp_psum_scatter(self, wp, h2, ws=None, train=False, mask=None,
                          bn_axis=None):
        out, _ = tp_mlp_apply(self.cfg, self.axis, wp, ws, h2, train=train,
                              mask=mask, bn_axis=bn_axis)
        return out

    def apply_local(self, params, state, x, g: Graph, *, train=False,
                    rng: Optional[Array] = None):
        """Runs INSIDE shard_map: params/state are this device's slices
        (leading device axis stripped), x replicated [N, in_channels]."""
        cfg = self.cfg
        L = cfg.num_layers
        d = jax.lax.axis_index(self.axis)

        h = x @ params["encoder"]["w"] + params["encoder"]["b"]  # [N, C/T]

        def layer_rng(i):
            # per-(device, layer): statistically independent channel masks
            # (bit-exactness with single-chip dropout is not preserved;
            # oracle tests run dropout=0)
            if rng is None:
                return None
            return jax.random.fold_in(jax.random.fold_in(rng, i), d)

        def slice_l(tree, i):
            return jax.tree_util.tree_map(lambda a: a[i], tree)

        def gcn_block(gp, ws, h2):
            m = self._gcn_aggregate(gp, h2, g)
            return tp_mlp_apply(cfg, self.axis, gp["mlp"], ws, h2 + m,
                                train=train, mask=g.node_mask)

        gp0 = {**slice_l({"mlp": params["gcns"]["mlp"]}, 0)}
        for k in ("t", "p", "y"):
            if k in params["gcns"]:
                gp0[k] = params["gcns"][k][0]
        h, ws0 = gcn_block(gp0, slice_l(state["gcns"]["mlp"], 0), h)

        def body(carry, i):
            h = carry
            np_ = slice_l(params["norms"], i - 1)
            ns_ = slice_l(state["norms"], i - 1)
            h1, ns_out = self._norm_apply(np_, ns_, h, g, train)
            h2 = jax.nn.relu(h1)
            r = layer_rng(i)
            h2 = dropout(h2, cfg.dropout, train=train, rng=r)
            gp = {"mlp": slice_l(params["gcns"]["mlp"], i)}
            for k in ("t", "p", "y"):
                if k in params["gcns"]:
                    gp[k] = params["gcns"][k][i]
            res, ws_out = gcn_block(gp, slice_l(state["gcns"]["mlp"], i), h2)
            return h + res, (ns_out, ws_out)

        body_fn = jax.checkpoint(body) if cfg.remat else body
        h, (norm_states, mlp_states) = jax.lax.scan(body_fn, h,
                                                    jnp.arange(1, L))
        gcn_states = {"mlp": jax.tree_util.tree_map(
            lambda first, rest: jnp.concatenate([first[None], rest], 0),
            ws0, mlp_states)}

        npL = slice_l(params["norms"], L - 1)
        nsL = slice_l(state["norms"], L - 1)
        h1, nsL_out = self._norm_apply(npL, nsL, h, g, train)
        h = jax.nn.relu(h1) if cfg.final_relu else h1
        if cfg.final_dropout:
            h = dropout(h, cfg.dropout, train=train, rng=layer_rng(L))

        # head: row-parallel → replicated logits.  The bias rides INSIDE the
        # psum as b/T so shard_map can statically infer the output is
        # replicated (adding the per-device b copy after the psum reads as
        # device-varying to the vma check even though the values agree).
        t_sz = jax.lax.psum(1, self.axis)
        logits = jax.lax.psum(
            h @ params["pred"]["w"] + params["pred"]["b"] / t_sz, self.axis)

        new_state = {
            "gcns": gcn_states,
            "norms": jax.tree_util.tree_map(
                lambda rest, last: jnp.concatenate([rest, last[None]], 0),
                norm_states, nsL_out),
        }
        return logits, new_state


def tp_forward(model: TPDeeperGCN, mesh: Mesh, axis: str = "tp"):
    """Jitted TP inference: (params_tp, state_tp, x, g) → replicated logits."""

    def _fwd(params, state, x, g):
        strip = jax.tree_util.tree_map(lambda a: a[0], (params, state))
        out, _ = model.apply_local(strip[0], strip[1], x, g, train=False)
        return out

    fn = shard_map(_fwd, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(), P()),
                   out_specs=P())
    return jax.jit(fn)


def tp_train_step(model: TPDeeperGCN, tx, loss_fn, mesh: Mesh, axis: str = "tp"):
    """Jitted TP train step.  Grads of the channel-sharded params stay local
    (each device owns its slice); the loss is computed on the replicated
    logits, so no extra collective beyond the in-model psum/psum_scatter.

    Returns a callable; the optimizer-state spec is built per leaf on first
    call (array leaves ride P(axis) with the params' leading device axis,
    scalar leaves like adam's step count stay replicated P())."""

    def _step(params, state, opt_state, x, g, labels, rng):
        import optax

        def lossf(p):
            strip = jax.tree_util.tree_map(lambda a: a[0], p)
            sstrip = jax.tree_util.tree_map(lambda a: a[0], state)
            logits, s2 = model.apply_local(strip, sstrip, x, g, train=True,
                                           rng=rng)
            return loss_fn(logits, labels, g.node_mask), s2

        (loss, s2), grads = jax.value_and_grad(lossf, has_aux=True)(params)
        # REPLICATED leaves need their grads psum'd: t/p/y see only this
        # device's channel shard (partial contributions), and pred.b enters
        # as b/T inside the head psum (grad scaled 1/T) — one psum fixes both
        # so every replica steps identically.
        grads["pred"]["b"] = jax.lax.psum(grads["pred"]["b"], axis)
        for k in ("t", "p", "y"):
            if k in grads["gcns"]:
                grads["gcns"][k] = jax.lax.psum(grads["gcns"][k], axis)
        updates, opt2 = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        s2 = jax.tree_util.tree_map(lambda a: a[None], s2)
        return params, s2, opt2, loss

    cache = {}

    def call(params, state, opt_state, x, g, labels, rng):
        leaves, treedef = jax.tree_util.tree_flatten(opt_state)
        key = (treedef, tuple(jnp.ndim(l) for l in leaves))
        if key not in cache:
            opt_spec = jax.tree_util.tree_unflatten(
                treedef, [P(axis) if jnp.ndim(l) else P() for l in leaves])
            fn = shard_map(_step, mesh=mesh,
                           in_specs=(P(axis), P(axis), opt_spec, P(), P(),
                                     P(), P()),
                           out_specs=(P(axis), P(axis), opt_spec, P()))
            cache[key] = jax.jit(fn, donate_argnums=(0, 2))
        return cache[key](params, state, opt_state, x, g, labels, rng)

    return call
