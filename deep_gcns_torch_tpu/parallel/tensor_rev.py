"""Tensor (channel) parallelism for the REVERSIBLE models — SURVEY §2.7's
stated TP use-case ("shard feature dim of MLPs for very wide RevGNN,
224ch×448L" / RevGNN-Wide 448ch) — VERDICT r4 next #3.

The grouped additive coupling already splits channels into G group functions
(`eff_gcn_modules/rev/memgcn.py:9-52`), so groups × tp-shards compose: the
channel layout is GROUP-MAJOR — device d holds, for every group g, the slice
[g·C/G + d·c_loc, g·C/G + (d+1)·c_loc) with c_loc = C/(G·T).  A local [N,
C/T] array then chunks into per-group local slices with the SAME
``jnp.split`` the single-chip coupling uses, so coupling.forward / inverse /
inverse_and_vjp and the reversible scan (rev/invertible.py) run UNCHANGED on
local shards; only the group function (GENBlock) gets a TP twin:

  * LayerNorm reduces ACROSS the group's channels → ONE psum of the packed
    (sum, sum-of-squares) pair per norm call (the r4 TP gate that excluded
    LayerNorm is lifted — the proteins/RevGNN-Wide config is now legal);
  * relu / shared-dropout mask / residual adds: elementwise, local;
  * GENConv message+aggregation: channel-independent, local (the per-group
    inner edge encoder Linear(C → C/G) is column-parallel: replicated model
    edge table in, local slice out, no comm);
  * the update-MLP Linear(C/G → C/G): row-parallel, ONE psum_scatter
    (parallel/tensor.py's Megatron pattern).

Per group function per pass the TP axis moves one [N, c_loc] psum_scatter +
one [N, 2] norm-stat psum; everything else is local.  Parameters, optimizer
state and the O(1) reversible activations are all genuinely width-sharded —
the memory story RevGNN-Wide needs beyond what reversibility alone gives.

Oracle-exact vs models.RevGCN (fwd + one SGD step): tests/test_tensor_rev.py;
multi-chip dryrun mode "tensor-rev" in __graft_entry__.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..graph import Graph
from ..models.rev_gcn import RevGCN, RevGCNConfig
from ..ops.segment import generalized_aggregate
from ..rev.invertible import make_reversible_scan
from ..nn.core import shared_dropout_mask

Array = jax.Array


def check_tp_rev_supported(cfg: RevGCNConfig):
    assert cfg.conv == "gen", "TP rev v1 covers the GENBlock flagship"
    assert cfg.norm == "layer", (
        "reversible couplings are layer-norm (stateless) by construction")
    assert cfg.mlp_layers == 1, (
        "TP rev v1 covers mlp_layers=1 (the RevGNN-proteins/Wide config)")
    assert not cfg.msg_norm, "msg_norm mixes channels — not wired"
    assert cfg.aggr in ("softmax", "softmax_sg", "softmax_sum", "add", "sum",
                        "mean", "power", "power_sum", "max", "min")


def _split(a, t, axis):
    a = np.asarray(a)
    assert a.shape[axis] % t == 0, (a.shape, axis, t)
    return np.stack(np.split(a, t, axis=axis), axis=0)


def _rep(a, t):
    a = np.asarray(a)
    return np.broadcast_to(a[None], (t,) + a.shape).copy()


def _split_grouped(a, t, axis, group):
    """Split a FULL-hidden channel axis (C = group · C/G, group-major) into
    per-device slices in the group-cyclic layout: device d gets each group's
    d-th sub-slice, concatenated group-major — so local arrays chunk into
    groups exactly like single-chip arrays do."""
    a = np.asarray(a)
    C = a.shape[axis]
    cg = C // group
    loc = cg // t
    shape = a.shape[:axis] + (group, t, loc) + a.shape[axis + 1:]
    ar = a.reshape(shape)
    ar = np.moveaxis(ar, axis + 1, 0)                     # [t, ..., g, loc, ..]
    return np.ascontiguousarray(
        ar.reshape((t,) + a.shape[:axis] + (group * loc,) + a.shape[axis + 1:]))


def _cat_grouped(a_t, axis, group):
    """Inverse of _split_grouped."""
    a_t = np.asarray(a_t)
    t = a_t.shape[0]
    a = a_t  # [t, ..., G*loc, ...]
    loc_total = a.shape[axis + 1]
    loc = loc_total // group
    shape = a.shape[:axis + 1] + (group, loc) + a.shape[axis + 2:]
    ar = a.reshape(shape)                                  # [t, ..., g, loc,..]
    ar = np.moveaxis(ar, 0, axis + 1)                      # [..., g, t, loc,..]
    out = ar.reshape(ar.shape[:axis] + (group * t * loc,) + ar.shape[axis + 3:])
    return np.ascontiguousarray(out)


def shard_rev_params(params, t: int, cfg: RevGCNConfig):
    """Single-chip RevGCN param pytree → TP pytree (leading device axis).

    Grouped-layout (full C) leaves: encoder out, last_norm, pred in, and the
    shared dropout mask at runtime.  Per-group leaves (params["layers"],
    shaped [L, G, ...] with C/G channel dims) split plainly on their channel
    axes.  Replicated: one-hot encoder, model edge encoder, t/p/y scalars,
    biases that ride inside psums."""
    check_tp_rev_supported(cfg)
    G = cfg.group
    lay = params["layers"]
    lay_tp = {
        "norm": {"scale": _split(lay["norm"]["scale"], t, 2),
                 "bias": _split(lay["norm"]["bias"], t, 2)},
        "gcn": {"mlp": [{"lin": {
            # row-parallel: input axis sharded; bias on the scattered output
            "w": _split(lay["gcn"]["mlp"][0]["lin"]["w"], t, 2),
            "b": _split(lay["gcn"]["mlp"][0]["lin"]["b"], t, 2),
        }}]},
    }
    for k in ("t", "p", "y"):
        if k in lay["gcn"]:
            lay_tp["gcn"][k] = _rep(lay["gcn"][k], t)
    if "edge_encoder" in lay["gcn"]:
        # inner per-group edge encoder Linear(C → C/G): column-parallel
        lay_tp["gcn"]["edge_encoder"] = {
            "w": _split(lay["gcn"]["edge_encoder"]["w"], t, 3),
            "b": _split(lay["gcn"]["edge_encoder"]["b"], t, 2),
        }
    p = {
        "encoder": {"w": _split_grouped(params["encoder"]["w"], t, 1, G),
                    "b": _split_grouped(params["encoder"]["b"], t, 0, G)},
        "last_norm": jax.tree_util.tree_map(
            lambda a: _split_grouped(a, t, 0, G), params["last_norm"]),
        "pred": {"w": _split_grouped(params["pred"]["w"], t, 0, G),
                 "b": _rep(params["pred"]["b"], t)},
        "layers": lay_tp,
    }
    if "one_hot_encoder" in params:
        p["one_hot_encoder"] = jax.tree_util.tree_map(
            lambda a: _rep(a, t), params["one_hot_encoder"])
    if "edge_encoder" in params:
        p["edge_encoder"] = jax.tree_util.tree_map(
            lambda a: _rep(a, t), params["edge_encoder"])
    return p


def unshard_rev_params(params_tp, cfg: RevGCNConfig):
    """Inverse of shard_rev_params — checkpoint back to single-chip layout."""
    G = cfg.group

    def cat(axis):
        return lambda a: np.concatenate(list(np.asarray(a)), axis=axis)

    lay = params_tp["layers"]
    layers = {
        "norm": {"scale": cat(2)(lay["norm"]["scale"]),
                 "bias": cat(2)(lay["norm"]["bias"])},
        "gcn": {"mlp": [{"lin": {"w": cat(2)(lay["gcn"]["mlp"][0]["lin"]["w"]),
                                 "b": cat(2)(lay["gcn"]["mlp"][0]["lin"]["b"])}
                         }]},
    }
    for k in ("t", "p", "y"):
        if k in lay["gcn"]:
            layers["gcn"][k] = np.asarray(lay["gcn"][k])[0]
    if "edge_encoder" in lay["gcn"]:
        layers["gcn"]["edge_encoder"] = {
            "w": cat(3)(lay["gcn"]["edge_encoder"]["w"]),
            "b": cat(2)(lay["gcn"]["edge_encoder"]["b"])}
    p = {
        "encoder": {"w": _cat_grouped(params_tp["encoder"]["w"], 1, G),
                    "b": _cat_grouped(params_tp["encoder"]["b"], 0, G)},
        "last_norm": jax.tree_util.tree_map(
            lambda a: _cat_grouped(a, 0, G), params_tp["last_norm"]),
        "pred": {"w": _cat_grouped(params_tp["pred"]["w"], 0, G),
                 "b": np.asarray(params_tp["pred"]["b"])[0]},
        "layers": layers,
    }
    for k in ("one_hot_encoder", "edge_encoder"):
        if k in params_tp:
            p[k] = jax.tree_util.tree_map(lambda a: np.asarray(a)[0],
                                          params_tp[k])
    return p


from .tensor import _tp_layernorm  # shared with the DeeperGCN TP twin


class TPRevGCN:
    """Channel-parallel twin of models.RevGCN (conv="gen", norm="layer",
    mlp_layers=1).  apply_local runs INSIDE shard_map on per-device slices;
    the coupling/reversible machinery is reused verbatim on local arrays
    (group-major channel layout — module docstring)."""

    def __init__(self, cfg: RevGCNConfig, axis: str = "tp"):
        check_tp_rev_supported(cfg)
        self.cfg = cfg
        self.axis = axis
        self.inner = RevGCN(cfg)  # init delegate / param-layout oracle

    # -- TP group function (GENBlock twin on the channel shard) -------------
    def _fm_local(self, p_g, h_loc, g: Graph, mask_loc, emb_g, emb_csc_g,
                  train):
        cfg = self.cfg
        cg = cfg.hidden_channels // cfg.group
        h = _tp_layernorm(self.axis, p_g["norm"]["scale"],
                          p_g["norm"]["bias"], h_loc, cg)
        h = jax.nn.relu(h)
        if train and mask_loc is not None:
            h = h * mask_loc
        # GENConv: inner edge encode (column-parallel) + message + aggregate
        emb_in = None
        if emb_g is not None and "edge_encoder" in p_g["gcn"]:
            ee = p_g["gcn"]["edge_encoder"]
            emb_in = emb_g @ ee["w"] + ee["b"]            # [E, c_loc] local
        n = h.shape[0]
        gcn = self.inner._fm._gcn()
        msg = jnp.take(h, jnp.minimum(g.senders, n - 1), axis=0)
        if emb_in is not None:
            msg = msg + emb_in
        msg = jax.nn.relu(msg) + jnp.asarray(gcn.eps, h.dtype)
        t = p_g["gcn"].get("t", gcn.t)
        if isinstance(t, jax.Array) and not (
                gcn.learn_t and gcn.aggr in ("softmax", "softmax_sum")):
            t = jax.lax.stop_gradient(t)
        p_ = p_g["gcn"].get("p", gcn.p)
        if isinstance(p_, jax.Array) and not gcn.learn_p:
            p_ = jax.lax.stop_gradient(p_)
        y_ = p_g["gcn"].get("y", gcn.y)
        if isinstance(y_, jax.Array) and not gcn.learn_y:
            y_ = jax.lax.stop_gradient(y_)
        m = generalized_aggregate(msg, g.receivers, n, aggr=cfg.aggr, t=t,
                                  p=p_, y=y_, learn_t=gcn.learn_t,
                                  mask=g.edge_mask, row_ptr=g.row_ptr)
        h2 = h + m
        # row-parallel update MLP: ONE psum_scatter back to the local shard
        lw = p_g["gcn"]["mlp"][0]["lin"]
        out = jax.lax.psum_scatter(h2 @ lw["w"], self.axis,
                                   scatter_dimension=1, tiled=True) + lw["b"]
        return out

    # -- local coupling over group-chunked local arrays ---------------------
    def _coupling_fns(self, g: Graph, train):
        G = self.cfg.group

        def chunk(a):
            return [None] * G if a is None else jnp.split(a, G, axis=-1)

        def fm(p, i, u, mask_c, emb, emb_csc):
            p_i = jax.tree_util.tree_map(lambda a: a[i], p)
            return self._fm_local(p_i, u, g, mask_c, emb, emb_csc, train)

        def fwd_one(p, h, diff_args):
            mask, emb, emb_csc = diff_args
            xs = chunk(h)
            masks = chunk(mask)
            y_in = sum(xs[1:]) if G > 1 else jnp.zeros_like(xs[0])
            ys = []
            for i in range(G):
                y = xs[i] + fm(p, i, y_in, masks[i], emb, emb_csc)
                y_in = y
                ys.append(y)
            return jnp.concatenate(ys, axis=-1)

        def inv_one(p, y, diff_args):
            mask, emb, emb_csc = diff_args
            ys = chunk(y)
            masks = chunk(mask)
            xs = []
            for i in range(G - 1, -1, -1):
                u = ys[i - 1] if i != 0 else (
                    sum(xs) if xs else jnp.zeros_like(ys[0]))
                xs.append(ys[i] - fm(p, i, u, masks[i], emb, emb_csc))
            return jnp.concatenate(xs[::-1], axis=-1)

        def inv_vjp_one(p, y, diff_args, gy):
            mask, emb, emb_csc = diff_args
            ys = chunk(y)
            gys = list(chunk(gy))
            masks = chunk(mask)
            xs = [None] * G
            gxs = [None] * G
            gps = [None] * G
            gmask = [None] * G
            gemb = None
            gembc = None
            for i in range(G - 1, -1, -1):
                u = ys[i - 1] if i != 0 else (
                    sum(xs[1:]) if G > 1 else jnp.zeros_like(ys[0]))
                u = jax.lax.stop_gradient(u)
                p_i = jax.tree_util.tree_map(lambda a: a[i], p)

                def f(p_, u_, m_, e_, ec_):
                    return self._fm_local(p_, u_, g, m_, e_, ec_, train)

                prim, vjp = jax.vjp(f, p_i, u, masks[i], emb, emb_csc)
                xs[i] = ys[i] - prim
                gp_i, gu_i, gm_i, ge_i, gec_i = vjp(gys[i])
                gxs[i] = gys[i]
                gps[i] = gp_i
                gmask[i] = gm_i
                gemb = ge_i if gemb is None else jax.tree_util.tree_map(
                    jnp.add, gemb, ge_i)
                gembc = gec_i if gembc is None else jax.tree_util.tree_map(
                    jnp.add, gembc, gec_i)
                if i > 0:
                    gys[i - 1] = gys[i - 1] + gu_i
                else:
                    for j in range(1, G):
                        gxs[j] = gxs[j] + gu_i
            x = jnp.concatenate(xs, axis=-1)
            gx = jnp.concatenate(gxs, axis=-1)
            gparams = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *gps)
            gm_full = (None if mask is None
                       else jnp.concatenate(gmask, axis=-1))
            return x, gx, gparams, (gm_full, gemb, gembc)

        return fwd_one, inv_one, inv_vjp_one

    def apply_local(self, params, x, g: Graph, *,
                    node_feats: Optional[Array] = None, train: bool = False,
                    mask_local: Optional[Array] = None,
                    final_mask_local: Optional[Array] = None):
        """Runs INSIDE shard_map (per-device param slices, leading axis
        stripped).  mask_local / final_mask_local: this device's slices of
        the shared and head dropout masks (grouped layout), produced
        host-side by make_tp_mask for oracle exactness with the single-chip
        model's rng draws."""
        cfg = self.cfg
        c = cfg.hidden_channels
        # -- input features (replicated smalls, sharded encoder out)
        if "one_hot_encoder" in params:
            assert node_feats is not None
            oh = x @ params["one_hot_encoder"]["w"] \
                + params["one_hot_encoder"]["b"]
            h_in = jnp.concatenate([node_feats, oh], axis=1)
        else:
            h_in = node_feats if node_feats is not None else x
        h = h_in @ params["encoder"]["w"] + params["encoder"]["b"]  # [N, C/T]

        emb = emb_csc = None
        if g.edge_attr is not None and "edge_encoder" in params:
            ee = params["edge_encoder"]
            emb = g.edge_attr @ ee["w"] + ee["b"]          # [E, C] replicated
            if g.edge_attr_csc is not None:
                emb_csc = g.edge_attr_csc @ ee["w"] + ee["b"]

        fwd_one, inv_one, inv_vjp_one = self._coupling_fns(g, train)
        run = make_reversible_scan(fwd_one, inv_one, inv_vjp_one)
        h = run(params["layers"], h, (mask_local, emb, emb_csc))

        h = _tp_layernorm(self.axis, params["last_norm"]["scale"],
                          params["last_norm"]["bias"], h, c)
        h = jax.nn.relu(h)
        if train and final_mask_local is not None:
            h = h * final_mask_local   # head dropout (`model_rev.py:110`)
        # head: row-parallel → replicated logits (bias rides inside the psum)
        t_sz = jax.lax.psum(1, self.axis)
        return jax.lax.psum(h @ params["pred"]["w"]
                            + params["pred"]["b"] / t_sz, self.axis)


def make_tp_mask(cfg: RevGCNConfig, rng, n: int, t: int, dtype=jnp.float32):
    """Single-chip-identical dropout masks, pre-sharded into the grouped
    layout ([t, N, C/t]): (shared layer mask, head mask) — the SAME rng
    draws models.RevGCN makes internally (fold_in 0 for the shared mask,
    fold_in 1 for the head dropout), so TP training is oracle-exact."""
    if cfg.dropout <= 0:
        return None, None
    c = cfg.hidden_channels
    full = shared_dropout_mask(jax.random.fold_in(rng, 0), (n, c),
                               cfg.dropout, dtype)
    keep = jax.random.bernoulli(jax.random.fold_in(rng, 1),
                                1.0 - cfg.dropout, (n, c))
    head = jnp.where(keep, 1.0 / (1.0 - cfg.dropout), 0.0).astype(dtype)
    to_tp = lambda m: jnp.asarray(_split_grouped(np.asarray(m), t, 1,
                                                 cfg.group))
    return to_tp(full), to_tp(head)


def tp_rev_forward(model: TPRevGCN, mesh: Mesh, axis: str = "tp"):
    """Jitted TP inference: (params_tp, x, node_feats, g) → replicated
    logits."""

    def _fwd(params, x, nf, g):
        strip = jax.tree_util.tree_map(lambda a: a[0], params)
        return model.apply_local(strip, x, g, node_feats=nf, train=False)

    fn = shard_map(_fwd, mesh=mesh,
                   in_specs=(P(axis), P(), P(), P()), out_specs=P())
    return jax.jit(fn)


def tp_rev_train_step(model: TPRevGCN, tx, loss_fn, mesh: Mesh,
                      axis: str = "tp"):
    """Jitted TP train step (grads of sharded params stay local; replicated
    leaves psum'd so every replica steps identically)."""

    def _step(params, opt_state, x, nf, g, labels, mask_tp, head_tp):
        import optax

        def lossf(p):
            strip = jax.tree_util.tree_map(lambda a: a[0], p)
            m_loc = None if mask_tp is None else mask_tp[0]
            h_loc = None if head_tp is None else head_tp[0]
            logits = model.apply_local(strip, x, g, node_feats=nf,
                                       train=True, mask_local=m_loc,
                                       final_mask_local=h_loc)
            return loss_fn(logits, labels, g.node_mask)

        loss, grads = jax.value_and_grad(lossf)(params)
        grads["pred"]["b"] = jax.lax.psum(grads["pred"]["b"], axis)
        for k in ("t", "p", "y"):
            if k in grads["layers"]["gcn"]:
                grads["layers"]["gcn"][k] = jax.lax.psum(
                    grads["layers"]["gcn"][k], axis)
        for k in ("one_hot_encoder", "edge_encoder"):
            if k in grads:
                grads[k] = jax.tree_util.tree_map(
                    lambda a: jax.lax.psum(a, axis), grads[k])
        updates, opt2 = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt2, loss

    cache = {}

    def call(params, opt_state, x, nf, g, labels, mask_tp=None,
             head_tp=None):
        leaves, treedef = jax.tree_util.tree_flatten(opt_state)
        key = (treedef, tuple(jnp.ndim(l) for l in leaves))
        if key not in cache:
            opt_spec = jax.tree_util.tree_unflatten(
                treedef, [P(axis) if jnp.ndim(l) else P() for l in leaves])
            mask_spec = P() if mask_tp is None else P(axis)
            head_spec = P() if head_tp is None else P(axis)
            fn = shard_map(_step, mesh=mesh,
                           in_specs=(P(axis), opt_spec, P(), P(), P(), P(),
                                     mask_spec, head_spec),
                           out_specs=(P(axis), opt_spec, P()))
            cache[key] = jax.jit(fn, donate_argnums=(0, 1))
        return cache[key](params, opt_state, x, nf, g, labels, mask_tp,
                          head_tp)

    return call
