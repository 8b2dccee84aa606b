"""Spatial (edge-partitioned) reversible GCN — RevGNN at multi-chip scale.

Composes the two scale axes the framework offers:

  * depth: the O(1)-activation-memory reversible scan (rev/invertible.py,
    rebuild of `eff_gcn_modules/rev/gcn_revop.py`) — RevGNN-Deep is 1001 layers;
  * graph size: exact edge partitioning with boundary halo exchange
    (parallel/spatial.py) — no cross-partition edge dropped, unlike the
    reference's lossy per-cluster training
    (`examples/ogb_eff/ogbn_proteins/main.py:203-207`).

Each group function F_i runs norm → relu → shared-dropout → GENConv where the
source-feature gather crosses ICI (halo all-to-all or all-gather).  The additive
coupling stays exactly invertible per shard: the inverse re-evaluates F_i at the
same reconstructed inputs, re-issuing the same collective, so multi-chip
forward/backward equals the single-chip RevGCN bit-for-bit (oracle in
tests/test_spatial_rev.py).  The reference has no multi-GPU story for RevGNN at
all; this is the "RevGNN-Wide at pod scale" path (VERDICT r1 item 6, the
compose option).

Parameter pytrees are IDENTICAL to `models.rev_gcn.RevGCN` — init either model
and run it on one chip or a mesh.

Scope: the group function follows `RevGCNConfig.conv` — GEN (the
RevGNN-proteins flagship), GCN, and SAGE twins (the reference's rev zoo,
`eff_gcn_modules/rev/rev_layer.py:54-94`); the GAT flavor is the separate
single-chip RevGAT model (models/rev_gat.py), which fits arxiv scale on one
chip.  The norm must be 'layer' (the reference's RevGNN configs use
LayerNorm, `examples/ogb_eff/ogbn_proteins/args.py`; stateless norms are
REQUIRED for exact reversibility under scan — BatchNorm running stats would
be multiply-updated by the inverse recomputation).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models.rev_gcn import RevGCN, RevGCNConfig
from ..nn.core import Module, dropout, make_norm, shared_dropout_mask
from ..ops.segment import generalized_aggregate
from ..rev.coupling import GroupAdditiveCoupling
from ..rev.invertible import make_reversible_scan
from .spatial import SpatialShards, exchange_sources

Array = jax.Array


@dataclass(frozen=True)
class SpatialGENBlock(Module):
    """Spatial twin of rev.rev_layer.GENBlock (same param pytree): norm → relu →
    shared-dropout → GENConv with the source gather crossing ICI."""
    blk: Module          # the single-chip GENBlock (config + init delegate)
    axis: str = "gp"
    exchange: str = "auto"

    def init(self, key):
        return self.blk.init(key)

    def apply(self, params, state, x, sh: SpatialShards, *,
              chunk_args: Tuple = (), train: bool = False, **kw):
        blk = self.blk
        mask_c = chunk_args[0] if len(chunk_args) > 0 else None
        ee_raw = chunk_args[1] if len(chunk_args) > 1 else None
        my = jax.tree_util.tree_map(lambda a: a[0], sh)  # strip device axis

        h = _pre_block(params, blk, x, my, train, mask_c)

        gcn = blk._gcn()
        cd = jnp.bfloat16 if gcn.compute_dtype == "bfloat16" else h.dtype
        h_src, senders = exchange_sources(h.astype(cd), sh, self.axis,
                                          self.exchange)
        msg = jnp.take(h_src, jnp.minimum(senders, h_src.shape[0] - 1), axis=0)
        enc = gcn._edge_encoder()
        if ee_raw is not None:
            # conv-level encoding when configured, else the pre-encoded chunk is
            # added as-is (GENConv's `elif not encode_edge` path,
            # convs/sparse.py:145-148)
            if enc is not None:
                ee, _ = enc.apply(params["gcn"]["edge_encoder"], {}, ee_raw)
            else:
                ee = ee_raw
            msg = msg + ee.astype(cd)
        msg = jax.nn.relu(msg) + jnp.asarray(gcn.eps, cd)
        # t/p/y stop-gradient semantics identical to GENConv.apply
        # (convs/sparse.py:152-161)
        t = params["gcn"].get("t", gcn.t)
        if isinstance(t, jax.Array) and not (
                gcn.learn_t and gcn.aggr in ("softmax", "softmax_sum")):
            t = jax.lax.stop_gradient(t)
        p_ = params["gcn"].get("p", gcn.p)
        if isinstance(p_, jax.Array) and not gcn.learn_p:
            p_ = jax.lax.stop_gradient(p_)
        y_ = params["gcn"].get("y", gcn.y)
        if isinstance(y_, jax.Array) and not gcn.learn_y:
            y_ = jax.lax.stop_gradient(y_)
        m = generalized_aggregate(
            msg, my.receivers, my.node_mask.shape[0], aggr=gcn.aggr, t=t,
            p=p_, y=y_, learn_t=gcn.learn_t, mask=my.edge_mask,
            row_ptr=my.row_ptr).astype(h.dtype)
        if gcn.msg_norm:
            from ..convs.sparse import MsgNorm

            m, _ = MsgNorm(gcn.learn_msg_scale).apply(
                params["gcn"]["msg_norm"], {}, h, m)
        h2 = h + m
        out, _ = gcn._mlp().apply(params["gcn"]["mlp"], {}, h2, train=train,
                                  mask=my.node_mask,
                                  compute_dtype=(cd if gcn.compute_dtype
                                                 == "bfloat16" else None))
        return out, state


def _pre_block(params, blk, x, my, train, mask_c):
    """Shared norm → relu → shared-dropout prologue of every rev block
    (`eff_gcn_modules/rev/rev_layer.py:29-51`)."""
    nrm = make_norm(blk.norm, blk.in_dim)
    h, _ = nrm.apply(params["norm"], {}, x, train=train, mask=my.node_mask)
    h = jax.nn.relu(h)
    if train and mask_c is not None:
        h = h * mask_c
    return h


@dataclass(frozen=True)
class SpatialGCNBlock(Module):
    """Spatial twin of rev.rev_layer.GCNBlock (same param pytree).

    SemiGCN's sym-norm factorizes per node (Σ_j dinv_i·dinv_j·xt_j =
    dinv_i · Σ_j (dinv_j·xt_j)), so the exchanged payload is the pre-scaled
    node table dinv·xt — one ICI exchange, receiver-side scale and the
    analytic self-loop term stay local (edges are partitioned by receiver,
    so every receiver's degree/self-loop bookkeeping is shard-local)."""
    blk: Module
    axis: str = "gp"
    exchange: str = "auto"

    def init(self, key):
        return self.blk.init(key)

    def apply(self, params, state, x, sh: SpatialShards, *,
              chunk_args: Tuple = (), train: bool = False, **kw):
        from ..ops.segment import segment_degree, segment_sum

        my = jax.tree_util.tree_map(lambda a: a[0], sh)
        S = my.node_mask.shape[0]
        mask_c = chunk_args[0] if len(chunk_args) > 0 else None
        h = _pre_block(params, self.blk, x, my, train, mask_c)

        gp = params["gcn"]
        xt = h @ gp["w"]
        d_index = jax.lax.axis_index(self.axis)
        # my.senders are GLOBAL ids; receivers LOCAL rows of this shard
        gr = my.receivers + d_index * S
        is_self = my.edge_mask & (my.senders == gr)
        has_self = segment_degree(my.receivers, S, mask=is_self)
        deg = segment_degree(my.receivers, S, mask=my.edge_mask) + (
            1.0 - jnp.minimum(has_self, 1.0))
        dinv = jax.lax.rsqrt(jnp.maximum(deg, 1.0))

        src_tab, senders = exchange_sources(dinv[:, None] * xt, sh, self.axis,
                                            self.exchange)
        msg = jnp.take(src_tab, jnp.minimum(senders, src_tab.shape[0] - 1),
                       axis=0)
        out = dinv[:, None] * segment_sum(msg, my.receivers, S,
                                          mask=my.edge_mask,
                                          row_ptr=my.row_ptr)
        # analytic self-loop for nodes without an explicit self edge
        # (convs/sparse.py SemiGCNConv semantics)
        out = out + xt * ((1.0 - jnp.minimum(has_self, 1.0)) * dinv * dinv)[:, None]
        if "b" in gp:
            out = out + gp["b"]
        return out, state


@dataclass(frozen=True)
class SpatialSAGEBlock(Module):
    """Spatial twin of rev.rev_layer.SAGEBlock (same param pytree): the
    exchanged payload is xt = h·W; the non-self mean and the update MLP are
    shard-local (receiver-partitioned edges)."""
    blk: Module
    axis: str = "gp"
    exchange: str = "auto"

    def init(self, key):
        return self.blk.init(key)

    def apply(self, params, state, x, sh: SpatialShards, *,
              chunk_args: Tuple = (), train: bool = False, **kw):
        from ..ops.segment import segment_degree, segment_sum

        my = jax.tree_util.tree_map(lambda a: a[0], sh)
        S = my.node_mask.shape[0]
        mask_c = chunk_args[0] if len(chunk_args) > 0 else None
        h = _pre_block(params, self.blk, x, my, train, mask_c)

        gp = params["gcn"]
        xt = h @ gp["w"]
        src_tab, senders = exchange_sources(xt, sh, self.axis, self.exchange)
        msg = jnp.take(src_tab, jnp.minimum(senders, src_tab.shape[0] - 1),
                       axis=0)
        d_index = jax.lax.axis_index(self.axis)
        emask = my.edge_mask & (my.senders != my.receivers + d_index * S)
        # mean over neighbors ∪ {self} (convs/sparse.py RSAGEConv semantics)
        s = segment_sum(msg, my.receivers, S, mask=emask,
                        row_ptr=my.row_ptr) + xt
        cnt = segment_degree(my.receivers, S, mask=emask) + 1.0
        agg = s / cnt[:, None]
        h2 = jnp.concatenate([h, agg], axis=1)
        conv = self.blk._conv()
        out, _ = conv._nn().apply(gp["nn"], {}, h2, train=train,
                                  mask=my.node_mask)
        if "b" in gp:
            out = out + gp["b"]
        return out, state


@dataclass(frozen=True)
class SpatialGATBlock(Module):
    """Spatial twin of rev.rev_layer.GATBlock (same param pytree).

    GAT's per-edge score decomposes per node (score_ij = leaky_relu(s_i + s_j)
    — the SDDMM split in convs/sparse.GATConv), so ONE exchanged payload
    [xt | s_src] serves both the attention logits and the messages; the
    segment softmax (over actual neighbors when conv.self_loops=False — the
    reference GATBlock's add_self_loops=False — else neighbors ∪ {self} with
    self edges excluded and re-added analytically) is receiver-local because
    edges are partitioned by receiver.  Matches
    `eff_gcn_modules/rev/rev_layer.py:96-109`."""
    blk: Module          # the single-chip GATBlock
    axis: str = "gp"
    exchange: str = "auto"

    def init(self, key):
        return self.blk.init(key)

    def apply(self, params, state, x, sh: SpatialShards, *,
              chunk_args: Tuple = (), train: bool = False, **kw):
        my = jax.tree_util.tree_map(lambda a: a[0], sh)
        S = my.node_mask.shape[0]
        mask_c = chunk_args[0] if len(chunk_args) > 0 else None
        hpre = _pre_block(params, self.blk, x, my, train, mask_c)

        conv = self.blk._conv()
        gp = params["gcn"]
        h, d = conv.heads, conv.out_dim
        xt = (hpre @ gp["w"]).reshape(S, h, d)
        a_l, a_r = gp["att"][:, :d], gp["att"][:, d:]
        s_dst = jnp.einsum("nhd,hd->nh", xt, a_l)   # center term, local
        s_src = jnp.einsum("nhd,hd->nh", xt, a_r)   # neighbor term, exchanged

        payload = jnp.concatenate([xt.reshape(S, h * d), s_src], axis=1)
        tab, senders = exchange_sources(payload, sh, self.axis, self.exchange)
        senders = jnp.minimum(senders, tab.shape[0] - 1)
        xt_src = tab[:, : h * d]
        ss_src = tab[:, h * d:]

        d_index = jax.lax.axis_index(self.axis)
        if conv.self_loops:
            emask = my.edge_mask & (my.senders != my.receivers + d_index * S)
        else:
            # add_self_loops=False (`rev_layer.py:97`): edge list as-is
            emask = my.edge_mask
        e_score = jax.nn.leaky_relu(
            jnp.take(s_dst, my.receivers, axis=0, mode="clip")
            + jnp.take(ss_src, senders, axis=0), conv.neg_slope)
        self_score = jax.nn.leaky_relu(s_dst + s_src, conv.neg_slope)

        seg_max = jax.ops.segment_max(
            jnp.where(emask[:, None], e_score, -jnp.inf), my.receivers, S,
            indices_are_sorted=True)
        mx = jnp.where(jnp.isfinite(seg_max), seg_max, -jnp.inf)
        if conv.self_loops:
            mx = jnp.maximum(mx, self_score)
        mx = jax.lax.stop_gradient(jnp.where(jnp.isfinite(mx), mx, 0.0))
        e_exp = jnp.where(
            emask[:, None],
            jnp.exp(e_score - jnp.take(mx, my.receivers, axis=0, mode="clip")),
            0)
        denom = jax.ops.segment_sum(e_exp, my.receivers, S,
                                    indices_are_sorted=True)
        if conv.self_loops:
            self_exp = jnp.exp(self_score - mx)
            denom = denom + self_exp
            alpha_self = self_exp / jnp.maximum(denom, 1e-16)
        alpha = e_exp / jnp.maximum(
            jnp.take(denom, my.receivers, axis=0, mode="clip"), 1e-16)

        msg = (jnp.take(xt_src, senders, axis=0).reshape(-1, h, d)
               * alpha[..., None])
        out = jax.ops.segment_sum(
            jnp.where(emask[:, None, None], msg, 0), my.receivers, S,
            indices_are_sorted=True)
        if conv.self_loops:
            out = out + xt * alpha_self[..., None]
        out = out.reshape(S, h * d)
        if conv.bias:
            out = out + gp["b"]
        # GATBlock epilogue: concat=False → mean over heads
        out = out.reshape(S, h, d).mean(axis=1)
        return out, state


class SpatialRevGCN:
    """Parallel twin of models.rev_gcn.RevGCN (same params — init either)."""

    def __init__(self, cfg: RevGCNConfig, axis: str = "gp",
                 exchange: str = "auto"):
        assert cfg.norm == "layer", (
            "reversible couplings need stateless norms (norm='layer')")
        self.cfg = cfg
        self.axis = axis
        self.exchange = exchange
        self.inner = RevGCN(cfg)
        if cfg.conv == "gen":
            self._sp_fm = SpatialGENBlock(self.inner._fm, axis, exchange)
        elif cfg.conv == "gcn":
            self._sp_fm = SpatialGCNBlock(self.inner._fm, axis, exchange)
        elif cfg.conv == "sage":
            self._sp_fm = SpatialSAGEBlock(self.inner._fm, axis, exchange)
        elif cfg.conv == "gat":
            self._sp_fm = SpatialGATBlock(self.inner._fm, axis, exchange)
        else:
            raise NotImplementedError(
                f"spatial rev conv {cfg.conv!r} (gen/gcn/sage/gat)")
        self._coupling = GroupAdditiveCoupling(self._sp_fm, group=cfg.group)

    def init(self, key):
        return self.inner.init(key)

    def apply_sharded(self, params, state, x_local, sh: SpatialShards, *,
                      node_feats_local: Optional[Array] = None,
                      train: bool = False, rng: Optional[Array] = None):
        c = self.cfg
        inner = self.inner
        my_mask = sh.node_mask[0]

        # -- input features (`model_rev.py:85-96`), all row-local
        if inner._one_hot is not None:
            assert node_feats_local is not None
            oh, _ = inner._one_hot.apply(params["one_hot_encoder"], {}, x_local)
            h_in = jnp.concatenate([node_feats_local, oh], axis=1)
        else:
            h_in = node_feats_local if node_feats_local is not None else x_local
        h, _ = inner._encoder.apply(params["encoder"], {}, h_in)

        # -- edge embedding from the LOCAL edge shard, replicated ×G (`:98-99`)
        edge_emb = None
        if sh.edge_attr is not None and inner._edge_encoder is not None:
            ee, _ = inner._edge_encoder.apply(params["edge_encoder"], {},
                                              sh.edge_attr[0])
            edge_emb = jnp.concatenate([ee] * c.group, axis=-1)

        # -- one shared dropout mask per device (deterministic per (device,
        # run); forward and inverse reuse it, so reversibility is exact)
        mask = None
        if train and c.dropout > 0:
            assert rng is not None
            d_index = jax.lax.axis_index(self.axis)
            mk = jax.random.fold_in(jax.random.fold_in(rng, 0), d_index)
            mask = jax.lax.stop_gradient(
                shared_dropout_mask(mk, h.shape, c.dropout, h.dtype))

        coupling = self._coupling

        def fwd_one(p, h, diff_args):
            m, e = diff_args
            return coupling.forward(p, h, sh, m, e, train=train)

        def inv_one(p, y, diff_args):
            m, e = diff_args
            return coupling.inverse(p, y, sh, m, e, train=train)

        def inv_vjp_one(p, y, diff_args, gy):
            m, e = diff_args
            x, gx, gp, (gm, ge) = coupling.inverse_and_vjp(
                p, y, sh, gy, m, e, train=train)
            return x, gx, gp, (gm, ge)

        run = make_reversible_scan(fwd_one, inv_one, inv_vjp_one)
        h = run(params["layers"], h, (mask, edge_emb))

        # -- head (`:109-112`)
        h, _ = inner._last_norm.apply(params["last_norm"], {}, h, train=train,
                                      mask=my_mask)
        h = jax.nn.relu(h)
        h = dropout(h, c.dropout, train=train,
                    rng=None if rng is None else jax.random.fold_in(rng, 1))
        out, _ = inner._pred.apply(params["pred"], {}, h)
        return out, state


def spatial_rev_forward(model: SpatialRevGCN, mesh: Mesh, axis: str = "gp"):
    """Jitted sharded inference: (params, x [D,S,Cin], nf [D,S,Cf], shards) →
    logits [D,S,T]."""

    def _fwd(params, x, nf, sh):
        out, _ = model.apply_sharded(params, {}, x[0], sh,
                                     node_feats_local=None if nf is None
                                     else nf[0], train=False)
        return out[None]

    fn = shard_map(_fwd, mesh=mesh,
                   in_specs=(P(), P(axis), P(axis), P(axis)),
                   out_specs=P(axis))
    return jax.jit(fn)


def spatial_rev_train_step(model: SpatialRevGCN, tx, loss_fn, mesh: Mesh,
                           axis: str = "gp"):
    """Jitted sharded train step; loss_fn returns (sum, count) per shard so the
    cross-shard mean is exact; grads of replicated params leave shard_map
    autodiff already psum'd (see parallel/data_parallel.py note)."""

    def _step(params, opt_state, x, nf, sh, labels, lmask, rng):
        import optax

        x = x[0]
        nf0 = None if nf is None else nf[0]
        labels, lmask = labels[0], lmask[0]

        def lossf(p):
            logits, _ = model.apply_sharded(p, {}, x, sh,
                                            node_feats_local=nf0, train=True,
                                            rng=rng)
            ls, cnt = loss_fn(logits, labels, lmask)
            return jax.lax.psum(ls, axis) / jnp.maximum(
                jax.lax.psum(cnt, axis), 1.0)

        loss, grads = jax.value_and_grad(lossf)(params)
        updates, opt2 = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt2, loss

    fn = shard_map(_step, mesh=mesh,
                   in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis),
                             P(axis), P()),
                   out_specs=(P(), P(), P()))
    return jax.jit(fn, donate_argnums=(0, 1))
