"""DeeperGCN backbone (GENConv + res+/res/plain blocks).

TPU-native rebuild of `examples/ogb/ogbn_arxiv/model.py:10-140` (and the proteins /
products / mol variants): identical math, but the homogeneous layer stack runs under
`lax.scan` over *stacked* per-layer parameters — one compiled layer body regardless of
depth (112-layer DyResGEN compiles as fast as 7-layer), with `jax.checkpoint` remat
replacing `torch.utils.checkpoint` (`model.py:39-41, 88-99`).

Block semantics (reference `model.py:84-136`):
  res+ : h ← gcn_l( drop( relu( norm_{l-1}(h) ) ) ) + h   (pre-activation)
  res  : h ← relu( norm_l( gcn_l(h) ) ) + h, then dropout
  plain: h ← drop( relu( norm_l( gcn_l(h) ) ) )
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..convs.sparse import GENConv
from ..graph import Graph
from ..nn.core import MLP, Linear, Module, MultiEmbedding, dropout, make_norm
from ..ops.segment import scatter

Array = jax.Array


@dataclass(frozen=True)
class DeeperGCNConfig:
    in_channels: int
    hidden_channels: int
    num_tasks: int
    num_layers: int = 28
    block: str = "res+"
    aggr: str = "softmax"          # gcn_aggr flag
    t: float = 1.0
    learn_t: bool = False
    p: float = 1.0
    learn_p: bool = False
    y: float = 0.0
    learn_y: bool = False
    msg_norm: bool = False
    learn_msg_scale: bool = False
    norm: str = "batch"
    mlp_layers: int = 1
    dropout: float = 0.0
    # node encoder: 'linear' (arxiv/proteins) or 'atom' (ogbg_mol AtomEncoder)
    node_encoder: str = "linear"
    atom_feature_dims: Optional[Tuple[int, ...]] = None
    # edge features: 'none' | 'one_time' (encode once at model level, proteins
    # conv_encode_edge=False path: `ogbn_proteins/model.py:90`) | 'one_time_bond'
    # (model-level BondEncoder, ogbg_mol conv_encode_edge=False: `ogbg_mol/model.py:87`)
    # | 'per_layer' (GENConv encodes each layer) | 'bond' (per-layer BondEncoder)
    edge_mode: str = "none"
    edge_feat_dim: int = 0
    bond_feature_dims: Optional[Tuple[int, ...]] = None
    # graph-level pooling head ('' = node-level output)
    graph_pooling: str = ""
    # Layer-scan rematerialization (`torch.utils.checkpoint` analog,
    # `ogbn_arxiv/model.py:39-41`). Off by default: the fused aggregation keeps
    # only node-sized residuals (O(N·C) per layer), so full-batch arxiv-scale
    # training fits HBM without remat and the backward skips a whole re-forward
    # (~1.5x step time). Enable for very deep nets on very large partitions.
    remat: bool = False
    # virtual node (ogbg_mol: `ogbg_mol/model.py:57-65,121-132`), res+ only
    add_virtual_node: bool = False
    # checkpoint the norm→relu→dropout prologue/epilogue at train time: saves
    # the pred-mask residuals (~100MB/layer at arxiv scale) at the cost of
    # recomputing BN stats + the dropout RNG in the backward. Default True
    # (memory headroom for deep/partitioned runs); bench-style full-batch
    # arxiv-scale runs fit HBM without it and save ~?ms/layer — measured in
    # ROOFLINE.md.
    checkpoint_prologue: bool = True
    # final head shape: arxiv/proteins/products/collab apply ReLU after the last
    # norm; mol and ppa do not (`ogbg_mol/model.py:135-137`, `ogbg_ppa/model.py:102`)
    final_relu: bool = True
    final_dropout: bool = True
    # proteins: concat aggregated node features with a Linear(8,8) one-hot encoding
    # (`ogbn_proteins/model.py:84-101`); x = species one-hot, node_feats = aggregated
    use_one_hot_encoding: bool = False
    node_feat_dim: int = 0
    compute_dtype: str = "float32"  # 'bfloat16' for the conv hot path
    # res+ residual-carry dtype.  'float32' (default) keeps reference parity:
    # torch accumulates h = h + res in f32.  'bfloat16' halves the carry's
    # HBM traffic through the layer scan (read+write per layer, plus the
    # backward's stacked residuals) at the cost of bf16 rounding in the
    # residual sum — a PARITY-BREAKING option, priced on-chip so the cost of
    # the default is a measured number (ROOFLINE.md "ER floor items").
    residual_dtype: str = "float32"


class DeeperGCN(Module):
    def __init__(self, cfg: DeeperGCNConfig):
        self.cfg = cfg
        c = cfg
        assert not (c.add_virtual_node and c.block != "res+"), \
            "virtual node is wired for res+ (the reference's used config)"
        per_layer_edge = c.edge_mode in ("per_layer", "bond")
        self._gcn = GENConv(
            c.hidden_channels, c.hidden_channels, aggr=c.aggr, t=c.t,
            learn_t=c.learn_t, p=c.p, learn_p=c.learn_p, y=c.y, learn_y=c.learn_y,
            msg_norm=c.msg_norm, learn_msg_scale=c.learn_msg_scale,
            encode_edge=per_layer_edge, bond_encoder=(c.edge_mode == "bond"),
            edge_feat_dim=c.edge_feat_dim or None,
            bond_feature_dims=c.bond_feature_dims,
            norm=c.norm, mlp_layers=c.mlp_layers, compute_dtype=c.compute_dtype)
        self._norm = make_norm(c.norm, c.hidden_channels)
        self._one_hot = None
        if c.node_encoder == "atom":
            assert c.atom_feature_dims is not None
            self._encoder: Module = MultiEmbedding(tuple(c.atom_feature_dims),
                                                   c.hidden_channels)
        elif c.use_one_hot_encoding:
            self._one_hot = Linear(c.in_channels, c.in_channels)
            self._encoder = Linear(c.node_feat_dim + c.in_channels,
                                   c.hidden_channels)
        else:
            self._encoder = Linear(c.in_channels, c.hidden_channels)
        self._pred = Linear(c.hidden_channels, c.num_tasks)
        if c.edge_mode == "one_time":
            self._edge_encoder: Optional[Module] = Linear(c.edge_feat_dim,
                                                          c.hidden_channels)
        elif c.edge_mode == "one_time_bond":
            assert c.bond_feature_dims is not None
            self._edge_encoder = MultiEmbedding(tuple(c.bond_feature_dims),
                                                c.hidden_channels)
        else:
            self._edge_encoder = None
        self._vn_mlp = (MLP((c.hidden_channels,) * 3, norm=c.norm)
                        if c.add_virtual_node else None)

    # -- init ---------------------------------------------------------------
    def init(self, key):
        c = self.cfg
        L = c.num_layers
        ks = jax.random.split(key, 6)
        params, state = {}, {}
        params["encoder"], _ = self._encoder.init(ks[0])
        params["pred"], _ = self._pred.init(ks[1])
        if self._edge_encoder is not None:
            params["edge_encoder"], _ = self._edge_encoder.init(ks[2])

        def stack_init(mod, key, n):
            # one traced init vmapped over layer keys — O(1) dispatch regardless of
            # depth (a python loop would eager-dispatch 112×: slow over remote TPU)
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n))
            return jax.vmap(mod.init)(keys)

        params["gcns"], state["gcns"] = stack_init(self._gcn, ks[3], L)
        params["norms"], state["norms"] = stack_init(self._norm, ks[4], L)
        if self._one_hot is not None:
            params["one_hot_encoder"], _ = self._one_hot.init(ks[5])
        if self._vn_mlp is not None:
            params["vn_emb"] = jnp.zeros((1, c.hidden_channels))
            params["vn_mlps"], state["vn_mlps"] = stack_init(
                self._vn_mlp, jax.random.fold_in(ks[5], 1), L - 1)
        return params, state

    # -- helpers ------------------------------------------------------------
    def _slice(self, tree, i):
        return jax.tree_util.tree_map(lambda x: x[i], tree)

    def _apply_layer(self, lp, ls, h, g, edge_emb, train, rng, axis_name):
        ee, ee_csc = edge_emb if isinstance(edge_emb, tuple) else (edge_emb, None)
        return self._gcn.apply(lp, ls, h, g, train=train, rng=rng,
                               axis_name=axis_name, edge_emb=ee,
                               edge_emb_csc=ee_csc)

    # -- forward ------------------------------------------------------------
    def apply(self, params, state, x, g: Graph, *, train: bool = False,
              rng: Optional[Array] = None, axis_name: Optional[str] = None,
              node_feats: Optional[Array] = None, **kw):
        c = self.cfg
        L = c.num_layers
        if self._one_hot is not None:
            assert node_feats is not None, "use_one_hot_encoding needs node_feats"
            oh, _ = self._one_hot.apply(params["one_hot_encoder"], {}, x)
            x = jnp.concatenate([node_feats, oh], axis=1)
        h, _ = self._encoder.apply(params["encoder"], {}, x)
        if c.residual_dtype == "bfloat16":
            h = h.astype(jnp.bfloat16)  # the scan carry inherits this dtype

        edge_emb = None
        if self._edge_encoder is not None and g.edge_attr is not None:
            ee, _ = self._edge_encoder.apply(params["edge_encoder"], {},
                                             g.edge_attr)
            ee_csc = None
            if g.edge_attr_csc is not None:
                # CSC-ordered copy for the fused-kernel backward (encoded, not
                # permuted — edge-emb cotangents flow through this one)
                ee_csc, _ = self._edge_encoder.apply(params["edge_encoder"], {},
                                                     g.edge_attr_csc)
            edge_emb = (ee, ee_csc)

        # virtual node: one zero-init embedding per graph (`ogbg_mol/model.py:108-112`)
        vn = None
        if self._vn_mlp is not None:
            assert g.node_graph is not None
            vn = jnp.broadcast_to(params["vn_emb"], (g.num_graphs, c.hidden_channels))
            vn_gather = jnp.take(vn, jnp.minimum(g.node_graph, g.num_graphs - 1), 0)
            h = h + jnp.where(g.node_mask[:, None], vn_gather, 0)

        nmask = g.node_mask
        drop = c.dropout

        def layer_rng(i):
            if rng is None:
                return None
            return jax.random.fold_in(rng, i)

        if c.block == "res+":
            # first gcn applied raw (`model.py:86`)
            h, gs0 = self._apply_layer(self._slice(params["gcns"], 0),
                                       self._slice(state["gcns"], 0),
                                       h, g, edge_emb, train, layer_rng(0), axis_name)
            if c.residual_dtype == "bfloat16":
                h = h.astype(jnp.bfloat16)  # layer-0 MLP re-promoted to f32

            def prologue(np_, ns_, h, r):
                # norm → relu → dropout (`model.py:90-94`). Checkpointed at train
                # time: without it, relu and dropout each store a pred mask
                # (4 bytes/elem on TPU — 87MB/layer at arxiv scale) plus f32
                # intermediates across the scan; recomputing the prologue in the
                # backward costs two cheap elementwise passes instead.
                h1, ns_out = self._norm.apply(np_, ns_, h, train=train, mask=nmask,
                                              axis_name=axis_name)
                h2 = jax.nn.relu(h1)
                h2 = dropout(h2, drop, train=train,
                             rng=None if r is None else jax.random.fold_in(r, 1))
                return h2, ns_out

            if train and c.checkpoint_prologue:
                prologue = jax.checkpoint(prologue)

            def body(carry, inp):
                h, vn = carry
                i = inp  # layer index 1..L-1
                np_ = self._slice(params["norms"], i - 1)
                ns_ = self._slice(state["norms"], i - 1)
                gp_ = self._slice(params["gcns"], i)
                gss = self._slice(state["gcns"], i)
                r = layer_rng(i)
                h2, ns_out = prologue(np_, ns_, h, r)
                vn_out = vn
                aux = ()
                if vn is not None:
                    # `ogbg_mol/model.py:121-132`
                    pooled = scatter("sum", h2, g.node_graph, g.num_graphs,
                                     mask=nmask)
                    vn_tmp = pooled + vn
                    mp = self._slice(params["vn_mlps"], i - 1)
                    ms = self._slice(state["vn_mlps"], i - 1)
                    vn_new, vn_ms = self._vn_mlp.apply(mp, ms, vn_tmp, train=train,
                                                       rng=r, axis_name=axis_name)
                    vn_out = dropout(
                        vn_new, drop, train=train,
                        rng=None if r is None else jax.random.fold_in(r, 2))
                    h2 = h2 + jnp.take(vn_out,
                                       jnp.minimum(g.node_graph, g.num_graphs - 1),
                                       0) * nmask[:, None]
                    aux = (vn_ms,)
                res, gs_out = self._apply_layer(gp_, gss, h2, g, edge_emb, train, r,
                                                axis_name)
                # res joins the carry in the carry's dtype (residual_dtype
                # knob: bf16 carry would silently promote back to f32 here)
                return (h + res.astype(h.dtype), vn_out), (ns_out, gs_out) + aux

            body_fn = jax.checkpoint(body) if c.remat else body
            (h, vn), scanned = jax.lax.scan(body_fn, (h, vn), jnp.arange(1, L))
            norm_states, gcn_states = scanned[0], scanned[1]
            vn_states = scanned[2] if len(scanned) > 2 else None

            # final norm uses norms[L-1]
            npL = self._slice(params["norms"], L - 1)
            nsL = self._slice(state["norms"], L - 1)
            h1, nsL_out = self._norm.apply(npL, nsL, h, train=train, mask=nmask,
                                           axis_name=axis_name)
            h = jax.nn.relu(h1) if c.final_relu else h1
            if c.final_dropout:
                h = dropout(h, drop, train=train, rng=layer_rng(L))

            # reassemble stacked states (gcn0 + scanned, scanned norms + last)
            new_state = {
                "gcns": jax.tree_util.tree_map(
                    lambda first, rest: jnp.concatenate([first[None], rest], 0),
                    gs0, gcn_states),
                "norms": jax.tree_util.tree_map(
                    lambda rest, last: jnp.concatenate([rest, last[None]], 0),
                    norm_states, nsL_out),
            }
            if vn_states is not None:
                new_state["vn_mlps"] = vn_states

        elif c.block in ("res", "plain"):
            def epilogue(np_, ns_, h1, h, r):
                # norm → relu → (+res) → dropout (`model.py:111-130`); checkpointed
                # at train time for the same pred-mask-residual reason as res+.
                h2, ns_out = self._norm.apply(np_, ns_, h1, train=train, mask=nmask,
                                              axis_name=axis_name)
                h3 = jax.nn.relu(h2)
                h_out = h3 + h if c.block == "res" else h3
                h_out = dropout(h_out, drop, train=train,
                                rng=None if r is None else jax.random.fold_in(r, 1))
                return h_out, ns_out

            if train and c.checkpoint_prologue:
                epilogue = jax.checkpoint(epilogue)

            def body(carry, inp):
                h = carry
                i = inp
                gp_ = self._slice(params["gcns"], i)
                gss = self._slice(state["gcns"], i)
                np_ = self._slice(params["norms"], i)
                ns_ = self._slice(state["norms"], i)
                r = layer_rng(i)
                h1, gs_out = self._apply_layer(gp_, gss, h, g, edge_emb, train, r,
                                               axis_name)
                h_out, ns_out = epilogue(np_, ns_, h1, h, r)
                return h_out, (ns_out, gs_out)

            body_fn = jax.checkpoint(body) if c.remat else body
            h, (norm_states, gcn_states) = jax.lax.scan(body_fn, h, jnp.arange(L))
            new_state = {"gcns": gcn_states, "norms": norm_states}
        else:
            raise NotImplementedError(f"Unknown block Type {c.block}")

        if c.graph_pooling:
            assert g.node_graph is not None
            h = scatter(c.graph_pooling, h, g.node_graph, g.num_graphs,
                        mask=g.node_mask)

        out, _ = self._pred.apply(params["pred"], {}, h)
        return out, new_state
