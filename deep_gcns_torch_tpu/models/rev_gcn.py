"""RevGCN — reversible grouped GENConv backbone (GNN-1000).

Rebuild of `examples/ogb_eff/ogbn_proteins/model_rev.py:12-112`:
  * per layer: GroupAdditiveCoupling of G GENBlocks on C/G channels each;
  * the whole L-layer stack runs as ONE reversible `lax.scan` with O(1) activation
    memory (rev/invertible.py) — RevGNN-Deep is L=1001 × C=80, G=2; RevGNN-Wide
    L=448 × C=224 (`examples/ogb_eff/ogbn_proteins/README.md`);
  * one shared dropout mask per forward (`model_rev.py:101-102`), chunked per group;
  * edge features encoded once (Linear 8→C), replicated ×G (`:98-99`), and encoded
    down to C/G inside each group's GENConv (conv_encode_edge path);
  * head: relu(last_norm) → dropout → linear (`:109-112`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..graph import Graph
from ..nn.core import Linear, Module, dropout, make_norm, shared_dropout_mask
from ..rev.coupling import GroupAdditiveCoupling
from ..rev.invertible import make_reversible_scan
from ..rev.rev_layer import GATBlock, GCNBlock, GENBlock, SAGEBlock

Array = jax.Array


@dataclass(frozen=True)
class RevGCNConfig:
    in_channels: int = 8          # raw node features (species one-hot for proteins)
    node_feat_dim: int = 8        # aggregated edge-feature node features
    edge_feat_dim: int = 8
    hidden_channels: int = 80
    num_tasks: int = 112
    num_layers: int = 1001
    group: int = 2
    aggr: str = "mean"
    t: float = 1.0
    learn_t: bool = False
    p: float = 1.0
    learn_p: bool = False
    y: float = 0.0
    learn_y: bool = False
    msg_norm: bool = False
    learn_msg_scale: bool = False
    conv_encode_edge: bool = True
    norm: str = "layer"
    mlp_layers: int = 1
    dropout: float = 0.0
    use_one_hot_encoding: bool = True
    compute_dtype: str = "float32"
    # group-function flavor (`eff_gcn_modules/rev/rev_layer.py:54-109`):
    # "gen" (GENBlock, the RevGNN-proteins flagship), "gcn" (SemiGCN),
    # "sage" (GraphSAGE), "gat" (GATBlock, heads averaged — the full
    # DGL-flavored RevGAT with label reuse/KD is the separate
    # models/rev_gat.py).
    conv: str = "gen"
    heads: int = 1  # conv="gat" only (`rev_layer.py:97`)


class RevGCN(Module):
    def __init__(self, cfg: RevGCNConfig):
        assert cfg.hidden_channels % cfg.group == 0
        self.cfg = cfg
        c = cfg
        cg = c.hidden_channels // c.group
        if c.conv == "gen":
            self._fm = GENBlock(
                cg, cg, aggr=c.aggr, t=c.t, learn_t=c.learn_t, p=c.p,
                learn_p=c.learn_p, y=c.y, learn_y=c.learn_y, msg_norm=c.msg_norm,
                learn_msg_scale=c.learn_msg_scale, encode_edge=c.conv_encode_edge,
                edge_feat_dim=c.hidden_channels, norm=c.norm,
                mlp_layers=c.mlp_layers, compute_dtype=c.compute_dtype)
        elif c.conv == "gcn":
            self._fm = GCNBlock(cg, cg, norm=c.norm)
        elif c.conv == "sage":
            self._fm = SAGEBlock(cg, cg, norm=c.norm)
        elif c.conv == "gat":
            self._fm = GATBlock(cg, cg, heads=c.heads, norm=c.norm)
        else:
            raise NotImplementedError(
                f"RevGCN conv {c.conv!r} (gen/gcn/sage/gat)")
        self._coupling = GroupAdditiveCoupling(self._fm, group=c.group)
        enc_in = c.node_feat_dim + (c.in_channels if c.use_one_hot_encoding else 0)
        self._one_hot = Linear(c.in_channels, c.in_channels) if c.use_one_hot_encoding else None
        self._encoder = Linear(enc_in, c.hidden_channels)
        # edge_feat_dim == 0 → no edge features in the task (e.g. arxiv-style
        # node-only graphs under the reversible stack); GCN/SAGE group
        # functions take no edge features (`rev_layer.py:80-94`)
        self._edge_encoder = (Linear(c.edge_feat_dim, c.hidden_channels)
                              if c.edge_feat_dim and c.conv == "gen" else None)
        self._last_norm = make_norm(c.norm, c.hidden_channels)
        self._pred = Linear(c.hidden_channels, c.num_tasks)

    def init(self, key):
        c = self.cfg
        ks = jax.random.split(key, 6)
        params = {}
        if self._one_hot is not None:
            params["one_hot_encoder"], _ = self._one_hot.init(ks[0])
        params["encoder"], _ = self._encoder.init(ks[1])
        if self._edge_encoder is not None:
            params["edge_encoder"], _ = self._edge_encoder.init(ks[2])
        params["last_norm"], _ = self._last_norm.init(ks[3])
        params["pred"], _ = self._pred.init(ks[4])
        keys = jax.vmap(lambda i: jax.random.fold_in(ks[5], i))(
            jnp.arange(c.num_layers))
        params["layers"], _ = jax.vmap(self._coupling.init)(keys)
        return params, {}

    def apply(self, params, state, x, g: Graph, *, node_feats: Optional[Array] = None,
              train: bool = False, rng: Optional[Array] = None,
              axis_name: Optional[str] = None, **kw):
        c = self.cfg
        # -- input features (`model_rev.py:85-96`)
        if self._one_hot is not None:
            assert node_feats is not None, "use_one_hot_encoding needs node_feats"
            oh, _ = self._one_hot.apply(params["one_hot_encoder"], {}, x)
            h_in = jnp.concatenate([node_feats, oh], axis=1)
        else:
            h_in = node_feats if node_feats is not None else x
        h, _ = self._encoder.apply(params["encoder"], {}, h_in)

        # -- edge embedding, replicated ×G (`:98-99`); the CSC-ordered twin rides
        # alongside so each group's GENConv can take the fused-kernel path
        edge_emb = edge_emb_csc = None
        if g.edge_attr is not None and self._edge_encoder is not None:
            edge_emb, _ = self._edge_encoder.apply(params["edge_encoder"], {},
                                                   g.edge_attr)
            edge_emb = jnp.concatenate([edge_emb] * c.group, axis=-1)
            if g.edge_attr_csc is not None:
                edge_emb_csc, _ = self._edge_encoder.apply(
                    params["edge_encoder"], {}, g.edge_attr_csc)
                edge_emb_csc = jnp.concatenate([edge_emb_csc] * c.group, axis=-1)

        # -- one shared dropout mask for all layers (`:101-102`)
        mask = None
        if train and c.dropout > 0:
            assert rng is not None
            mask = shared_dropout_mask(jax.random.fold_in(rng, 0), h.shape,
                                       c.dropout, h.dtype)
            mask = jax.lax.stop_gradient(mask)

        # -- reversible stack
        coupling = self._coupling

        def fwd_one(p, h, diff_args):
            m, e, ec = diff_args  # (dropout mask, edge emb, csc twin); None allowed
            return coupling.forward(p, h, g, m, e, ec, train=train)

        def inv_one(p, y, diff_args):
            m, e, ec = diff_args
            return coupling.inverse(p, y, g, m, e, ec, train=train)

        def inv_vjp_one(p, y, diff_args, gy):
            m, e, ec = diff_args
            x, gx, gp, (gm, ge, gec) = coupling.inverse_and_vjp(
                p, y, g, gy, m, e, ec, train=train)
            return x, gx, gp, (gm, ge, gec)

        run = make_reversible_scan(fwd_one, inv_one, inv_vjp_one)
        h = run(params["layers"], h, (mask, edge_emb, edge_emb_csc))

        # -- head (`:109-112`)
        h, _ = self._last_norm.apply(params["last_norm"], {}, h, train=train,
                                     mask=g.node_mask)
        h = jax.nn.relu(h)
        h = dropout(h, c.dropout, train=train,
                    rng=None if rng is None else jax.random.fold_in(rng, 1))
        out, _ = self._pred.apply(params["pred"], {}, h)
        return out, state
