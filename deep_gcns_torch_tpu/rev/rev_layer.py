"""Pre-activation blocks used inside reversible couplings.

Rebuild of `eff_gcn_modules/rev/rev_layer.py:29-109`: norm → ReLU → shared-dropout →
conv, with GEN/GCN/SAGE/GAT flavors.  The shared dropout mask is an explicit argument
(one mask per forward pass, chunked per group by the coupling — reference
`SharedDropout` + `model_rev.py:101-107`), which makes forward and inverse
reconstructions bit-identical by construction.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..convs.sparse import GATConv, GENConv, RSAGEConv, SemiGCNConv
from ..graph import Graph
from ..nn.core import Module, make_norm

Array = jax.Array


@dataclass(frozen=True)
class GENBlock(Module):
    """norm → relu → shared-dropout → GENConv (`rev_layer.py:54-77`)."""
    in_dim: int
    out_dim: int
    aggr: str = "softmax"
    t: float = 1.0
    learn_t: bool = False
    p: float = 1.0
    learn_p: bool = False
    y: float = 0.0
    learn_y: bool = False
    msg_norm: bool = False
    learn_msg_scale: bool = False
    encode_edge: bool = False
    edge_feat_dim: int = 0
    norm: str = "layer"
    mlp_layers: int = 1
    compute_dtype: str = "float32"

    def _gcn(self) -> GENConv:
        return GENConv(self.in_dim, self.out_dim, aggr=self.aggr, t=self.t,
                       learn_t=self.learn_t, p=self.p, learn_p=self.learn_p,
                       y=self.y, learn_y=self.learn_y, msg_norm=self.msg_norm,
                       learn_msg_scale=self.learn_msg_scale,
                       encode_edge=self.encode_edge,
                       edge_feat_dim=self.edge_feat_dim or None,
                       norm=self.norm, mlp_layers=self.mlp_layers,
                       compute_dtype=self.compute_dtype)

    def init(self, key):
        k0, k1 = jax.random.split(key)
        nrm = make_norm(self.norm, self.in_dim)
        np_, ns = nrm.init(k0)
        gp, gs = self._gcn().init(k1)
        params = {"norm": np_, "gcn": gp}
        # stateless requirement for reversibility
        return params, {}

    def apply(self, params, state, x, g: Graph, *, chunk_args: Tuple = (),
              train: bool = False, **kw):
        dropout_mask = chunk_args[0] if len(chunk_args) > 0 else None
        edge_attr = chunk_args[1] if len(chunk_args) > 1 else None
        edge_attr_csc = chunk_args[2] if len(chunk_args) > 2 else None
        nrm = make_norm(self.norm, self.in_dim)
        h, _ = nrm.apply(params["norm"], {}, x, train=train, mask=g.node_mask)
        h = jax.nn.relu(h)
        if train and dropout_mask is not None:
            h = h * dropout_mask
        out, _ = self._gcn().apply(params["gcn"], {}, h, g, train=train,
                                   edge_attr=edge_attr,
                                   edge_attr_csc=edge_attr_csc)
        return out, state


@dataclass(frozen=True)
class GCNBlock(Module):
    """norm → relu → shared-dropout → SemiGCN (`rev_layer.py:80-85`)."""
    in_dim: int
    out_dim: int
    norm: str = "layer"

    def init(self, key):
        k0, k1 = jax.random.split(key)
        np_, _ = make_norm(self.norm, self.in_dim).init(k0)
        gp, gs = SemiGCNConv(self.in_dim, self.out_dim, act=None, norm=None).init(k1)
        return {"norm": np_, "gcn": gp}, {}

    def apply(self, params, state, x, g: Graph, *, chunk_args: Tuple = (),
              train: bool = False, **kw):
        dropout_mask = chunk_args[0] if len(chunk_args) > 0 else None
        h, _ = make_norm(self.norm, self.in_dim).apply(params["norm"], {}, x,
                                                       train=train, mask=g.node_mask)
        h = jax.nn.relu(h)
        if train and dropout_mask is not None:
            h = h * dropout_mask
        out, _ = SemiGCNConv(self.in_dim, self.out_dim, act=None, norm=None).apply(
            params["gcn"], {}, h, g, train=train)
        return out, state


@dataclass(frozen=True)
class SAGEBlock(Module):
    """norm → relu → shared-dropout → SAGE (`rev_layer.py:88-94`)."""
    in_dim: int
    out_dim: int
    norm: str = "layer"

    def _conv(self):
        return RSAGEConv(self.in_dim, self.out_dim, act=None, norm=None,
                         relative=False)

    def init(self, key):
        k0, k1 = jax.random.split(key)
        np_, _ = make_norm(self.norm, self.in_dim).init(k0)
        gp, _ = self._conv().init(k1)
        return {"norm": np_, "gcn": gp}, {}

    def apply(self, params, state, x, g: Graph, *, chunk_args: Tuple = (),
              train: bool = False, **kw):
        dropout_mask = chunk_args[0] if len(chunk_args) > 0 else None
        h, _ = make_norm(self.norm, self.in_dim).apply(params["norm"], {}, x,
                                                       train=train, mask=g.node_mask)
        h = jax.nn.relu(h)
        if train and dropout_mask is not None:
            h = h * dropout_mask
        out, _ = self._conv().apply(params["gcn"], {}, h, g, train=train)
        return out, state


@dataclass(frozen=True)
class GATBlock(Module):
    """norm → relu → shared-dropout → GAT (`rev_layer.py:97-109`)."""
    in_dim: int
    out_dim: int
    heads: int = 1
    norm: str = "layer"

    def _conv(self):
        # concat=False ⇒ average heads: emulate with 1-head out_dim (heads>1
        # averaged).  The reference constructs PyG GATConv(add_self_loops=False)
        # (`rev_layer.py:97`) — softmax over actual neighbors only.
        return GATConv(self.in_dim, self.out_dim, heads=self.heads, act=None,
                       norm=None, self_loops=False)

    def init(self, key):
        k0, k1 = jax.random.split(key)
        np_, _ = make_norm(self.norm, self.in_dim).init(k0)
        gp, _ = self._conv().init(k1)
        return {"norm": np_, "gcn": gp}, {}

    def apply(self, params, state, x, g: Graph, *, chunk_args: Tuple = (),
              train: bool = False, **kw):
        dropout_mask = chunk_args[0] if len(chunk_args) > 0 else None
        h, _ = make_norm(self.norm, self.in_dim).apply(params["norm"], {}, x,
                                                       train=train, mask=g.node_mask)
        h = jax.nn.relu(h)
        if train and dropout_mask is not None:
            h = h * dropout_mask
        out, _ = self._conv().apply(params["gcn"], {}, h, g, train=train)
        # concat=False → mean over heads
        n = out.shape[0]
        out = out.reshape(n, self.heads, self.out_dim).mean(axis=1)
        return out, state
