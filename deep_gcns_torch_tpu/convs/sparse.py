"""Sparse (flat N×C) graph convolution zoo.

TPU-native rebuild of `gcn_lib/sparse/torch_vertex.py` + `torch_message.py`: every conv
is a pure function of (params, state, x, Graph) built on gather → message → masked
segment-aggregate → update.  Self-loop handling is *analytic* (closed-form extra term)
instead of edge-list surgery, because edge counts must stay static under XLA.

All convs share the signature
    y, state = conv.apply(params, state, x, g, train=..., rng=..., axis_name=...)
with `g` a `Graph` (senders/receivers sorted by receiver, masks, static padding).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..graph import Graph
from ..nn.core import (
    MLP, Linear, Module, MultiEmbedding, activation, dropout, make_norm, prelu_init,
)
from ..ops.segment import (
    fused_gather_ok, generalized_aggregate, scatter, segment_degree,
    segment_softmax, segment_sum,
)
from ..ops.band import (
    BAND_SOFTMAX_AGGRS, band_extreme, band_extreme_ok, band_interpret,
    band_ok, band_softmax_agg_auto, band_sum_auto, band_sum_ok,
)
from ..ops.spmm_pallas import fused_softmax_gather_agg_auto
from ..ops.gather import gather_dst_auto, gather_src_auto
from ..ops.knn import dilated_knn_graph_flat
from ..graph import build_graph  # noqa: F401  (re-export convenience)

Array = jax.Array


def gather(x: Array, idx: Array) -> Array:
    """Row gather with out-of-range (sentinel) indices clamped; padded edges are
    masked downstream so the clamped value never contributes."""
    return jnp.take(x, idx, axis=0, mode="clip")


def _no_self_mask(g: Graph) -> Array:
    return g.edge_mask & (g.senders != g.receivers)


# ---------------------------------------------------------------------------
# MsgNorm (`gcn_lib/sparse/torch_message.py:88-99`)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MsgNorm(Module):
    learn_msg_scale: bool = False

    def init(self, key):
        return {"s": jnp.ones((1,), jnp.float32)}, {}

    def apply(self, params, state, x, msg, **kw):
        s = params["s"] if self.learn_msg_scale else jax.lax.stop_gradient(params["s"])
        msg = msg / jnp.maximum(jnp.linalg.norm(msg, axis=1, keepdims=True), 1e-12)
        x_norm = jnp.linalg.norm(x, axis=1, keepdims=True)
        return msg * x_norm * s, state


# ---------------------------------------------------------------------------
# GENConv (`gcn_lib/sparse/torch_vertex.py:12-88`)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class GENConv(Module):
    """DeeperGCN generalized conv: msg = ReLU(x_j [+ e]) + ε, generalized softmax /
    power-mean aggregation, update h = MLP(x + m)."""
    in_dim: int
    emb_dim: int
    aggr: str = "softmax"
    t: float = 1.0
    learn_t: bool = False
    p: float = 1.0
    learn_p: bool = False
    y: float = 0.0
    learn_y: bool = False
    msg_norm: bool = False
    learn_msg_scale: bool = True
    encode_edge: bool = False
    bond_encoder: bool = False
    edge_feat_dim: Optional[int] = None
    bond_feature_dims: Optional[Tuple[int, ...]] = None
    norm: str = "batch"
    mlp_layers: int = 2
    eps: float = 1e-7
    # 'bfloat16' halves HBM traffic on the gather/message/aggregate hot path
    # (params and the update MLP stay f32; segment accumulation is f32 in-kernel)
    compute_dtype: str = "float32"

    def _mlp(self) -> MLP:
        chans = [self.in_dim] + [self.in_dim * 2] * (self.mlp_layers - 1) + [self.emb_dim]
        return MLP(tuple(chans), act="relu", norm=self.norm, last_lin=True)

    def _edge_encoder(self) -> Optional[Module]:
        if not self.encode_edge:
            return None
        if self.bond_encoder:
            assert self.bond_feature_dims is not None
            return MultiEmbedding(tuple(self.bond_feature_dims), self.in_dim)
        return Linear(self.edge_feat_dim, self.in_dim)

    def init(self, key):
        k0, k1, k2 = jax.random.split(key, 3)
        params, state = {}, {}
        params["mlp"], state["mlp"] = self._mlp().init(k0)
        if self.aggr in ("softmax", "softmax_sg", "softmax_sum"):
            params["t"] = jnp.asarray([self.t], jnp.float32)
        if self.aggr in ("power", "power_sum"):
            params["p"] = jnp.asarray([self.p], jnp.float32)
        if self.aggr in ("softmax_sum", "power_sum"):
            params["y"] = jnp.asarray([self.y], jnp.float32)
        if self.msg_norm:
            params["msg_norm"], _ = MsgNorm(self.learn_msg_scale).init(k1)
        enc = self._edge_encoder()
        if enc is not None:
            params["edge_encoder"], _ = enc.init(k2)
        return params, state

    def apply(self, params, state, x, g: Graph, *, train: bool = False,
              rng: Optional[Array] = None, axis_name: Optional[str] = None,
              edge_attr: Optional[Array] = None,
              edge_attr_csc: Optional[Array] = None,
              edge_emb: Optional[Array] = None,
              edge_emb_csc: Optional[Array] = None, **kw):
        """edge_attr: raw edge features (encoded here when encode_edge);
        edge_emb: pre-encoded embeddings used as-is (skips the encoder);
        edge_emb_csc: the same embeddings in sender-sorted (CSC) order — required
        by the fused-kernel backward; derived from g.edge_attr_csc when encoding
        happens here."""
        n = x.shape[0]
        enc = self._edge_encoder()
        if edge_emb is None:
            ea = edge_attr if edge_attr is not None else g.edge_attr
            # the CSC-ordered twin: explicit edge_attr needs an explicit CSC copy
            ea_csc = edge_attr_csc if edge_attr is not None else g.edge_attr_csc
            if enc is not None and ea is not None:
                edge_emb, _ = enc.apply(params["edge_encoder"], {}, ea)
                if edge_emb_csc is None and ea_csc is not None:
                    edge_emb_csc, _ = enc.apply(params["edge_encoder"], {}, ea_csc)
            elif not self.encode_edge:
                edge_emb = ea
                if edge_emb_csc is None:
                    edge_emb_csc = ea_csc

        cd = jnp.bfloat16 if self.compute_dtype == "bfloat16" else x.dtype

        t = params.get("t", self.t)
        grad_w = self.learn_t and self.aggr in ("softmax", "softmax_sum")
        if isinstance(t, jax.Array) and not grad_w:
            t = jax.lax.stop_gradient(t)
        p = params.get("p", self.p)
        if isinstance(p, jax.Array) and not self.learn_p:
            p = jax.lax.stop_gradient(p)
        y = params.get("y", self.y)
        if isinstance(y, jax.Array) and not self.learn_y:
            y = jax.lax.stop_gradient(y)

        band = edge_emb is None and band_ok(g, self.aggr)
        band_ext = (edge_emb is None and self.aggr in ("max", "min")
                    and band_extreme_ok(g))
        fused = fused_gather_ok(g, x.shape[1], self.aggr) and (
            edge_emb is None
            or (edge_emb_csc is not None and edge_emb.shape == (g.num_edges_padded,
                                                                x.shape[1])))
        if band and self.aggr in BAND_SOFTMAX_AGGRS:
            # gather-free band-dense path (locality-ordered graphs, no edge
            # embeddings): num/den are one dense-band SpMM of node tables and
            # the VJP one transposed band SpMM (ops/band.py).
            m = band_softmax_agg_auto(x.astype(cd), g.band,
                                      jnp.asarray(t, jnp.float32), self.eps,
                                      grad_w, band_interpret())
            if self.aggr == "softmax_sum":
                deg = segment_degree(g.receivers, n, g.edge_mask, dtype=jnp.float32)
                m = (jnp.power(deg, jax.nn.sigmoid(y))[:, None]).astype(m.dtype) * m
        elif band:
            # sum-family aggregators, node-factored: the message relu(x)+ε is a
            # node table, so mean/power aggregation is one band SpMM of a node
            # table plus per-node scalar work (`torch_message.py:57-85`
            # semantics, gather-free).
            msg = jax.nn.relu(x.astype(jnp.float32)) + self.eps
            deg = segment_degree(g.receivers, n, g.edge_mask, dtype=jnp.float32)
            if self.aggr in ("power", "power_sum"):
                lo, hi = 1e-7, 1e1  # reference clamps (`torch_message.py:69-73`)
                mp = jnp.power(jnp.clip(msg, lo, hi), p)
                s = band_sum_auto(mp.astype(cd), g.band,
                                  band_interpret()).astype(jnp.float32)
                m = jnp.power(jnp.clip(s / jnp.maximum(deg, 1.0)[:, None], lo, hi),
                              1.0 / p)
                if self.aggr == "power_sum":
                    m = jnp.power(deg, jax.nn.sigmoid(y))[:, None] * m
            else:  # add / sum / mean
                s = band_sum_auto(msg.astype(cd), g.band,
                                  band_interpret()).astype(jnp.float32)
                m = s / jnp.maximum(deg, 1.0)[:, None] if self.aggr == "mean" else s
            m = m.astype(cd)
        elif band_ext:
            # max/min: the message relu(x)+ε is a node table, so the extreme
            # factorizes through the masked window reduce (ops/band.band_extreme)
            # — gather-free forward, tie-splitting gather backward.
            msg = (jax.nn.relu(x.astype(jnp.float32)) + self.eps).astype(cd)
            m = band_extreme(msg, g.band, g.senders, g.receivers, g.edge_mask,
                             self.aggr)
        elif fused:
            # single-gather fused path: relu+ε message, stabilized exp, and both
            # one-hot dots happen inside one kernel pass; the backward is the CSC
            # kernel (no edge-cotangent permute, O(N) residuals). Edge-embedding
            # cotangents flow via the CSC-ordered copy only (same values).
            ee = ee_csc = None
            if edge_emb is not None:
                ee = jax.lax.stop_gradient(edge_emb.astype(cd))
                ee_csc = edge_emb_csc.astype(cd)
            m = fused_softmax_gather_agg_auto(
                x.astype(cd), g.senders, g.receivers, g.row_ptr, g.csc_senders,
                g.csc_receivers, g.csc_col_ptr, jnp.asarray(t, jnp.float32),
                ee, ee_csc, self.eps, grad_w)
            if self.aggr == "softmax_sum":
                deg = segment_degree(g.receivers, n, g.edge_mask, dtype=jnp.float32)
                m = (jnp.power(deg, jax.nn.sigmoid(y))[:, None]).astype(m.dtype) * m
        else:
            msg = gather_src_auto(x.astype(cd), g)
            if edge_emb is not None:
                msg = msg + edge_emb.astype(cd)
            # (`torch_vertex.py:78-85`)
            msg = jax.nn.relu(msg) + jnp.asarray(self.eps, cd)
            m = generalized_aggregate(
                msg, g.receivers, n, aggr=self.aggr, t=t, p=p, y=y,
                learn_t=self.learn_t, mask=g.edge_mask, row_ptr=g.row_ptr)

        m = m.astype(x.dtype)
        if self.msg_norm:
            m, _ = MsgNorm(self.learn_msg_scale).apply(params["msg_norm"], {}, x, m)

        h = x + m
        out, mlp_state = self._mlp().apply(
            params["mlp"], state.get("mlp", {}) if state else {}, h, train=train,
            rng=rng, mask=g.node_mask, axis_name=axis_name,
            compute_dtype=cd if self.compute_dtype == "bfloat16" else None)
        return out, {**(state or {}), "mlp": mlp_state}


# ---------------------------------------------------------------------------
# MRConv (`torch_vertex.py:91-103`): max-relative conv
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MRConv(Module):
    in_dim: int
    out_dim: int
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True
    aggr: str = "max"
    compute_dtype: Optional[str] = None  # "bfloat16": bf16 edge path, f32 accum

    def _nn(self) -> MLP:
        return MLP((self.in_dim * 2, self.out_dim), act=self.act, norm=self.norm,
                   bias=self.bias)

    def init(self, key):
        p, s = self._nn().init(key)
        return {"nn": p}, {"nn": s}

    def apply(self, params, state, x, g: Graph, *, train=False, rng=None,
              axis_name=None, **kw):
        cd = None if self.compute_dtype is None else jnp.dtype(self.compute_dtype)
        xe = x if cd is None else x.astype(cd)  # cast before the E-wide gathers
        if self.aggr in ("max", "min") and band_extreme_ok(g):
            # factorized: extreme_j (x_j − x_i) = (extreme_j x_j) − x_i per
            # receiver with ≥1 edge (x_i constant per segment; ties in x_j and
            # in the relative message coincide, so the tie-splitting VJP is
            # identical).  Gather-free forward via the masked window reduce.
            ext = band_extreme(xe, g.band, g.senders, g.receivers, g.edge_mask,
                               self.aggr)
            deg = (g.row_ptr[1:] - g.row_ptr[:-1]) if g.row_ptr is not None \
                else segment_degree(g.receivers, x.shape[0], g.edge_mask)
            agg = jnp.where((deg > 0)[:, None], ext - xe, 0)
        else:
            rel = gather_src_auto(xe, g) - gather_dst_auto(xe, g)
            agg = scatter(self.aggr, rel, g.receivers, x.shape[0],
                          mask=g.edge_mask, row_ptr=g.row_ptr)
        h = jnp.concatenate([xe, agg], axis=1)
        out, ns = self._nn().apply(params["nn"], state["nn"], h, train=train, rng=rng,
                                   mask=g.node_mask, axis_name=axis_name,
                                   compute_dtype=cd)
        return out, {"nn": ns}


# ---------------------------------------------------------------------------
# EdgeConv (`torch_vertex.py:106-114`, PyG EdgeConv with max aggregation)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class EdgeConv(Module):
    in_dim: int
    out_dim: int
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True
    aggr: str = "max"
    compute_dtype: Optional[str] = None  # "bfloat16": bf16 edge path, f32 accum

    def _nn(self) -> MLP:
        return MLP((self.in_dim * 2, self.out_dim), act=self.act, norm=self.norm,
                   bias=self.bias)

    def init(self, key):
        p, s = self._nn().init(key)
        return {"nn": p}, {"nn": s}

    def apply(self, params, state, x, g: Graph, *, train=False, rng=None,
              axis_name=None, **kw):
        cd = None if self.compute_dtype is None else jnp.dtype(self.compute_dtype)
        xe = x if cd is None else x.astype(cd)  # cast before the E-wide gathers
        x_i = gather_dst_auto(xe, g)
        x_j = gather_src_auto(xe, g)
        h = jnp.concatenate([x_i, x_j - x_i], axis=1)
        # NB: the MLP (incl. batch-norm over *edges*) runs per-edge, then max-aggregates
        # — same order as PyG EdgeConv(nn, 'max').
        msg, ns = self._nn().apply(params["nn"], state["nn"], h, train=train, rng=rng,
                                   mask=g.edge_mask, axis_name=axis_name,
                                   compute_dtype=cd)
        if cd is not None:
            msg = msg.astype(cd)  # keep the E-wide aggregate traffic at bf16
        out = scatter(self.aggr, msg, g.receivers, x.shape[0], mask=g.edge_mask,
                      row_ptr=g.row_ptr)
        return out.astype(jnp.float32) if cd is not None else out, {"nn": ns}


# ---------------------------------------------------------------------------
# GAT (`torch_vertex.py:117-133`; PyG 1.x GATConv: one self loop, heads concat)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class GATConv(Module):
    in_dim: int
    out_dim: int  # per-head
    heads: int = 8
    act: Optional[str] = "relu"
    norm: Optional[str] = None
    bias: bool = True
    neg_slope: float = 0.2
    # PyG GATConv(add_self_loops=...): True (PyG-1.x default, torch_vertex.py
    # GAT) adds softmax over neighbors ∪ {one analytic self term}; False
    # (the reference rev GATBlock, `eff_gcn_modules/rev/rev_layer.py:97`)
    # softmaxes over actual edges only — isolated receivers emit zeros.
    self_loops: bool = True

    def init(self, key):
        kw_, ka, kb, kn = jax.random.split(key, 4)
        h, d = self.heads, self.out_dim
        # PyG 1.x: glorot on weight [in, H*D] and att [1, H, 2D]
        bound_w = (6.0 / (self.in_dim + h * d)) ** 0.5
        params = {
            "w": jax.random.uniform(kw_, (self.in_dim, h * d), jnp.float32,
                                    -bound_w, bound_w),
            "att": jax.random.uniform(ka, (h, 2 * d), jnp.float32,
                                      -(6.0 / (2 * d + 1)) ** 0.5,
                                      (6.0 / (2 * d + 1)) ** 0.5),
        }
        state = {}
        if self.bias:
            params["b"] = jnp.zeros((h * d,))
        pa = prelu_init(self.act)
        if pa is not None:
            params["prelu"] = pa
        nrm = make_norm(self.norm, h * d)
        if nrm is not None:
            params["norm"], state["norm"] = nrm.init(kn)
        return params, state

    def apply(self, params, state, x, g: Graph, *, train=False, rng=None,
              axis_name=None, **kw):
        n = x.shape[0]
        h, d = self.heads, self.out_dim
        xt = (x @ params["w"]).reshape(n, h, d)
        a_l, a_r = params["att"][:, :d], params["att"][:, d:]
        # per-node partial scores (SDDMM decomposition: score_ij = s_i + s_j)
        s_dst = jnp.einsum("nhd,hd->nh", xt, a_l)  # α-term of the center i
        s_src = jnp.einsum("nhd,hd->nh", xt, a_r)  # α-term of the neighbor j
        # self_loops=True: explicit self edges excluded, one analytic self term
        # added (PyG-1.x "exactly one self").  self_loops=False: the edge list
        # as-is — explicit self edges are ordinary edges (PyG add_self_loops=False).
        emask = _no_self_mask(g) if self.self_loops else g.edge_mask
        self_score = jax.nn.leaky_relu(s_dst + s_src, self.neg_slope)  # [N, H]

        from ..ops.band import band_gat_dense_ok

        if band_gat_dense_ok(g):
            # dst+src scores through DENSE in-window evaluation (the score is
            # not additively separable): neighbors ∪ {one self} exactly —
            # explicit self edges in the band are cancelled analytically
            # (ops/band.band_gat_dense_agg self_count weighting).
            from ..ops.band import band_gat_dense_agg, band_interpret

            if self.self_loops:
                c_self = jax.ops.segment_sum(
                    (g.edge_mask & (g.senders == g.receivers)).astype(jnp.float32),
                    jnp.minimum(g.receivers, n - 1), n, indices_are_sorted=True)
                num, den = band_gat_dense_agg(
                    xt, s_src, s_dst, g.band, self.neg_slope,
                    self_score=self_score, self_feat=xt, self_count=c_self,
                    interpret=band_interpret())
            else:
                # softmax over actual edges only (add_self_loops=False)
                num, den = band_gat_dense_agg(
                    xt, s_src, s_dst, g.band, self.neg_slope,
                    interpret=band_interpret())
            out = (num / jnp.maximum(den, 1e-16)[..., None]).astype(x.dtype)
            out = out.reshape(n, h * d)
            if self.bias:
                out = out + params["b"]
            if self.act is not None and str(self.act).lower() != "none":
                out = activation(self.act, out, prelu=params.get("prelu"))
            nrm = make_norm(self.norm, h * d)
            new_state = dict(state)
            if nrm is not None:
                out, ns = nrm.apply(params["norm"], state["norm"], out,
                                    train=train, mask=g.node_mask,
                                    axis_name=axis_name)
                new_state["norm"] = ns
            return out, new_state

        e_score = jax.nn.leaky_relu(
            gather(s_dst, g.receivers) + gather(s_src, g.senders), self.neg_slope)

        # softmax over neighbors (∪ {self} when self_loops): combined-max stabilizer
        seg_max = jax.ops.segment_max(jnp.where(emask[:, None], e_score, -jnp.inf),
                                      g.receivers, n, indices_are_sorted=True)
        mx = jnp.where(jnp.isfinite(seg_max), seg_max, -jnp.inf)
        if self.self_loops:
            mx = jnp.maximum(mx, self_score)
        mx = jax.lax.stop_gradient(jnp.where(jnp.isfinite(mx), mx, 0.0))
        e_exp = jnp.where(emask[:, None], jnp.exp(e_score - gather(mx, g.receivers)), 0)
        denom = jax.ops.segment_sum(e_exp, g.receivers, n, indices_are_sorted=True)
        if self.self_loops:
            self_exp = jnp.exp(self_score - mx)
            denom = denom + self_exp
            alpha_self = self_exp / jnp.maximum(denom, 1e-16)
        alpha = e_exp / jnp.maximum(gather(denom, g.receivers), 1e-16)

        xt_flat = xt.reshape(n, h * d)
        msg = gather_src_auto(xt_flat, g).reshape(-1, h, d) * alpha[..., None]
        out = segment_sum(jnp.where(emask[:, None, None], msg, 0), g.receivers, n,
                          row_ptr=g.row_ptr)
        if self.self_loops:
            out = out + xt * alpha_self[..., None]
        out = out.reshape(n, h * d)
        if self.bias:
            out = out + params["b"]
        # post: act then norm (`torch_vertex.py:124-133`)
        if self.act is not None and str(self.act).lower() != "none":
            out = activation(self.act, out, prelu=params.get("prelu"))
        nrm = make_norm(self.norm, h * d)
        new_state = dict(state)
        if nrm is not None:
            out, ns = nrm.apply(params["norm"], state["norm"], out, train=train,
                                mask=g.node_mask, axis_name=axis_name)
            new_state["norm"] = ns
        return out, new_state


# ---------------------------------------------------------------------------
# GraphSAGE (`torch_vertex.py:136-205`): custom SAGE with optional relative message
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class RSAGEConv(Module):
    """Reference (R)SAGEConv: one self loop, message = (x_j [− x_i]) @ W, mean
    aggregation, update = MLP([x ‖ agg]) + b, optional L2-normalize output."""
    in_dim: int
    out_dim: int
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True
    relative: bool = False

    def _nn(self) -> MLP:
        return MLP((self.out_dim + self.in_dim, self.out_dim), act=self.act,
                   norm=self.norm, bias=self.bias)

    def init(self, key):
        kw_, kb, kn = jax.random.split(key, 3)
        # PyG 1.x SAGEConv: uniform(weight) w/ glorot-ish bound 1/sqrt(in)
        bound = 1.0 / (self.in_dim ** 0.5)
        params = {"w": jax.random.uniform(kw_, (self.in_dim, self.out_dim), jnp.float32,
                                          -bound, bound)}
        if self.bias:
            params["b"] = jnp.zeros((self.out_dim,))
        params["nn"], nstate = self._nn().init(kn)
        return params, {"nn": nstate}

    def apply(self, params, state, x, g: Graph, *, train=False, rng=None,
              axis_name=None, **kw):
        n = x.shape[0]
        emask = _no_self_mask(g)
        if band_sum_ok(g):
            # gather-free band route (ops/band.py). The band covers ALL valid
            # edges; SAGE excludes self loops, so subtract their closed-form
            # contribution: relative messages vanish on self edges
            # (x_i − x_i = 0 ⇒ Σ_noself (x_j−x_i) = A@x − deg_all·x), and for
            # plain messages each self edge contributes xt_i (count c_self).
            if self.relative:
                deg_all = segment_degree(g.receivers, n, mask=g.edge_mask)
                s = (band_sum_auto(x, g.band, band_interpret())
                     - deg_all[:, None] * x) @ params["w"]
            else:
                xt = x @ params["w"]
                c_self = segment_degree(g.receivers, n,
                                        mask=g.edge_mask & (g.senders == g.receivers))
                s = (band_sum_auto(xt, g.band, band_interpret())
                     - c_self[:, None] * xt) + xt
        else:
            if self.relative:
                rel = gather_src_auto(x, g) - gather_dst_auto(x, g)
                msg = rel @ params["w"]
                self_msg = jnp.zeros((n, self.out_dim), msg.dtype)
            else:
                msg = gather_src_auto(x, g) @ params["w"]
                self_msg = x @ params["w"]
            # mean over neighbors ∪ {self}
            s = segment_sum(msg, g.receivers, n, mask=emask,
                            row_ptr=g.row_ptr) + self_msg
        cnt = segment_degree(g.receivers, n, mask=emask) + 1.0
        agg = s / cnt[:, None]
        h = jnp.concatenate([x, agg], axis=1)
        out, ns = self._nn().apply(params["nn"], state.get("nn", {}), h,
                                   train=train, rng=rng, mask=g.node_mask,
                                   axis_name=axis_name)
        if self.bias:
            out = out + params["b"]
        if self.norm is not None and str(self.norm).lower() != "none":
            out = out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        return out, {"nn": ns}


# ---------------------------------------------------------------------------
# SemiGCNConv (`torch_vertex.py:208-225`; Kipf GCN + act/norm post)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SemiGCNConv(Module):
    in_dim: int
    out_dim: int
    act: Optional[str] = "relu"
    norm: Optional[str] = None
    bias: bool = True

    def init(self, key):
        kw_, kn = jax.random.split(key)
        bound = (6.0 / (self.in_dim + self.out_dim)) ** 0.5  # glorot
        params = {"w": jax.random.uniform(kw_, (self.in_dim, self.out_dim), jnp.float32,
                                          -bound, bound)}
        if self.bias:
            params["b"] = jnp.zeros((self.out_dim,))
        pa = prelu_init(self.act)
        if pa is not None:
            params["prelu"] = pa
        state = {}
        nrm = make_norm(self.norm, self.out_dim)
        if nrm is not None:
            params["norm"], state["norm"] = nrm.init(kn)
        return params, state

    def apply(self, params, state, x, g: Graph, *, train=False, rng=None,
              axis_name=None, **kw):
        n = x.shape[0]
        xt = x @ params["w"]
        # GCN sym-norm with remaining-self-loops semantics: nodes lacking a self edge
        # get one; degree counts neighbors + the (possibly added) self loop.
        emask = g.edge_mask
        is_self = emask & (g.senders == g.receivers)
        has_self = segment_degree(g.receivers, n, mask=is_self)
        deg = segment_degree(g.receivers, n, mask=emask) + (1.0 - jnp.minimum(has_self, 1.0))
        dinv = jax.lax.rsqrt(jnp.maximum(deg, 1.0))
        if band_sum_ok(g):
            # sym-norm factorizes per node: Σ_j dinv_i·dinv_j·xt_j =
            # dinv_i · (A @ (dinv·xt)) — one gather-free band SpMM (ops/band.py)
            out = dinv[:, None] * band_sum_auto(dinv[:, None] * xt, g.band,
                                                band_interpret())
        else:
            coef = gather(dinv, g.receivers) * gather(dinv, g.senders)
            msg = gather_src_auto(xt, g) * coef[:, None]
            out = segment_sum(msg, g.receivers, n, mask=emask, row_ptr=g.row_ptr)
        # analytic self-loop term only for nodes without an explicit self edge
        out = out + xt * ((1.0 - jnp.minimum(has_self, 1.0)) * dinv * dinv)[:, None]
        if self.bias:
            out = out + params["b"]
        if self.act is not None and str(self.act).lower() != "none":
            out = activation(self.act, out, prelu=params.get("prelu"))
        nrm = make_norm(self.norm, self.out_dim)
        new_state = dict(state)
        if nrm is not None:
            out, ns = nrm.apply(params["norm"], state["norm"], out, train=train,
                                mask=g.node_mask, axis_name=axis_name)
            new_state["norm"] = ns
        return out, new_state


# ---------------------------------------------------------------------------
# GIN (`torch_vertex.py:228-236`)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class GINConv(Module):
    in_dim: int
    out_dim: int
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True
    eps: float = 0.0

    def _nn(self) -> MLP:
        return MLP((self.in_dim, self.out_dim), act=self.act, norm=self.norm,
                   bias=self.bias)

    def init(self, key):
        p, s = self._nn().init(key)
        return {"nn": p}, {"nn": s}

    def apply(self, params, state, x, g: Graph, *, train=False, rng=None,
              axis_name=None, **kw):
        if band_sum_ok(g):
            # gather-free: GIN's neighbor sum is exactly A @ x (ops/band.py)
            agg = band_sum_auto(x, g.band, band_interpret())
        else:
            agg = segment_sum(gather_src_auto(x, g), g.receivers, x.shape[0],
                              mask=g.edge_mask, row_ptr=g.row_ptr)
        h = (1.0 + self.eps) * x + agg
        out, ns = self._nn().apply(params["nn"], state["nn"], h, train=train, rng=rng,
                                   mask=g.node_mask, axis_name=axis_name)
        return out, {"nn": ns}


# ---------------------------------------------------------------------------
# dispatcher + dynamic conv + blocks (`torch_vertex.py:239-352`)
# ---------------------------------------------------------------------------

def graph_conv(in_dim: int, out_dim: int, conv: str = "edge", act: str = "relu",
               norm: Optional[str] = None, bias: bool = True, heads: int = 8,
               compute_dtype: Optional[str] = None) -> Module:
    c = conv.lower()
    if c == "edge":
        return EdgeConv(in_dim, out_dim, act, norm, bias,
                        compute_dtype=compute_dtype)
    if c == "mr":
        return MRConv(in_dim, out_dim, act, norm, bias,
                      compute_dtype=compute_dtype)
    if c == "gat":
        return GATConv(in_dim, out_dim // heads, heads, act, norm, bias)
    if c == "gcn":
        return SemiGCNConv(in_dim, out_dim, act, norm, bias)
    if c == "gin":
        return GINConv(in_dim, out_dim, act, norm, bias)
    if c == "sage":
        return RSAGEConv(in_dim, out_dim, act, norm, bias, relative=False)
    if c == "rsage":
        return RSAGEConv(in_dim, out_dim, act, norm, bias, relative=True)
    raise NotImplementedError(f"conv {conv} is not implemented")


@dataclass(frozen=True)
class DynConv(Module):
    """GraphConv on a per-forward dilated-kNN graph (`torch_vertex.py:267-281`).

    Requires equally-sized graphs stacked flat (points per cloud static)."""
    in_dim: int
    out_dim: int
    kernel_size: int = 9
    dilation: int = 1
    conv: str = "edge"
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True
    heads: int = 8
    stochastic: bool = False
    epsilon: float = 0.0
    num_points: int = 1024  # nodes per graph (static)
    knn_method: str = "exact"  # "approx" = subsample + PartialReduce (ops/knn.py)
    compute_dtype: Optional[str] = None

    def _conv(self) -> Module:
        return graph_conv(self.in_dim, self.out_dim, self.conv, self.act, self.norm,
                          self.bias, self.heads, compute_dtype=self.compute_dtype)

    def init(self, key):
        return self._conv().init(key)

    def apply(self, params, state, x, g: Optional[Graph] = None, *, train=False,
              rng=None, axis_name=None, **kw):
        if g is None:
            krng = None if rng is None else jax.random.fold_in(rng, 17)
            senders, receivers = dilated_knn_graph_flat(
                x, self.kernel_size, self.dilation,
                num_nodes_per_graph=self.num_points, stochastic=self.stochastic,
                epsilon=self.epsilon, train=train, rng=krng,
                method=self.knn_method)
            n = x.shape[0]
            g = Graph(
                x=None, senders=senders, receivers=receivers, edge_attr=None,
                node_mask=jnp.ones((n,), bool),
                edge_mask=jnp.ones(senders.shape, bool),
                n_node=jnp.int32(n), n_edge=jnp.int32(senders.shape[0]))
        return self._conv().apply(params, state, x, g, train=train, rng=rng,
                                  axis_name=axis_name)


def _block(body: Module, kind: str, res_scale: float = 1.0):
    """plain / res / dense wrapper (`torch_vertex.py:284-352`)."""

    @dataclass(frozen=True)
    class _Block(Module):
        def init(self, key):
            return body.init(key)

        def apply(self, params, state, x, g=None, **kw):
            y, ns = body.apply(params, state, x, g, **kw)
            if kind == "res":
                return y + x * res_scale, ns
            if kind == "dense":
                return jnp.concatenate([x, y], axis=1), ns
            return y, ns

    return _Block()


def PlainDynBlock(channels, kernel_size=9, dilation=1, conv="edge", act="relu",
                  norm=None, bias=True, num_points=1024, **kw):
    return _block(DynConv(channels, channels, kernel_size, dilation, conv, act, norm,
                          bias, num_points=num_points, **kw), "plain")


def ResDynBlock(channels, kernel_size=9, dilation=1, conv="edge", act="relu",
                norm=None, bias=True, res_scale=1.0, num_points=1024, **kw):
    return _block(DynConv(channels, channels, kernel_size, dilation, conv, act, norm,
                          bias, num_points=num_points, **kw), "res", res_scale)


def DenseDynBlock(in_channels, out_channels=64, kernel_size=9, dilation=1, conv="edge",
                  act="relu", norm=None, bias=True, num_points=1024, **kw):
    return _block(DynConv(in_channels, out_channels, kernel_size, dilation, conv, act,
                          norm, bias, num_points=num_points, **kw), "dense")


def ResGraphBlock(channels, conv="edge", act="relu", norm=None, bias=True, heads=8,
                  res_scale=1.0, compute_dtype=None):
    return _block(graph_conv(channels, channels, conv, act, norm, bias, heads,
                             compute_dtype=compute_dtype),
                  "res", res_scale)


def DenseGraphBlock(in_channels, out_channels, conv="edge", act="relu", norm=None,
                    bias=True, heads=8, compute_dtype=None):
    return _block(graph_conv(in_channels, out_channels, conv, act, norm, bias, heads,
                             compute_dtype=compute_dtype),
                  "dense")
