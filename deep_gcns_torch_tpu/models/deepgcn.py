"""DeepGCN model family (ICCV'19 / TPAMI'21): static-graph PPI variant, sparse
dynamic-kNN segmentation variant, dense point-cloud segmentation variant and the
ModelNet40 classifier.

Rebuilt from (cited for parity, not copied):
  * `examples/ppi/architecture.py:6-55`      — DeepGCN (static graph, multi-scale
    fusion: cat block outputs → MLP(…,1024) → max over CHANNELS → prediction MLPs)
  * `examples/sem_seg_sparse/architecture.py:9-70` — SparseDeepGCN (dynamic dilated
    kNN per block, fusion via per-graph scatter-max broadcast)
  * `examples/sem_seg_dense/architecture.py:7-56`  — DenseDeepGCN (B×N×C layout,
    kNN on xyz only, fusion 1024 + spatial max-pool broadcast)
  * `examples/modelnet_cls/architecture.py:11-81`  — classifier (max+avg pool head)

All use the reference's `model_init`: kaiming-normal weights, zero biases.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..convs import dense as cd
from ..convs import sparse as cs
from ..graph import Graph
from ..nn.core import MLP, Module, dropout, kaiming_reinit
from ..ops.knn import dilated_knn_graph_dense
from ..ops.segment import scatter

Array = jax.Array


@dataclass(frozen=True)
class DeepGCNConfig:
    in_channels: int
    n_classes: int
    n_filters: int = 64
    n_blocks: int = 14
    conv: str = "mr"
    act: str = "relu"
    norm: str = "batch"
    bias: bool = True
    heads: int = 1
    block: str = "res"           # res | dense | plain
    dropout: float = 0.2
    k: int = 9                   # kNN neighbors (dynamic variants)
    use_dilation: bool = True
    stochastic: bool = False
    epsilon: float = 0.2
    num_points: int = 1024       # points per cloud (dynamic sparse variant)
    emb_dims: int = 1024         # fusion dims (cls variant)
    knn_method: str = "exact"    # "approx" = TPU PartialReduce path (ops/knn.py)
    compute_dtype: Optional[str] = None  # "bfloat16": bf16 conv compute, f32 accum


def _fusion_dims(cfg: DeepGCNConfig) -> int:
    ch, n = cfg.n_filters, cfg.n_blocks
    if cfg.block.lower() == "dense":
        return int((ch + ch + ch * (n - 1)) * n // 2)
    return int(ch * n)  # res/plain: head + (n-1) blocks, all ch wide


# ---------------------------------------------------------------------------
# PPI: static-graph DeepGCN (`examples/ppi/architecture.py`)
# ---------------------------------------------------------------------------

class DeepGCNStatic(Module):
    def __init__(self, cfg: DeepGCNConfig):
        self.cfg = cfg
        c = cfg
        ch = c.n_filters
        self._head = cs.graph_conv(c.in_channels, ch, c.conv, c.act, c.norm, c.bias,
                                   c.heads, compute_dtype=c.compute_dtype)
        res_scale = 1.0 if c.block.lower() == "res" else 0.0
        self._blocks = []
        for i in range(c.n_blocks - 1):
            if c.block.lower() == "dense":
                self._blocks.append(cs.DenseGraphBlock(
                    ch + i * ch, ch, c.conv, c.act, c.norm, c.bias, c.heads,
                    compute_dtype=c.compute_dtype))
            else:
                self._blocks.append(cs.ResGraphBlock(
                    ch, c.conv, c.act, c.norm, c.bias, c.heads, res_scale,
                    compute_dtype=c.compute_dtype))
        fd = _fusion_dims(c)
        self._fusion = MLP((fd, 1024), c.act, None, c.bias)
        self._pred = [MLP((1 + fd, 512), c.act, c.norm, c.bias),
                      MLP((512, 256), c.act, c.norm, c.bias),
                      MLP((256, c.n_classes), None, None, c.bias)]

    def init(self, key):
        ks = jax.random.split(key, len(self._blocks) + 5)
        params, state = {}, {}
        params["head"], state["head"] = self._head.init(ks[0])
        bp, bs = [], []
        for i, blk in enumerate(self._blocks):
            p, s = blk.init(ks[1 + i])
            bp.append(p)
            bs.append(s)
        params["blocks"], state["blocks"] = bp, bs
        params["fusion"], state["fusion"] = self._fusion.init(ks[-3])
        pp, ps = [], []
        for i, m in enumerate(self._pred):
            p, s = m.init(jax.random.fold_in(ks[-2], i))
            pp.append(p)
            ps.append(s)
        params["pred"], state["pred"] = pp, ps
        params = kaiming_reinit(params, ks[-1])
        return params, state

    def apply(self, params, state, x, g: Graph, *, train=False, rng=None,
              axis_name=None, **kw):
        c = self.cfg
        new_state = {}
        kwargs = dict(train=train, axis_name=axis_name)
        h, new_state["head"] = self._head.apply(params["head"], state["head"], x, g,
                                                rng=rng, **kwargs)
        feats = [h]
        bs_out = []
        for i, blk in enumerate(self._blocks):
            r = None if rng is None else jax.random.fold_in(rng, i)
            h, s = blk.apply(params["blocks"][i], state["blocks"][i], feats[-1], g,
                             rng=r, **kwargs)
            # dense blocks return the concatenation; the next input is that full cat,
            # but the collected per-scale features are the raw cat (= feats[-1]+new)
            feats.append(h)
            bs_out.append(s)
        new_state["blocks"] = bs_out
        # reference cats ALL feats entries (for dense blocks these are cumulative
        # concatenations — the double counting is intentional, fusion_dims math)
        cat = jnp.concatenate(feats, axis=1)
        fus, new_state["fusion"] = self._fusion.apply(
            params["fusion"], state["fusion"], cat, rng=rng, mask=g.node_mask,
            **kwargs)
        # reference: max over the 1024 CHANNELS per node → [N, 1] (`ppi/architecture.py:53`)
        fus = jnp.max(fus, axis=1, keepdims=True)
        h = jnp.concatenate([cat, fus], axis=1)
        ps_out = []
        for i, m in enumerate(self._pred):
            r = None if rng is None else jax.random.fold_in(rng, 100 + i)
            h, s = m.apply(params["pred"][i], state["pred"][i], h, rng=r,
                           mask=g.node_mask, **kwargs)
            ps_out.append(s)
            if i < 2:  # dropout between prediction MLPs (`ppi/architecture.py:33-35`)
                h = dropout(h, c.dropout, train=train,
                            rng=None if r is None else jax.random.fold_in(r, 7))
        new_state["pred"] = ps_out
        return h, new_state


# ---------------------------------------------------------------------------
# sem_seg_sparse: SparseDeepGCN (`examples/sem_seg_sparse/architecture.py`)
# ---------------------------------------------------------------------------

class SparseDeepGCN(Module):
    def __init__(self, cfg: DeepGCNConfig):
        self.cfg = cfg
        c = cfg
        ch = c.n_filters
        self._head = cs.graph_conv(c.in_channels, ch, c.conv, c.act, c.norm, c.bias,
                                   compute_dtype=c.compute_dtype)
        self._blocks = []
        for i in range(c.n_blocks - 1):
            dil = 1 + i if c.block.lower() in ("res", "dense") else 1
            if c.block.lower() == "dense":
                self._blocks.append(cs.DenseDynBlock(
                    ch + ch * i, ch, c.k, dil, c.conv, c.act, c.norm, c.bias,
                    num_points=c.num_points, stochastic=c.stochastic,
                    epsilon=c.epsilon, knn_method=c.knn_method,
                    compute_dtype=c.compute_dtype))
            elif c.block.lower() == "res":
                self._blocks.append(cs.ResDynBlock(
                    ch, c.k, dil, c.conv, c.act, c.norm, c.bias,
                    num_points=c.num_points, stochastic=c.stochastic,
                    epsilon=c.epsilon, knn_method=c.knn_method,
                    compute_dtype=c.compute_dtype))
            else:
                self._blocks.append(cs.PlainDynBlock(
                    ch, c.k, 1, c.conv, c.act, c.norm, c.bias,
                    num_points=c.num_points, knn_method=c.knn_method,
                    compute_dtype=c.compute_dtype))
        fd = _fusion_dims(c)
        self._fusion = MLP((fd, 1024), c.act, c.norm, c.bias)
        self._pred = [MLP((fd + 1024, 512), c.act, c.norm, c.bias),
                      MLP((512, 256), c.act, c.norm, c.bias, drop=c.dropout),
                      MLP((256, c.n_classes), None, None, c.bias)]

    def init(self, key):
        ks = jax.random.split(key, 4)
        params, state = {}, {}
        params["head"], state["head"] = self._head.init(ks[0])
        bp, bs = [], []
        for i, blk in enumerate(self._blocks):
            p, s = blk.init(jax.random.fold_in(ks[1], i))
            bp.append(p)
            bs.append(s)
        params["blocks"], state["blocks"] = bp, bs
        params["fusion"], state["fusion"] = self._fusion.init(ks[2])
        pp, ps = [], []
        for i, m in enumerate(self._pred):
            p, s = m.init(jax.random.fold_in(ks[3], i))
            pp.append(p)
            ps.append(s)
        params["pred"], state["pred"] = pp, ps
        params = kaiming_reinit(params, jax.random.fold_in(key, 99))
        return params, state

    def apply(self, params, state, x, g: Graph, *, train=False, rng=None,
              axis_name=None, **kw):
        """x = cat(pos, color) [B·n, C]; the head's kNN graph is built on xyz
        (`sem_seg_sparse/architecture.py:63`); g supplies that static head graph or
        None to compute it here."""
        c = self.cfg
        from ..ops.knn import dilated_knn_graph_flat

        new_state = {}
        kwargs = dict(train=train, axis_name=axis_name)
        if g is None:
            senders, receivers = dilated_knn_graph_flat(
                x[:, 0:3], c.k, 1, num_nodes_per_graph=c.num_points,
                method=c.knn_method)
            n = x.shape[0]
            g = Graph(x=None, senders=senders, receivers=receivers, edge_attr=None,
                      node_mask=jnp.ones((n,), bool),
                      edge_mask=jnp.ones(senders.shape, bool),
                      n_node=jnp.int32(n), n_edge=jnp.int32(senders.shape[0]))
        h, new_state["head"] = self._head.apply(params["head"], state["head"], x, g,
                                                rng=rng, **kwargs)
        feats = [h]
        bs_out = []
        for i, blk in enumerate(self._blocks):
            r = None if rng is None else jax.random.fold_in(rng, i)
            h, s = blk.apply(params["blocks"][i], state["blocks"][i], feats[-1],
                             None, rng=r, **kwargs)
            feats.append(h)
            bs_out.append(s)
        new_state["blocks"] = bs_out
        cat = jnp.concatenate(feats, 1)
        fus, new_state["fusion"] = self._fusion.apply(
            params["fusion"], state["fusion"], cat, rng=rng, mask=g.node_mask,
            **kwargs)
        # per-graph max then broadcast (`sem_seg_sparse/architecture.py:68-69`)
        n = cat.shape[0]
        batch = (jnp.arange(n) // c.num_points).astype(jnp.int32)
        nb = n // c.num_points
        gmax = scatter("max", fus, batch, nb)
        fus = jnp.repeat(gmax, c.num_points, axis=0, total_repeat_length=n)
        h = jnp.concatenate([fus, cat], axis=1)
        ps_out = []
        for i, m in enumerate(self._pred):
            r = None if rng is None else jax.random.fold_in(rng, 100 + i)
            h, s = m.apply(params["pred"][i], state["pred"][i], h, rng=r,
                           mask=g.node_mask, **kwargs)
            ps_out.append(s)
        new_state["pred"] = ps_out
        return h, new_state


# ---------------------------------------------------------------------------
# sem_seg_dense: DenseDeepGCN (`examples/sem_seg_dense/architecture.py`)
# ---------------------------------------------------------------------------

class DenseDeepGCN(Module):
    def __init__(self, cfg: DeepGCNConfig):
        self.cfg = cfg
        c = cfg
        ch = c.n_filters
        self._head = cd.graph_conv2d(c.in_channels, ch, c.conv, c.act, c.norm, c.bias,
                                     compute_dtype=c.compute_dtype)
        self._blocks = []
        for i in range(c.n_blocks - 1):
            if c.block.lower() == "dense":
                self._blocks.append(cd.DenseDynBlock2d(ch + ch * i, ch, c.k, 1 + i,
                                                       c.conv, c.act, c.norm, c.bias,
                                                       c.stochastic, c.epsilon,
                                                       knn_method=c.knn_method,
                                                       compute_dtype=c.compute_dtype))
            elif c.block.lower() == "res":
                self._blocks.append(cd.ResDynBlock2d(ch, c.k, 1 + i, c.conv, c.act,
                                                     c.norm, c.bias, c.stochastic,
                                                     c.epsilon,
                                                     knn_method=c.knn_method,
                                                       compute_dtype=c.compute_dtype))
            else:
                self._blocks.append(cd.PlainDynBlock2d(ch, c.k, 1, c.conv, c.act,
                                                       c.norm, c.bias,
                                                       knn_method=c.knn_method,
                                                       compute_dtype=c.compute_dtype))
        fd = _fusion_dims(c)
        self._fusion = cd.BasicConv((fd, 1024), c.act, c.norm, c.bias)
        self._pred = [cd.BasicConv((fd + 1024, 512), c.act, c.norm, c.bias),
                      cd.BasicConv((512, 256), c.act, c.norm, c.bias),
                      cd.BasicConv((256, c.n_classes), None, None, c.bias)]
        self._pred_drop_after = 1  # Dropout sits after the 256 conv (`:43-46`)

    def init(self, key):
        ks = jax.random.split(key, 4)
        params, state = {}, {}
        params["head"], state["head"] = self._head.init(ks[0])
        bp, bs = [], []
        for i, blk in enumerate(self._blocks):
            p, s = blk.init(jax.random.fold_in(ks[1], i))
            bp.append(p)
            bs.append(s)
        params["blocks"], state["blocks"] = bp, bs
        params["fusion"], state["fusion"] = self._fusion.init(ks[2])
        pp, ps = [], []
        for i, m in enumerate(self._pred):
            p, s = m.init(jax.random.fold_in(ks[3], i))
            pp.append(p)
            ps.append(s)
        params["pred"], state["pred"] = pp, ps
        return params, state

    def apply(self, params, state, x, edge_index=None, *, train=False, rng=None,
              axis_name=None, **kw):
        """x: [B, N, C] channels-last (reference uses B×C×N×1); kNN on xyz = x[..., :3]."""
        c = self.cfg
        new_state = {}
        kwargs = dict(train=train, axis_name=axis_name)
        if edge_index is None:
            krng = None if rng is None else jax.random.fold_in(rng, 31)
            edge_index = dilated_knn_graph_dense(x[..., 0:3], c.k, 1,
                                                 stochastic=c.stochastic,
                                                 epsilon=c.epsilon, train=train,
                                                 rng=krng, method=c.knn_method)
        h, new_state["head"] = self._head.apply(params["head"], state["head"], x,
                                                edge_index, rng=rng, **kwargs)
        feats = [h]
        bs_out = []
        for i, blk in enumerate(self._blocks):
            r = None if rng is None else jax.random.fold_in(rng, i)
            h, s = blk.apply(params["blocks"][i], state["blocks"][i], feats[-1],
                             None, rng=r, **kwargs)
            feats.append(h)
            bs_out.append(s)
        new_state["blocks"] = bs_out
        cat = jnp.concatenate(feats, -1)
        fus4 = cat[:, :, None, :]  # [B, N, 1, C] for BasicConv
        fus, new_state["fusion"] = self._fusion.apply(
            params["fusion"], state["fusion"], fus4, rng=rng, **kwargs)
        # global max over points, broadcast back (`sem_seg_dense/architecture.py:54-55`)
        gmax = jnp.max(fus, axis=1, keepdims=True)
        fus = jnp.broadcast_to(gmax, fus.shape[:1] + (cat.shape[1],) + gmax.shape[2:])
        h = jnp.concatenate([fus, fus4], axis=-1)
        ps_out = []
        for i, m in enumerate(self._pred):
            r = None if rng is None else jax.random.fold_in(rng, 100 + i)
            h, s = m.apply(params["pred"][i], state["pred"][i], h, rng=r, **kwargs)
            ps_out.append(s)
            if i == self._pred_drop_after:
                h = dropout(h, c.dropout, train=train,
                            rng=None if r is None else jax.random.fold_in(r, 7))
        new_state["pred"] = ps_out
        return h[:, :, 0, :], new_state  # [B, N, n_classes]


# ---------------------------------------------------------------------------
# modelnet_cls: DeepGCN classifier (`examples/modelnet_cls/architecture.py`)
# ---------------------------------------------------------------------------

class DeepGCNCls(Module):
    def __init__(self, cfg: DeepGCNConfig):
        self.cfg = cfg
        c = cfg
        ch = c.n_filters
        self._head = cd.graph_conv2d(c.in_channels, ch, c.conv, c.act, c.norm,
                                     bias=False, compute_dtype=c.compute_dtype)
        self._blocks = []
        for i in range(c.n_blocks - 1):
            if c.block.lower() == "dense":
                self._blocks.append(cd.DenseDynBlock2d(ch + ch * i, ch, c.k, 1 + i,
                                                       c.conv, c.act, c.norm, c.bias,
                                                       c.stochastic, c.epsilon,
                                                       knn_method=c.knn_method,
                                                       compute_dtype=c.compute_dtype))
            elif c.block.lower() == "res":
                dil = (1 + i) if c.use_dilation else 1
                self._blocks.append(cd.ResDynBlock2d(ch, c.k, dil, c.conv, c.act,
                                                     c.norm, c.bias, c.stochastic,
                                                     c.epsilon,
                                                     knn_method=c.knn_method,
                                                       compute_dtype=c.compute_dtype))
            else:
                self._blocks.append(cd.PlainDynBlock2d(ch, c.k, 1, c.conv, c.act,
                                                       c.norm, c.bias,
                                                       knn_method=c.knn_method,
                                                       compute_dtype=c.compute_dtype))
        fd = _fusion_dims(c)
        self._fusion = cd.BasicConv((fd, c.emb_dims), "leakyrelu", c.norm, bias=False)
        self._pred = [cd.BasicConv((c.emb_dims * 2, 512), "leakyrelu", c.norm,
                                   drop=c.dropout),
                      cd.BasicConv((512, 256), "leakyrelu", c.norm, drop=c.dropout),
                      cd.BasicConv((256, c.n_classes), None, None)]

    def init(self, key):
        ks = jax.random.split(key, 4)
        params, state = {}, {}
        params["head"], state["head"] = self._head.init(ks[0])
        bp, bs = [], []
        for i, blk in enumerate(self._blocks):
            p, s = blk.init(jax.random.fold_in(ks[1], i))
            bp.append(p)
            bs.append(s)
        params["blocks"], state["blocks"] = bp, bs
        params["fusion"], state["fusion"] = self._fusion.init(ks[2])
        pp, ps = [], []
        for i, m in enumerate(self._pred):
            p, s = m.init(jax.random.fold_in(ks[3], i))
            pp.append(p)
            ps.append(s)
        params["pred"], state["pred"] = pp, ps
        return params, state

    def apply(self, params, state, x, *, train=False, rng=None, axis_name=None, **kw):
        """x: [B, N, 3] point cloud → [B, n_classes] logits."""
        c = self.cfg
        new_state = {}
        kwargs = dict(train=train, axis_name=axis_name)
        krng = None if rng is None else jax.random.fold_in(rng, 31)
        edge_index = dilated_knn_graph_dense(x[..., 0:3], c.k, 1,
                                             stochastic=c.stochastic,
                                             epsilon=c.epsilon, train=train, rng=krng,
                                             method=c.knn_method)
        h, new_state["head"] = self._head.apply(params["head"], state["head"], x,
                                                edge_index, rng=rng, **kwargs)
        feats = [h]
        bs_out = []
        for i, blk in enumerate(self._blocks):
            r = None if rng is None else jax.random.fold_in(rng, i)
            h, s = blk.apply(params["blocks"][i], state["blocks"][i], feats[-1],
                             None, rng=r, **kwargs)
            feats.append(h)
            bs_out.append(s)
        new_state["blocks"] = bs_out
        cat = jnp.concatenate(feats, -1)
        fus, new_state["fusion"] = self._fusion.apply(
            params["fusion"], state["fusion"], cat[:, :, None, :], rng=rng, **kwargs)
        x1 = jnp.max(fus, axis=(1, 2))   # adaptive max pool (`modelnet:79`)
        x2 = jnp.mean(fus, axis=(1, 2))  # adaptive avg pool (`:80`)
        h = jnp.concatenate([x1, x2], axis=-1)[:, None, None, :]
        ps_out = []
        for i, m in enumerate(self._pred):
            r = None if rng is None else jax.random.fold_in(rng, 100 + i)
            h, s = m.apply(params["pred"][i], state["pred"][i], h, rng=r, **kwargs)
            ps_out.append(s)
        new_state["pred"] = ps_out
        return h[:, 0, 0, :], new_state
