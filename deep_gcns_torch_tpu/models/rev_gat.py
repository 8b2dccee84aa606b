"""RevGAT — reversible GAT for ogbn-arxiv (DGL example family).

Rebuild of `examples/ogb_eff/ogbn_arxiv_dgl/model_rev.py:257-365`:
  * first & last layers: plain SymGATConv with residual;
  * middle layers: GroupAdditiveCoupling of RevGATBlocks (BN→relu→shared-dropout→
    GATConv) run through the O(1)-memory reversible scan;
  * one shared dropout mask per forward, one edge-drop keep-mask per layer
    (replicated across groups, `model_rev.py:343-357`);
  * head: norm → act → dropout → last conv → mean over heads → bias
    (`:358-365`).

Deviation (documented): the reference's in-block BatchNorm keeps running stats that
get multiply-updated by the reversible recompute; since arxiv is trained and
evaluated FULL-BATCH on the same node set, this implementation uses current-batch
statistics in both modes ("batch-stats norm"), which is state-free — required for
exact reversibility — and statistically equivalent here.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..convs.dgl_gat import SymGATConv
from ..graph import Graph
from ..nn.core import Module, dropout, shared_dropout_mask
from ..rev.coupling import GroupAdditiveCoupling
from ..rev.invertible import make_reversible_scan

Array = jax.Array


def _batch_stats_norm(params, x, mask, eps=1e-5):
    """Affine normalization by current-batch column statistics over valid rows."""
    m = mask[:, None].astype(x.dtype)
    cnt = jnp.maximum(jnp.sum(m), 1.0)
    mu = jnp.sum(x * m, axis=0) / cnt
    var = jnp.sum(jnp.square(x - mu) * m, axis=0) / cnt
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * params["scale"] + params["bias"]


@dataclass(frozen=True)
class RevGATBlock(Module):
    """norm → relu → shared-dropout → SymGATConv, flattened heads
    (`model_rev.py:197-254`)."""
    in_dim: int
    out_dim: int
    n_heads: int = 1
    edge_drop: float = 0.0
    use_attn_dst: bool = True
    use_symmetric_norm: bool = False
    compute_dtype: str = "float32"
    stabilizer: str = "auto"

    def _conv(self):
        return SymGATConv(self.in_dim, self.out_dim, self.n_heads,
                          edge_drop=self.edge_drop, use_attn_dst=self.use_attn_dst,
                          residual=True, use_symmetric_norm=self.use_symmetric_norm,
                          compute_dtype=self.compute_dtype,
                          stabilizer=self.stabilizer)

    def init(self, key):
        k0, k1 = jax.random.split(key)
        cp, _ = self._conv().init(k0)
        return {"norm": {"scale": jnp.ones((self.in_dim,)),
                         "bias": jnp.zeros((self.in_dim,))},
                "conv": cp}, {}

    def apply(self, params, state, x, g: Graph, *, chunk_args: Tuple = (),
              train: bool = False, **kw):
        dropout_mask = chunk_args[0] if len(chunk_args) > 0 else None
        dk = chunk_args[1] if len(chunk_args) > 1 else None
        keep_mask = drop_key = None
        if dk is not None:
            dk = dk[:, 0] if dk.ndim > 1 else dk
            if jnp.issubdtype(dk.dtype, jnp.integer):
                drop_key = dk            # [2] int32 hash key (band-servable)
            else:
                keep_mask = dk           # legacy [E] float keep mask
        h = _batch_stats_norm(params["norm"], x, g.node_mask)
        h = jax.nn.relu(h)
        if train and dropout_mask is not None:
            h = h * dropout_mask
        out, _ = self._conv().apply(params["conv"], {}, h, g, train=train,
                                    keep_mask=keep_mask, drop_key=drop_key)
        return out.reshape(out.shape[0], -1), state


@dataclass(frozen=True)
class RevGATConfig:
    in_feats: int
    n_classes: int = 40
    n_hidden: int = 256
    n_layers: int = 5
    n_heads: int = 3
    group: int = 2
    dropout: float = 0.75
    input_drop: float = 0.25
    edge_drop: float = 0.3
    use_attn_dst: bool = False
    use_symmetric_norm: bool = True
    compute_dtype: str = "float32"
    # "per_receiver" routes the band GAT through the exact per-receiver
    # stabilizer (ops/gat_dense.py) — required when sym-norm depth amplifies
    # attention-score outliers past the global-shift envelope
    # (convs/dgl_gat.DEN_TINY note); "auto" keeps the fastest legal route.
    stabilizer: str = "auto"


class RevGAT(Module):
    def __init__(self, cfg: RevGATConfig):
        self.cfg = cfg
        c = cfg
        hid = c.n_heads * c.n_hidden
        assert hid % c.group == 0
        self._first = SymGATConv(c.in_feats, c.n_hidden, c.n_heads,
                                 edge_drop=c.edge_drop, use_attn_dst=c.use_attn_dst,
                                 residual=True,
                                 use_symmetric_norm=c.use_symmetric_norm,
                                 compute_dtype=c.compute_dtype,
                                 stabilizer=c.stabilizer)
        self._mid_block = RevGATBlock(
            hid // c.group, c.n_hidden // c.group, c.n_heads,
            edge_drop=c.edge_drop, use_attn_dst=c.use_attn_dst,
            use_symmetric_norm=c.use_symmetric_norm,
            compute_dtype=c.compute_dtype, stabilizer=c.stabilizer)
        self._coupling = GroupAdditiveCoupling(self._mid_block, group=c.group)
        self._last = SymGATConv(hid, c.n_classes, 1, edge_drop=c.edge_drop,
                                use_attn_dst=c.use_attn_dst, residual=True,
                                use_symmetric_norm=c.use_symmetric_norm,
                                compute_dtype=c.compute_dtype,
                                stabilizer=c.stabilizer)

    def init(self, key):
        c = self.cfg
        ks = jax.random.split(key, 5)
        params = {}
        params["first"], _ = self._first.init(ks[0])
        n_mid = c.n_layers - 2
        keys = jax.vmap(lambda i: jax.random.fold_in(ks[1], i))(jnp.arange(n_mid))
        params["mid"], _ = jax.vmap(self._coupling.init)(keys)
        params["last"], _ = self._last.init(ks[2])
        hid = c.n_heads * c.n_hidden
        params["norm"] = {"scale": jnp.ones((hid,)), "bias": jnp.zeros((hid,))}
        params["bias_last"] = jnp.zeros((c.n_classes,))
        return params, {}

    def apply(self, params, state, x, g: Graph, *, train: bool = False,
              rng: Optional[Array] = None, axis_name=None, **kw):
        c = self.cfg

        def key(i):
            return None if rng is None else jax.random.fold_in(rng, i)

        h = dropout(x, c.input_drop, train=train, rng=key(0))
        # Edge-drop: per-layer [2] int32 hash keys (ops/band.drop_key_bits) —
        # the keep decision is hash(recv, send, key), so the band kernel, its
        # transpose and the per-edge CSC path all reproduce the same mask from
        # the key alone, and the reversible inverse reuses it for free.
        dk_first = dk_mid = dk_last = None
        if train and c.edge_drop > 0 and rng is not None:
            from ..ops.band import drop_key_bits

            dk_first = drop_key_bits(key(1))
            dk_mid = jax.vmap(lambda i: drop_key_bits(
                jax.random.fold_in(key(2), i)))(jnp.arange(c.n_layers - 2))
            dk_last = drop_key_bits(key(3))

        h, _ = self._first.apply(params["first"], {}, h, g, train=train,
                                 drop_key=dk_first)
        h = h.reshape(h.shape[0], -1)  # flatten heads

        mask = None
        if train and c.dropout > 0:
            mask = jax.lax.stop_gradient(
                shared_dropout_mask(key(4), h.shape, c.dropout, h.dtype))

        coupling = self._coupling

        def fwd_one(p, h, diff):
            m, _ = diff
            lp, dk = p
            # drop key replicated per group (chunked along a width-G axis)
            dk_rep = (None if dk is None else
                      jnp.tile(dk[:, None], (1, coupling.group)))
            return coupling.forward(lp, h, g, m, dk_rep, train=train)

        def inv_one(p, y, diff):
            m, _ = diff
            lp, dk = p
            dk_rep = (None if dk is None else
                      jnp.tile(dk[:, None], (1, coupling.group)))
            return coupling.inverse(lp, y, g, m, dk_rep, train=train)

        def inv_vjp_one(p, y, diff, gy):
            m, _ = diff
            lp, dk = p
            dk_rep = (None if dk is None else
                      jnp.tile(dk[:, None], (1, coupling.group)))
            x, gx, glp, (gm, _gdk) = coupling.inverse_and_vjp(
                lp, y, g, gy, m, dk_rep, train=train)
            return x, gx, (glp, jnp.zeros_like(dk)), (gm, None)

        run = make_reversible_scan(fwd_one, inv_one, inv_vjp_one)
        scan_params = (params["mid"], dk_mid)
        if dk_mid is None:
            def fwd_one(p, h, diff):  # noqa: F811
                m, _ = diff
                lp, _dk = p
                return coupling.forward(lp, h, g, m, None, train=train)

            def inv_one(p, y, diff):  # noqa: F811
                m, _ = diff
                lp, _dk = p
                return coupling.inverse(lp, y, g, m, None, train=train)

            def inv_vjp_one(p, y, diff, gy):  # noqa: F811
                m, _ = diff
                lp, dk = p
                x, gx, glp, (gm,) = coupling.inverse_and_vjp(
                    lp, y, g, gy, m, train=train)
                return x, gx, (glp, jnp.zeros_like(dk)), (gm, None)

            run = make_reversible_scan(fwd_one, inv_one, inv_vjp_one)
            scan_params = (params["mid"],
                           jnp.zeros((c.n_layers - 2, 0), jnp.float32))
        h = run(scan_params, h, (mask, None))

        h = _batch_stats_norm(params["norm"], h, g.node_mask)
        h = jax.nn.relu(h)
        h = dropout(h, c.dropout, train=train, rng=key(5))
        out, _ = self._last.apply(params["last"], {}, h, g, train=train,
                                  drop_key=dk_last)
        out = jnp.mean(out, axis=1)  # mean over heads (`model_rev.py:362`)
        return out + params["bias_last"], state
