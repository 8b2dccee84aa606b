"""DGL-variant GATConv used by RevGAT (ogbn-arxiv).

Rebuild of `examples/ogb_eff/ogbn_arxiv_dgl/model_rev.py:51-194`:
  * score_e = leaky_relu(a_l·(W h)_src + [a_r·(W h)_dst]), per head;
  * optional symmetric normalization: h_src scaled by out_deg^-1/2 before
    aggregation, result scaled by in_deg^1/2 after (`:141-147, 180-185`);
  * edge-drop: a per-layer keep-mask zeroes dropped edges BEFORE the softmax, so
    attention renormalizes over kept edges only (`:166-172`; the reference keeps an
    exact (1-p)·E subset via randperm — here a Bernoulli keep-mask, equal in
    expectation, passed in explicitly so the reversible inverse reuses it);
  * optional residual Linear (no bias), xavier-normal(gain=√2) inits;
  * no implicit self-loops (the arxiv pipeline adds them to the graph).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..graph import Graph
from ..nn.core import Module
from ..ops.gather import gather_src_auto
from ..ops.segment import segment_degree, segment_softmax, segment_sum
from ..ops.spmm_pallas import gat_softmax_spmm


def _gat_band_ok(g: "Graph") -> bool:
    """Band route for the sender-only-score GAT: band attached with enough
    gather-free coverage (window + hubs), TPU backend (or the test hook)."""
    from ..ops.band import band_sum_ok

    return band_sum_ok(g)


def _gat_dense_ok(g: "Graph") -> bool:
    """Dense-window route for the dst-score GAT (hub-free band only)."""
    from ..ops.band import band_gat_dense_ok

    return band_gat_dense_ok(g)


def _gat_fused_ok(g: "Graph", packed_width: int) -> bool:
    """Route to the fused attention+SpMM kernel pair when legal on TPU."""
    if g.row_ptr is None or g.csc_col_ptr is None or g.csc_receivers is None:
        return False
    from ..ops import spmm_pallas as sp

    pp = -(-packed_width // 128) * 128
    if pp > 2 * packed_width and pp > 384:
        return False
    if g.num_edges_padded % sp.CHUNK or g.num_nodes_padded % sp.BN:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False

Array = jax.Array

# Backward-reciprocal floor for the GLOBAL-stabilizer fast paths
# (band_gat_agg / gat_softmax_spmm): a receiver whose stabilized den has
# underflowed below this emits 0 with zero gradients instead of poisoning the
# backward with 1/den → inf → inf·0 = NaN.  Receivers this far below the
# global score max (den < 1e-20 ⇒ every sender scores ≳46 under it) had
# already lost their mantissa to the shared shift — the forward value was
# garbage either way; the exact answer needs the per-receiver stabilizer
# (stabilizer="per_receiver").  Measured round 5: deep sym-norm RevGAT on a
# 49k-out-degree stress graph drives the per-head score spread to ~100, den
# to f32-denormal on 1.2k receivers, and the unguarded backward NaNs on BOTH
# fast routes (scripts/tpu_gat_nan_repro.py) — in f32 compute as well as
# bf16 (the spread, not the dtype, is the envelope).
DEN_TINY = 1e-20


@jax.custom_vjp
def _safe_div(num: Array, den: Array) -> Array:
    """num [N,H,D] / den [N,H] with the DEN_TINY guard and a REASSOCIATED
    backward: plain autodiff forms d_den = -<g,num>/den², and den² underflows
    f32 for den ≲ 1e-19 — the TPU flushes the denormal square to zero and the
    backward emits inf/NaN even though den itself passed the guard (measured:
    the round-5 RevGAT repro NaN'd at den = 1.19e-20 through exactly this).
    Computing d_den = -<g, out>/den (two divisions, no square) keeps every
    intermediate within f32 range for any den above the guard."""
    ok = den > DEN_TINY
    return jnp.where(ok[..., None], num / jnp.where(ok, den, 1.0)[..., None],
                     0.0)


def _safe_div_fwd(num, den):
    ok = den > DEN_TINY
    dsafe = jnp.where(ok, den, 1.0)
    out = jnp.where(ok[..., None], num / dsafe[..., None], 0.0)
    return out, (out, dsafe, ok)


def _safe_div_bwd(res, g):
    out, dsafe, ok = res
    d_num = jnp.where(ok[..., None], g / dsafe[..., None], 0.0)
    d_den = jnp.where(ok, -jnp.sum(g * out, axis=-1) / dsafe, 0.0)
    return d_num, d_den


_safe_div.defvjp(_safe_div_fwd, _safe_div_bwd)


@dataclass(frozen=True)
class SymGATConv(Module):
    in_dim: int
    out_dim: int      # per-head
    num_heads: int = 1
    edge_drop: float = 0.0
    neg_slope: float = 0.2
    use_attn_dst: bool = True
    residual: bool = False
    use_symmetric_norm: bool = False
    # 'bfloat16' halves HBM traffic of the fused attention+SpMM path (the packed
    # table gather dominates); accumulation stays f32 in-kernel.
    compute_dtype: str = "float32"
    # Softmax stabilizer for the sender-only-score band route:
    #   "auto"         — node-factored band_gat_agg with ONE global per-head
    #                    shift (fastest; exact while the per-head score spread
    #                    stays ≲80 — the BN'd published configs);
    #   "per_receiver" — dense in-window evaluation (ops/gat_dense.py, er≡0)
    #                    with an EXACT per-receiver stabilizer, hub-capable —
    #                    required when sym-norm depth amplifies score outliers
    #                    (see DEN_TINY note; measured 1.82x the step time of
    #                    "auto" on the RevGAT-5L bench workload, 858 vs 472
    #                    ms — hence opt-in, not the default).
    # The dst-score case always uses the per-receiver dense route.
    stabilizer: str = "auto"

    def init(self, key):
        k = jax.random.split(key, 4)
        h, d = self.num_heads, self.out_dim
        gain = 2.0 ** 0.5  # relu gain

        def xavier_normal(key, shape, fan_in, fan_out):
            std = gain * (2.0 / (fan_in + fan_out)) ** 0.5
            return jax.random.normal(key, shape, jnp.float32) * std

        params = {
            "fc": xavier_normal(k[0], (self.in_dim, h * d), self.in_dim, h * d),
            "attn_l": xavier_normal(k[1], (h, d), d, 1),
        }
        if self.use_attn_dst:
            params["attn_r"] = xavier_normal(k[2], (h, d), d, 1)
        if self.residual:
            params["res_fc"] = xavier_normal(k[3], (self.in_dim, h * d),
                                             self.in_dim, h * d)
        return params, {}

    def apply(self, params, state, x, g: Graph, *, train: bool = False,
              keep_mask: Optional[Array] = None,
              drop_key: Optional[Array] = None, **kw):
        """keep_mask: optional [E] float/bool — edges kept by edge-drop (train).
        drop_key: optional [2] int32 hash-key (ops/band.drop_key_bits) — the
        keep decision becomes hash(recv_id, send_id, key), identical between
        the band kernel, its transpose (VJP) and the per-edge paths, so
        edge-drop TRAINING rides the gather-free band too.  When both are
        given, drop_key wins."""
        n = x.shape[0]
        drop_spec = None
        if train and self.edge_drop > 0 and drop_key is not None:
            from ..ops.band import DropSpec, drop_thresh, edge_keep_mask

            drop_spec = DropSpec(k0=drop_key[0], k1=drop_key[1],
                                 thresh=drop_thresh(self.edge_drop))
            keep_mask = edge_keep_mask(drop_spec, g.receivers, g.senders)
        h, d = self.num_heads, self.out_dim
        feat = (x @ params["fc"]).reshape(n, h, d)

        emask = g.edge_mask
        if self.use_symmetric_norm:
            out_deg = segment_degree(g.senders, n, mask=emask)
            feat_src = feat * jnp.power(jnp.maximum(out_deg, 1.0),
                                        -0.5)[:, None, None]
        else:
            feat_src = feat

        el = jnp.einsum("nhd,hd->nh", feat_src, params["attn_l"])
        score = jnp.take(el, jnp.minimum(g.senders, n - 1), axis=0)
        if self.use_attn_dst:
            er = jnp.einsum("nhd,hd->nh", feat, params["attn_r"])
            score = score + jnp.take(er, jnp.minimum(g.receivers, n - 1), axis=0)
        score = jax.nn.leaky_relu(score, self.neg_slope)

        att_mask = emask
        dropping = train and self.edge_drop > 0 and keep_mask is not None
        if dropping:
            att_mask = att_mask & (keep_mask > 0)

        if (self.use_attn_dst and (not dropping or drop_spec is not None)
                and _gat_dense_ok(g)):
            # dst-score GAT through DENSE evaluation over all band
            # structures (window + hub cols/rows; exact shared stabilizer,
            # manual VJP) — no per-edge gather (ops/gat_dense.py; hub-capable
            # since round 5).
            from ..ops.band import band_gat_dense_agg, band_interpret

            cd = (jnp.bfloat16 if self.compute_dtype == "bfloat16"
                  else feat_src.dtype)
            num, den = band_gat_dense_agg(feat_src, el, er, g.band,
                                          self.neg_slope, compute_dtype=cd,
                                          drop=drop_spec,
                                          interpret=band_interpret())
            out = _safe_div(num, den)
        elif ((not self.use_attn_dst)
                and self.stabilizer == "per_receiver"
                and (not dropping or drop_spec is not None)
                and _gat_dense_ok(g)):
            # sender-only scores with an EXACT per-receiver stabilizer: the
            # dense in-window route with er ≡ 0 (see the stabilizer field
            # note — the global-shift fast path silently zeroes receivers
            # whose senders all score far below the global max).
            from ..ops.band import band_gat_dense_agg, band_interpret

            cd = (jnp.bfloat16 if self.compute_dtype == "bfloat16"
                  else feat_src.dtype)
            num, den = band_gat_dense_agg(feat_src, el, jnp.zeros_like(el),
                                          g.band, self.neg_slope,
                                          compute_dtype=cd, drop=drop_spec,
                                          interpret=band_interpret())
            out = _safe_div(num, den)
        elif ((not self.use_attn_dst)
                and (not dropping or drop_spec is not None)
                and _gat_band_ok(g)):
            # gather-free band route: sender-only scores are node-factored, so
            # num/den are one band SpMM of the packed [e·feat | e] table
            # (ops/band.band_gat_agg).  Edge-drop rides along via the hash
            # DropSpec (per-position keeps inside the kernel); an explicit
            # [E] keep_mask without a key is not band-expressible → fused-CSC.
            from ..ops.band import band_gat_agg, band_interpret

            cd = (jnp.bfloat16 if self.compute_dtype == "bfloat16"
                  else feat_src.dtype)
            num, den = band_gat_agg(feat_src, el, g.band, self.neg_slope,
                                    compute_dtype=cd,
                                    interpret=band_interpret(),
                                    drop=drop_spec)
            out = _safe_div(num, den)
        elif (not self.use_attn_dst) and _gat_fused_ok(g, h * d + h):
            # fully fused attention+SpMM: one gather of the packed [feat|el]
            # table, CSR forward / CSC backward kernels; renormalizing edge-drop
            # folds into sentinel receiver ids.
            cd = (jnp.bfloat16 if self.compute_dtype == "bfloat16"
                  else feat_src.dtype)
            T = jnp.concatenate([feat_src.reshape(n, h * d), el], axis=1)
            pp = -(-(h * d + h) // 128) * 128
            T = jnp.pad(T, ((0, 0), (0, pp - h * d - h))).astype(cd)
            recv_eff = jnp.where(att_mask, g.receivers, n)
            keep_csc = None
            if train and self.edge_drop > 0 and keep_mask is not None:
                # padding edges are already excluded by sentinel sender ids
                keep_csc = jnp.take(keep_mask, g.csc_perm)
            agg = gat_softmax_spmm(T, g.senders, recv_eff, g.row_ptr,
                                   g.csc_senders, g.csc_receivers, g.csc_col_ptr,
                                   keep_csc, h * d, h, self.neg_slope)
            num = agg[:, :h * d].astype(jnp.float32).reshape(n, h, d)
            den = agg[:, h * d:h * d + h].astype(jnp.float32)
            out = _safe_div(num, den)
        else:
            alpha = segment_softmax(score, g.receivers, n, mask=att_mask)
            msg = gather_src_auto(feat_src.reshape(n, h * d), g).reshape(-1, h, d)
            out = segment_sum(msg * alpha[..., None], g.receivers, n,
                              mask=att_mask, row_ptr=g.row_ptr)

        if self.use_symmetric_norm:
            in_deg = segment_degree(g.receivers, n, mask=emask)
            out = out * jnp.power(jnp.maximum(in_deg, 1.0), 0.5)[:, None, None]

        if self.residual:
            out = out + (x @ params["res_fc"]).reshape(n, h, d)
        return out, state  # [N, H, D] — caller flattens or averages heads
