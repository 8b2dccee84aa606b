"""Segment reductions with the reference's torch_scatter semantics.

These are the XLA reference implementations of the framework's hottest primitive:
aggregation of per-edge messages ``[E, C]`` into per-node rows ``[N, C]`` keyed by the
(sorted) receiver index.  Pallas fused kernels (ops/spmm_pallas.py) must match these
bit-for-bit on valid data; these functions define the semantics:

* empty segments produce 0 for sum/mean AND max/min — matching torch_scatter
  (`utils/pyg_util.py:26-34` additionally clamps max output `out[out < -10000] = 0`).
* masked (padding) edges contribute nothing.
* ``segment_softmax`` is per-(segment, channel), numerically stabilized by the
  per-segment max, matching `torch_scatter.scatter_softmax` used at
  `gcn_lib/sparse/torch_message.py:52-55`.
* ``generalized_aggregate`` implements DeeperGCN's SoftMax/PowerMean aggregation
  family (`gcn_lib/sparse/torch_message.py:44-85`), including the stop-gradient
  behavior of the reference: when ``t`` is not learned the softmax weights are
  computed under ``no_grad`` — i.e. they are constants w.r.t. autodiff.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

_NEG_INF = float("-inf")

_log = logging.getLogger(__name__)

# Observability for the fused-kernel routing gates: a graph built with
# non-default pad_multiple/edge_pad silently loses the Pallas fast path — a
# 2-5x perf cliff users couldn't see before. Counters per (route, reason) and
# a once-per-key warning. `fastpath_misses()` is surfaced by EdgeRateMeter.
# NB: routing decisions happen at TRACE time, so a count of 1 means "one
# compiled program runs the slow path" (typically every step of a run), not
# "the slow path executed once"; retraces increment again.
FASTPATH_MISSES: Dict[str, int] = {}
_warned_keys: set = set()


def _miss(route: str, reason: str, *, warn: bool = True) -> bool:
    """Record that `route` fell off the fused Pallas path; returns False so the
    gates can use it as their tail expression."""
    key = f"{route}:{reason}"
    FASTPATH_MISSES[key] = FASTPATH_MISSES.get(key, 0) + 1
    if warn:
        try:  # off-TPU the Pallas path never applies — a warning is pure noise
            warn = jax.devices()[0].platform == "tpu"
        except Exception:  # pragma: no cover
            warn = False
    if warn and key not in _warned_keys:
        _warned_keys.add(key)
        _log.warning(
            "Pallas fast path disabled for %s: %s — falling back to the XLA "
            "scatter path (2-5x slower). Rebuild the graph with default "
            "pad_multiple/edge_pad so E_pad and N_pad are tile-aligned.",
            route, reason)
    return False


def fastpath_misses() -> Dict[str, int]:
    """Snapshot of fused-route miss counters (route:reason → count).

    Counts TRACE-time routing decisions — each entry means a compiled program
    (usually executed every step) took the slow path, not a per-step tally."""
    return dict(FASTPATH_MISSES)


def _mask2d(mask: Optional[Array], like: Array) -> Optional[Array]:
    if mask is None:
        return None
    return mask.reshape((-1,) + (1,) * (like.ndim - 1))


def sum_pallas_ok_shape(shape, num_segments: int, has_row_ptr: bool) -> bool:
    """Shape-level gate for routing a plain segment sum to the pipelined Pallas
    CSR kernel: legal tile alignment AND lane padding worth it (any flat width
    ≥ 32; the XLA scatter path loses even with padding because its backward is
    a serial scatter)."""
    if not has_row_ptr:
        return _miss("segment_sum", "graph has no CSR row_ptr aux")
    from . import spmm_pallas as sp
    c = 1
    for d in shape[1:]:
        c *= d
    cp = -(-c // 128) * 128
    if c < 32:
        return False  # narrow rows: XLA path is fine, not a cliff
    if cp > 128 and cp > 2 * c:
        return _miss("segment_sum", f"channel width {c} pads to {cp} (>2x waste)")
    if shape[0] % sp.CHUNK or num_segments % sp.BN:
        return _miss("segment_sum",
                     f"E_pad={shape[0]} % {sp.CHUNK} or N_pad={num_segments} % "
                     f"{sp.BN} nonzero (non-default pad_multiple/edge_pad?)")
    try:
        return jax.devices()[0].platform == "tpu" or _miss(
            "segment_sum", "platform is not TPU", warn=False)
    except Exception:  # pragma: no cover
        return False


def _sum_pallas_ok(data, num_segments: int, row_ptr) -> bool:
    return sum_pallas_ok_shape(data.shape, num_segments, row_ptr is not None)


def segment_sum(data: Array, segment_ids: Array, num_segments: int,
                mask: Optional[Array] = None, indices_are_sorted: bool = True,
                row_ptr: Optional[Array] = None) -> Array:
    m = _mask2d(mask, data)
    if m is not None:
        data = jnp.where(m, data, 0)
    if _sum_pallas_ok(data, num_segments, row_ptr):
        from . import spmm_pallas as sp

        flat = data.reshape(data.shape[0], -1)
        out = sp.segment_sum_csr(flat, segment_ids, row_ptr)  # pads lanes itself
        return out.reshape((num_segments,) + data.shape[1:])
    return jax.ops.segment_sum(data, segment_ids, num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_degree(segment_ids: Array, num_segments: int,
                   mask: Optional[Array] = None, indices_are_sorted: bool = True,
                   dtype=jnp.float32) -> Array:
    """Number of (valid) entries per segment — PyG `degree` (`torch_message.py:62`)."""
    ones = jnp.ones(segment_ids.shape, dtype)
    if mask is not None:
        ones = jnp.where(mask, ones, 0)
    return jax.ops.segment_sum(ones, segment_ids, num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_mean(data: Array, segment_ids: Array, num_segments: int,
                 mask: Optional[Array] = None, indices_are_sorted: bool = True,
                 row_ptr: Optional[Array] = None) -> Array:
    s = segment_sum(data, segment_ids, num_segments, mask, indices_are_sorted,
                    row_ptr=row_ptr)
    cnt = segment_degree(segment_ids, num_segments, mask, indices_are_sorted, s.dtype)
    cnt = cnt.reshape((-1,) + (1,) * (s.ndim - 1))
    return s / jnp.maximum(cnt, 1)


def _extreme_fwd_impl(data, segment_ids, mask, num_segments, indices_are_sorted,
                      kind):
    fill = _NEG_INF if kind == "max" else float("inf")
    m = _mask2d(mask, data)
    if m is not None:
        data = jnp.where(m, data, fill)
    fn = jax.ops.segment_max if kind == "max" else jax.ops.segment_min
    out = fn(data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted)
    # torch_scatter yields 0 for empty segments (reference clamps via
    # `out[out < -10000] = 0`, utils/pyg_util.py:30-34).
    return jnp.where(jnp.isfinite(out), out, 0), data


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _segment_extreme(data, segment_ids, mask, num_segments, indices_are_sorted,
                     kind):
    """Segment max/min with a scatter-free backward.

    XLA differentiates segment_max through a serial scatter into the argmax
    positions (~5.4 s at 524k edges x 64 ch on v5e). The VJP here is pure
    gather/compare/segment-sum: route the cotangent to the entries equal to
    their segment's extreme (split evenly among exact ties; torch_scatter
    routes to a single arbitrary argmax, identical whenever the extreme is
    unique, which is a.s. for float inputs)."""
    return _extreme_fwd_impl(data, segment_ids, mask, num_segments,
                             indices_are_sorted, kind)[0]


def _extreme_fwd(data, segment_ids, mask, num_segments, indices_are_sorted, kind):
    out, filled = _extreme_fwd_impl(data, segment_ids, mask, num_segments,
                                    indices_are_sorted, kind)
    return out, (filled, segment_ids, out)


def _extreme_bwd(num_segments, indices_are_sorted, kind, res, g):
    filled, segment_ids, out = res
    ids = jnp.minimum(segment_ids, num_segments - 1)
    valid = segment_ids < num_segments
    if valid.ndim < filled.ndim:
        valid = valid.reshape(valid.shape + (1,) * (filled.ndim - valid.ndim))
    out_e = jnp.take(out, ids, axis=0)
    elig = (filled == out_e) & jnp.isfinite(filled) & valid
    cnt = jax.ops.segment_sum(elig.astype(jnp.float32), segment_ids, num_segments,
                              indices_are_sorted=indices_are_sorted)
    cnt_e = jnp.take(jnp.maximum(cnt, 1.0), ids, axis=0)
    g_e = jnp.take(g.astype(jnp.float32), ids, axis=0)
    dd = jnp.where(elig, g_e / cnt_e, 0.0).astype(filled.dtype)
    return dd, None, None


_segment_extreme.defvjp(_extreme_fwd, _extreme_bwd)


def segment_max(data: Array, segment_ids: Array, num_segments: int,
                mask: Optional[Array] = None, indices_are_sorted: bool = True) -> Array:
    return _segment_extreme(data, segment_ids, mask, num_segments,
                            indices_are_sorted, "max")


def segment_min(data: Array, segment_ids: Array, num_segments: int,
                mask: Optional[Array] = None, indices_are_sorted: bool = True) -> Array:
    return _segment_extreme(data, segment_ids, mask, num_segments,
                            indices_are_sorted, "min")


def scatter(name: str, data: Array, segment_ids: Array, num_segments: int,
            mask: Optional[Array] = None, indices_are_sorted: bool = True,
            row_ptr: Optional[Array] = None) -> Array:
    """Named dispatch mirroring `utils/pyg_util.py:4-35` (`scatter_`)."""
    name = {"add": "sum"}.get(name, name)
    if name in ("sum", "mean"):
        fn = segment_sum if name == "sum" else segment_mean
        return fn(data, segment_ids, num_segments, mask, indices_are_sorted,
                  row_ptr=row_ptr)
    fns = {"max": segment_max, "min": segment_min}
    return fns[name](data, segment_ids, num_segments, mask, indices_are_sorted)


def segment_softmax(data: Array, segment_ids: Array, num_segments: int,
                    mask: Optional[Array] = None, indices_are_sorted: bool = True) -> Array:
    """Per-(segment, channel) softmax weights over entries (torch_scatter.scatter_softmax).

    Returns weights with the same shape as ``data``; masked entries get weight 0.
    """
    m = _mask2d(mask, data)
    logits = data if m is None else jnp.where(m, data, _NEG_INF)
    seg_max = jax.ops.segment_max(logits, segment_ids, num_segments,
                                  indices_are_sorted=indices_are_sorted)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0)
    # stop_gradient through the max shift (it cancels analytically; this matches the
    # usual stable-softmax formulation and torch_scatter's backward).
    shifted = data - jax.lax.stop_gradient(seg_max)[segment_ids]
    e = jnp.exp(shifted)
    if m is not None:
        e = jnp.where(m, e, 0)
    denom = jax.ops.segment_sum(e, segment_ids, num_segments,
                                indices_are_sorted=indices_are_sorted)
    denom = jnp.maximum(denom, jnp.finfo(e.dtype).tiny)
    return e / denom[segment_ids]


def _pallas_ok(aggr: str, row_ptr, msgs, num_segments: int) -> bool:
    """Route to the fused Pallas CSR kernels when legal: TPU backend, CSR row_ptr
    present, kernel-supported aggregation, tile-aligned padding."""
    if aggr not in ("softmax", "softmax_sg", "softmax_sum", "add", "sum", "mean"):
        return False  # kernel doesn't cover this aggregator; not a cliff
    if row_ptr is None:
        return _miss("generalized_aggregate", "graph has no CSR row_ptr aux")
    from . import spmm_pallas as sp
    if msgs.shape[0] % sp.CHUNK or num_segments % sp.BN:
        return _miss("generalized_aggregate",
                     f"E_pad={msgs.shape[0]} % {sp.CHUNK} or N_pad={num_segments} "
                     f"% {sp.BN} nonzero (non-default pad_multiple/edge_pad?)")
    try:
        return jax.devices()[0].platform == "tpu" or _miss(
            "generalized_aggregate", "platform is not TPU", warn=False)
    except Exception:  # pragma: no cover
        return False


def fused_gather_ok(g, c: int, aggr: str) -> bool:
    """Route GENConv's gather+message+softmax-aggregate to the fully fused Pallas
    pair (CSR forward / CSC backward) when legal: TPU, softmax family, CSR+CSC aux
    present, lane-aligned channels, tile-aligned padding."""
    if aggr not in ("softmax", "softmax_sg", "softmax_sum"):
        return False  # fused pair only covers the softmax family; not a cliff
    if g.row_ptr is None or g.csc_col_ptr is None or g.csc_receivers is None:
        return _miss("fused_gather_agg", "graph lacks CSR/CSC aux indices")
    from . import spmm_pallas as sp
    cp = -(-c // 128) * 128  # lane-padded width (Mosaic DMA requirement)
    # any c ≤ 128 wins even at high padding ratios (the unfused path's fixed
    # permute/gather overheads dominate: measured 2.5x at c=40); above one lane
    # tile, cap the padding overhead at 2x.
    if cp > 128 and cp > 2 * c:
        return _miss("fused_gather_agg",
                     f"channel width {c} pads to {cp} (>2x lane-padding waste)")
    if g.num_edges_padded % sp.CHUNK or g.num_nodes_padded % sp.BN:
        return _miss("fused_gather_agg",
                     f"E_pad={g.num_edges_padded} % {sp.CHUNK} or "
                     f"N_pad={g.num_nodes_padded} % {sp.BN} nonzero "
                     f"(non-default pad_multiple/edge_pad?)")
    try:
        return jax.devices()[0].platform == "tpu" or _miss(
            "fused_gather_agg", "platform is not TPU", warn=False)
    except Exception:  # pragma: no cover
        return False


def generalized_aggregate(
    msgs: Array,
    receivers: Array,
    num_segments: int,
    *,
    aggr: str = "softmax",
    t: Array | float = 1.0,
    p: Array | float = 1.0,
    y: Array | float = 0.0,
    learn_t: bool = False,
    mask: Optional[Array] = None,
    indices_are_sorted: bool = True,
    row_ptr: Optional[Array] = None,
    use_pallas: str | bool = "auto",
) -> Array:
    """DeeperGCN generalized aggregation (`gcn_lib/sparse/torch_message.py:44-85`).

    aggr ∈ {softmax, softmax_sg, softmax_sum, power, power_sum, add/sum, mean, max, min}.
    Semantics notes (parity with reference):
      * softmax weights are stop-gradiented unless (learn_t and aggr in
        {softmax, softmax_sum}) — the reference computes them under `torch.no_grad()`
        otherwise (`torch_message.py:51-55`).
      * power mean clamps messages and the mean to [1e-7, 1e1] (`:69-73`).
      * *_sum variants scale by degree^sigmoid(y) (`:60-63, 77-80`).
    """
    if use_pallas is True or (use_pallas == "auto"
                              and _pallas_ok(aggr, row_ptr, msgs, num_segments)):
        from . import spmm_pallas as sp

        if aggr in ("add", "sum"):
            return sp.segment_sum_csr(msgs, receivers, row_ptr)
        if aggr == "mean":
            s = sp.segment_sum_csr(msgs, receivers, row_ptr)
            cnt = segment_degree(receivers, num_segments, mask, indices_are_sorted,
                                 s.dtype)
            return s / jnp.maximum(cnt, 1)[:, None]
        # softmax family
        grad_w = learn_t and aggr in ("softmax", "softmax_sum")
        out = sp.gen_softmax_aggregate_csr(msgs, receivers, row_ptr,
                                           jnp.asarray(t, jnp.float32), grad_w)
        if aggr == "softmax_sum":
            deg = segment_degree(receivers, num_segments, mask, indices_are_sorted,
                                 out.dtype)
            out = jnp.power(deg, jax.nn.sigmoid(y))[:, None] * out
        return out

    if aggr in ("add", "sum"):
        return segment_sum(msgs, receivers, num_segments, mask, indices_are_sorted)
    if aggr == "mean":
        return segment_mean(msgs, receivers, num_segments, mask, indices_are_sorted)
    if aggr == "max":
        return segment_max(msgs, receivers, num_segments, mask, indices_are_sorted)
    if aggr == "min":
        return segment_min(msgs, receivers, num_segments, mask, indices_are_sorted)

    if aggr in ("softmax", "softmax_sg", "softmax_sum"):
        w = segment_softmax(msgs * t, receivers, num_segments, mask, indices_are_sorted)
        if not (learn_t and aggr in ("softmax", "softmax_sum")):
            w = jax.lax.stop_gradient(w)
        out = segment_sum(msgs * w, receivers, num_segments, mask, indices_are_sorted)
        if aggr == "softmax_sum":
            deg = segment_degree(receivers, num_segments, mask, indices_are_sorted, out.dtype)
            out = jnp.power(deg, jax.nn.sigmoid(y))[:, None] * out
        return out

    if aggr in ("power", "power_sum"):
        lo, hi = 1e-7, 1e1
        m = jnp.clip(msgs, lo, hi)
        out = segment_mean(jnp.power(m, p), receivers, num_segments, mask, indices_are_sorted)
        out = jnp.clip(out, lo, hi)
        out = jnp.power(out, 1.0 / p)
        if aggr == "power_sum":
            deg = segment_degree(receivers, num_segments, mask, indices_are_sorted, out.dtype)
            out = jnp.power(deg, jax.nn.sigmoid(y))[:, None] * out
        return out

    raise NotImplementedError(f"aggregation '{aggr}' is not implemented")


def generalized_aggregate_split(
    parts,
    num_segments: int,
    *,
    aggr: str = "softmax",
    t: Array | float = 1.0,
    p: Array | float = 1.0,
    y: Array | float = 0.0,
    learn_t: bool = False,
) -> Array:
    """`generalized_aggregate` over a UNION of edge sets, each aggregated
    partially and combined exactly — the enabler for overlapping a halo
    exchange with local-edge aggregation (SURVEY §7 hard-part 4): the caller
    aggregates the local part while remote rows are in flight, then folds in
    the halo part.

    ``parts`` is a sequence of (msgs [E_i, C], receivers [E_i], row_ptr or
    None, mask or None) tuples, each receiver-sorted.  Results match
    `generalized_aggregate` on the concatenated edge set up to fp reassociation:
      * sum/mean/power: partial sums/counts are linear;
      * max/min: partial extremes (−inf empty fill) combine by max/min;
      * softmax family: a shared per-(segment,channel) stabilizer (the max of
        the partial segment maxima, stop-gradient — it cancels analytically)
        makes the partial num/den sums exact.
    Stop-gradient semantics match the reference (`torch_message.py:44-85`).
    """
    parts = [(m, r, rp, mk) for (m, r, rp, mk) in parts]
    if len(parts) == 1:
        m, r, rp, mk = parts[0]
        return generalized_aggregate(m, r, num_segments, aggr=aggr, t=t, p=p,
                                     y=y, learn_t=learn_t, mask=mk, row_ptr=rp)

    def _deg(dtype):
        return sum(segment_degree(r, num_segments, mk, dtype=dtype)
                   for (_, r, _, mk) in parts)

    if aggr in ("add", "sum"):
        return sum(segment_sum(m, r, num_segments, mk, row_ptr=rp)
                   for (m, r, rp, mk) in parts)
    if aggr == "mean":
        s = sum(segment_sum(m, r, num_segments, mk, row_ptr=rp)
                for (m, r, rp, mk) in parts)
        cnt = _deg(s.dtype).reshape((-1,) + (1,) * (s.ndim - 1))
        return s / jnp.maximum(cnt, 1)
    if aggr in ("max", "min"):
        combine = jnp.maximum if aggr == "max" else jnp.minimum
        fill = _NEG_INF if aggr == "max" else float("inf")
        outs, fins = [], []
        for (m, r, rp, mk) in parts:
            # keep ±inf for empty segments until after the combine — a partial
            # that zero-fills early would beat a true negative max
            fn = segment_max if aggr == "max" else segment_min
            o = fn(m, r, num_segments, mk)
            has = segment_degree(r, num_segments, mk, dtype=jnp.float32) > 0
            has = has.reshape((-1,) + (1,) * (o.ndim - 1))
            outs.append(jnp.where(has, o, fill))
            fins.append(has)
        out = functools.reduce(combine, outs)
        any_has = functools.reduce(jnp.logical_or, fins)
        return jnp.where(any_has, out, 0)

    if aggr in ("softmax", "softmax_sg", "softmax_sum"):
        t_eff = t
        if isinstance(t, jax.Array) and not (learn_t and aggr in ("softmax",
                                                                  "softmax_sum")):
            t_eff = jax.lax.stop_gradient(t)
        # shared stabilizer: max over the partial segment maxima (exact — it
        # cancels; stop-gradient like any stable-softmax shift)
        seg_maxes = []
        for (m, r, _, mk) in parts:
            logits = m * t_eff
            m2 = _mask2d(mk, logits)
            if m2 is not None:
                logits = jnp.where(m2, logits, _NEG_INF)
            seg_maxes.append(jax.ops.segment_max(logits, r, num_segments,
                                                 indices_are_sorted=True))
        sm = functools.reduce(jnp.maximum, seg_maxes)
        sm = jax.lax.stop_gradient(jnp.where(jnp.isfinite(sm), sm, 0))
        es = []
        for (m, r, rp, mk) in parts:
            e = jnp.exp(m * t_eff - jnp.take(sm, jnp.minimum(r, num_segments - 1),
                                             axis=0))
            m2 = _mask2d(mk, e)
            if m2 is not None:
                e = jnp.where(m2, e, 0)
            sent = (r < num_segments).reshape((-1,) + (1,) * (e.ndim - 1))
            es.append(jnp.where(sent, e, 0))
        den = sum(segment_sum(e, r, num_segments, row_ptr=rp)
                  for e, (_, r, rp, _) in zip(es, parts))
        den = jnp.maximum(den, jnp.finfo(es[0].dtype).tiny)
        grad_w = learn_t and aggr in ("softmax", "softmax_sum")
        out = jnp.zeros_like(den)
        for e, (m, r, rp, _) in zip(es, parts):
            w = e / jnp.take(den, jnp.minimum(r, num_segments - 1), axis=0)
            if not grad_w:
                # reference computes the weights under no_grad
                # (`torch_message.py:51-55`)
                w = jax.lax.stop_gradient(w)
            out = out + segment_sum(w * m, r, num_segments, row_ptr=rp)
        if aggr == "softmax_sum":
            deg = _deg(out.dtype)
            out = jnp.power(deg, jax.nn.sigmoid(y))[:, None] * out
        return out

    if aggr in ("power", "power_sum"):
        lo, hi = 1e-7, 1e1
        s = sum(segment_sum(jnp.power(jnp.clip(m, lo, hi), p), r, num_segments,
                            mk, row_ptr=rp)
                for (m, r, rp, mk) in parts)
        cnt = _deg(s.dtype).reshape((-1,) + (1,) * (s.ndim - 1))
        out = jnp.clip(s / jnp.maximum(cnt, 1), lo, hi)
        out = jnp.power(out, 1.0 / p)
        if aggr == "power_sum":
            deg = _deg(out.dtype)
            out = jnp.power(deg, jax.nn.sigmoid(y))[:, None] * out
        return out

    raise NotImplementedError(f"aggregation '{aggr}' is not implemented")
