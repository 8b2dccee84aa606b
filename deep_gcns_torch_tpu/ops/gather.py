"""Source-feature gather with a CSC (sender-sorted) backward pass.

The VJP of ``x[senders]`` is a scatter-add over UNSORTED sender indices — XLA lowers
it to a serial scatter that dominates the backward pass (~50 ms at 2.5M×128 on v5e).
With the sender-sorted permutation precomputed on the host (Graph.csc_*), the same
reduction becomes: permute cotangents into sender order (a gather), then the fused
Pallas CSR segment-sum — 2-3× faster and deterministic.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .spmm_pallas import segment_sum_csr

Array = jax.Array


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gather_src(x: Array, senders: Array, csc_perm: Array, csc_senders: Array,
               csc_col_ptr: Array, interpret: bool = False) -> Array:
    """x[senders] with sentinel clamp; bwd uses the CSC segment-sum kernel."""
    return jnp.take(x, jnp.minimum(senders, x.shape[0] - 1), axis=0)


def _fwd(x, senders, csc_perm, csc_senders, csc_col_ptr, interpret):
    out = jnp.take(x, jnp.minimum(senders, x.shape[0] - 1), axis=0)
    return out, (csc_perm, csc_senders, csc_col_ptr)


def _bwd(interpret, res, g):
    csc_perm, csc_senders, csc_col_ptr = res
    n_pad = csc_col_ptr.shape[0] - 1
    g_sorted = jnp.take(g, csc_perm, axis=0)
    # zero the padding slots (perm points them at an arbitrary row)
    g_sorted = jnp.where((csc_senders < n_pad)[:, None], g_sorted, 0)
    dx = segment_sum_csr(g_sorted, csc_senders, csc_col_ptr, interpret)
    return dx, None, None, None, None


gather_src.defvjp(_fwd, _bwd)


def gather_src_auto(x: Array, g) -> Array:
    """Use the CSC backward when the graph carries CSC aux and shapes are
    kernel-aligned on TPU; plain take otherwise."""
    from .segment import _pallas_ok

    if (g.csc_perm is not None
            and _pallas_ok("sum", g.csc_col_ptr, g.senders[:, None]
                           if g.senders.ndim == 1 else g.senders,
                           g.num_nodes_padded)):
        return gather_src(x, g.senders, g.csc_perm, g.csc_senders, g.csc_col_ptr)
    return jnp.take(x, jnp.minimum(g.senders, x.shape[0] - 1), axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gather_dst(x: Array, receivers: Array, row_ptr: Array,
               interpret: bool = False) -> Array:
    """x[receivers] with sentinel clamp.  Receivers are sorted (graph invariant),
    so the VJP's scatter-add is directly the fused CSR segment-sum kernel on the
    cotangents — no permute at all (unlike the sender-side gather)."""
    return jnp.take(x, jnp.minimum(receivers, x.shape[0] - 1), axis=0)


def _dst_fwd(x, receivers, row_ptr, interpret):
    out = jnp.take(x, jnp.minimum(receivers, x.shape[0] - 1), axis=0)
    return out, (receivers, row_ptr)


def _dst_bwd(interpret, res, g):
    receivers, row_ptr = res
    dx = segment_sum_csr(g, receivers, row_ptr, interpret)
    return dx, None, None


gather_dst.defvjp(_dst_fwd, _dst_bwd)


def gather_dst_auto(x: Array, g) -> Array:
    """Use the CSR-kernel backward when aligned on TPU; plain take otherwise."""
    from .segment import _pallas_ok

    if (g.row_ptr is not None
            and _pallas_ok("sum", g.row_ptr, g.receivers[:, None]
                           if g.receivers.ndim == 1 else g.receivers,
                           g.num_nodes_padded)):
        return gather_dst(x, g.receivers, g.row_ptr)
    return jnp.take(x, jnp.minimum(g.receivers, x.shape[0] - 1), axis=0)


# ---------------------------------------------------------------------------
# dense (batched point-cloud) neighbor gather — `gcn_lib/dense/torch_nn.py:75-96`
# ---------------------------------------------------------------------------

def neighbor_transpose(idx: Array):
    """Sender-sorted transpose of a dense kNN edge structure, built on device.

    idx [B, N, K] (neighbor ids per center, from ops/knn.py) → the flat
    batch-offset edge list sorted by SENDER: (csc_perm [E], csc_senders [E],
    csc_row_ptr [B·N+1]) with E = B·N·K.  One `sort_key_val` over E int32 keys
    (~1 ms at 0.5M edges) buys the backward a sorted segment-sum instead of
    XLA's serial unsorted scatter-add (~4.7 ms per scatter at the same size).
    """
    b, n, k = idx.shape
    e = b * n * k
    flat = (idx.astype(jnp.int32)
            + (jnp.arange(b, dtype=jnp.int32) * n)[:, None, None]).reshape(e)
    senders, perm = jax.lax.sort_key_val(flat, jnp.arange(e, dtype=jnp.int32))
    row_ptr = jnp.searchsorted(senders, jnp.arange(b * n + 1,
                                                   dtype=jnp.int32)).astype(jnp.int32)
    return perm, senders, row_ptr


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _gather_neighbors_csc(x, idx, csc_perm, csc_senders, csc_row_ptr,
                          interpret: bool = False):
    return jax.vmap(lambda xb, ib: jnp.take(xb, ib, axis=0, mode="clip"))(x, idx)


def _gn_fwd(x, idx, csc_perm, csc_senders, csc_row_ptr, interpret):
    out = jax.vmap(lambda xb, ib: jnp.take(xb, ib, axis=0, mode="clip"))(x, idx)
    return out, (csc_perm, csc_senders, csc_row_ptr, x.shape)


def _gn_bwd(interpret, res, g):
    csc_perm, csc_senders, csc_row_ptr, xshape = res
    b, n, c = xshape
    g_flat = g.reshape(-1, c)
    g_sorted = jnp.take(g_flat, csc_perm, axis=0)
    dx = segment_sum_csr(g_sorted, csc_senders, csc_row_ptr, interpret)
    return dx.reshape(b, n, c), None, None, None, None


_gather_neighbors_csc.defvjp(_gn_fwd, _gn_bwd)


def gather_neighbors(x: Array, idx: Array) -> Array:
    """x [B, N, C], idx [B, N, K] → [B, N, K, C]; CSC segment-sum backward when
    the Pallas kernel tiles fit, plain take (unsorted-scatter VJP) otherwise."""
    from .segment import sum_pallas_ok_shape

    b, n, k = idx.shape
    if sum_pallas_ok_shape((b * n * k, x.shape[-1]), b * n, has_row_ptr=True):
        csc_perm, csc_senders, csc_row_ptr = neighbor_transpose(
            jax.lax.stop_gradient(idx))
        return _gather_neighbors_csc(x, idx, csc_perm, csc_senders, csc_row_ptr)
    return jax.vmap(lambda xb, ib: jnp.take(xb, ib, axis=0, mode="clip"))(x, idx)
