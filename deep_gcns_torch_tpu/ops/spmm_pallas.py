"""Pallas TPU kernels for CSR segment reductions — the framework's hot loop.

Replaces the reference's torch_scatter CUDA kernels (`gcn_lib/sparse/torch_message.py:
52-58`, `utils/pyg_util.py:26-27`) with a TPU-native formulation: edges are sorted by
receiver (graph.py invariant), the node axis is processed in blocks of ``BN`` rows,
and each block's contiguous edge range is consumed in ``CHUNK``-edge tiles.  The
scatter becomes a *one-hot matmul* on the MXU:

    partial[BN, C] += onehotᵀ[BN, CHUNK] @ msgs[CHUNK, C],
    onehotᵀ[n, e] = (receiver[e] == block_base + n)

Edges outside the block (tile overlap at block boundaries, padding sentinel) simply
produce no one-hot match — no masking or atomics needed; the sequential TPU grid
makes accumulation race-free.

Kernels:
  * segment_sum_csr — sum (mean via degree outside); custom VJP (bwd = gather).
  * gen_softmax_aggregate_csr — GENConv's generalized softmax aggregation
    Σ_e softmax_e(t·m)·m fused into ONE pass over the edges, with custom VJP
    covering d/dm and d/dt (`gcn_lib/sparse/torch_message.py:49-65` semantics incl.
    the reference's stop-gradient-on-weights behavior).

Stability: softmax per (node, channel) is invariant to subtracting any per-node
constant. We subtract the per-channel GLOBAL score max (one cheap XLA reduction),
so exp ≤ 1 everywhere and the kernel needs no per-node max pass. This is exact
unless a node's max score lags the global max by > ~85 (f32 exp underflow) — with
GENConv messages (relu+ε, t ∈ [0.01, 10]) that margin is far beyond anything
reachable; the XLA reference path remains available for adversarial inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BN = 128      # node rows per block
CHUNK = 512   # edges per tile


def _dot(a, b):
    # f32 inputs need HIGHEST (bf16x3 decomposition) for torch-f32 parity — the
    # default bf16 truncation gives ~1e-2 relative error. bf16 inputs are already
    # exact on the MXU with f32 accumulation (and Mosaic rejects HIGHEST for them).
    prec = (jax.lax.Precision.DEFAULT if a.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=prec,
        preferred_element_type=jnp.float32)


def _block_bounds(row_ptr, i, n_pad):
    base = i * BN
    start = row_ptr[base]
    end = row_ptr[jnp.minimum(base + BN, n_pad)]
    chunk0 = start // CHUNK
    nchunks = jnp.where(end > start, (end - chunk0 * CHUNK + CHUNK - 1) // CHUNK, 0)
    return base, chunk0, nchunks


def _make_loader(msgs_hbm, recv_hbm, m_buf, r_buf, sem_m, sem_r, chunk0):
    """DMA one edge tile: messages [CHUNK, C] and receivers as a [1, CHUNK] row."""

    def load(k):
        off = (chunk0 + k) * CHUNK
        cp_m = pltpu.make_async_copy(msgs_hbm.at[pl.ds(off, CHUNK), :], m_buf, sem_m)
        cp_r = pltpu.make_async_copy(recv_hbm.at[:, pl.ds(off, CHUNK)], r_buf, sem_r)
        cp_m.start()
        cp_r.start()
        cp_m.wait()
        cp_r.wait()

    return load


# ---------------------------------------------------------------------------
# segment sum
# ---------------------------------------------------------------------------

def _seg_sum_kernel(row_ptr, msgs_hbm, recv_hbm, out_ref, *, n_pad, c):
    i = pl.program_id(0)
    base, chunk0, nchunks = _block_bounds(row_ptr, i, n_pad)

    def scoped(m_buf, r_buf, sem_m, sem_r):
        load = _make_loader(msgs_hbm, recv_hbm, m_buf, r_buf, sem_m, sem_r, chunk0)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (BN, 1), 0) + base

        def body(k, acc):
            load(k)
            onehot_t = (r_buf[:, :] == row_ids).astype(m_buf.dtype)  # [BN, CHUNK]
            return acc + _dot(onehot_t, m_buf[:, :])

        acc = jax.lax.fori_loop(0, nchunks, body, jnp.zeros((BN, c), jnp.float32))
        out_ref[:, :] = acc.astype(out_ref.dtype)

    pl.run_scoped(
        scoped,
        pltpu.VMEM((CHUNK, c), msgs_hbm.dtype),
        pltpu.VMEM((1, CHUNK), jnp.int32),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def segment_sum_csr(msgs: Array, receivers: Array, row_ptr: Array,
                    interpret: bool = False) -> Array:
    """Sum msgs [E_pad, C] into [N_pad, C]. receivers sorted (sentinel-padded),
    row_ptr [N_pad+1]; E_pad % CHUNK == 0, N_pad % BN == 0."""
    return _segment_sum_impl(msgs, receivers, row_ptr, interpret)


def _pad_lanes(msgs):
    """Mosaic DMA requires 128-aligned channel dims; zero lanes are exact no-ops
    for the sums/softmax numerators these kernels compute."""
    c = msgs.shape[1]
    pad = (-c) % 128
    return (jnp.pad(msgs, ((0, 0), (0, pad))) if pad else msgs), c


def _segment_sum_impl(msgs, receivers, row_ptr, interpret):
    msgs, c_orig = _pad_lanes(msgs)
    e_pad, c = msgs.shape
    n_pad = row_ptr.shape[0] - 1
    assert e_pad % CHUNK == 0 and n_pad % BN == 0, (e_pad, n_pad)
    recv_row = receivers.reshape(1, e_pad)
    kernel = functools.partial(_seg_sum_kernel, n_pad=n_pad, c=c)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // BN,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((BN, c), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), msgs.dtype),
        interpret=interpret,
    )(row_ptr, msgs, recv_row)[:, :c_orig]


def _segment_sum_fwd(msgs, receivers, row_ptr, interpret):
    out = _segment_sum_impl(msgs, receivers, row_ptr, interpret)
    return out, (receivers, row_ptr.shape[0] - 1)


def _segment_sum_bwd(interpret, res, g):
    receivers, n_pad = res
    dm = jnp.take(g, jnp.minimum(receivers, n_pad - 1), axis=0)
    dm = jnp.where((receivers < n_pad)[:, None], dm, 0)
    return dm, None, None


segment_sum_csr.defvjp(_segment_sum_fwd, _segment_sum_bwd)


# ---------------------------------------------------------------------------
# fused generalized softmax aggregation (GENConv hot loop)
# ---------------------------------------------------------------------------

def _softmax_agg_kernel(row_ptr, t_smem, msgs_hbm, recv_hbm, cmax_ref, out_ref,
                        den_ref, *, n_pad, c):
    i = pl.program_id(0)
    base, chunk0, nchunks = _block_bounds(row_ptr, i, n_pad)
    t = t_smem[0]

    def scoped(m_buf, r_buf, sem_m, sem_r):
        load = _make_loader(msgs_hbm, recv_hbm, m_buf, r_buf, sem_m, sem_r, chunk0)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (BN, 1), 0) + base
        cmax = cmax_ref[0:1, :]  # [1, C] per-channel global score max

        cd = msgs_hbm.dtype  # dot operand dtype follows the message dtype:
        # bf16 messages → single-pass bf16 MXU dots (f32 accumulation); f32
        # messages → exact HIGHEST-precision dots.

        def body(k, carry):
            num, den = carry
            load(k)
            onehot_t = (r_buf[:, :] == row_ids).astype(cd)  # [BN, CHUNK]
            m = m_buf[:, :].astype(jnp.float32)
            e = jnp.exp(m * t - cmax)  # [CHUNK, C], ≤ 1
            num = num + _dot(onehot_t, (e * m).astype(cd))
            den = den + _dot(onehot_t, e.astype(cd))
            return num, den

        num = jnp.zeros((BN, c), jnp.float32)
        den = jnp.zeros((BN, c), jnp.float32)
        num, den = jax.lax.fori_loop(0, nchunks, body, (num, den))
        out_ref[:, :] = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0),
                                  0.0).astype(out_ref.dtype)
        den_ref[:, :] = den.astype(den_ref.dtype)

    pl.run_scoped(
        scoped,
        pltpu.VMEM((CHUNK, c), msgs_hbm.dtype),
        pltpu.VMEM((1, CHUNK), jnp.int32),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    )


def _softmax_agg_call(msgs, receivers, row_ptr, t, interpret):
    msgs, c_orig = _pad_lanes(msgs)
    e_pad, c = msgs.shape
    n_pad = row_ptr.shape[0] - 1
    assert e_pad % CHUNK == 0 and n_pad % BN == 0, (e_pad, n_pad)
    recv_row = receivers.reshape(1, e_pad)
    t_arr = jnp.asarray(t, jnp.float32).reshape(1)
    # per-channel global score max (one cheap XLA reduction; padding excluded)
    valid = (receivers < n_pad)[:, None]
    scores = jnp.where(valid, msgs.astype(jnp.float32) * t_arr[0], -jnp.inf)
    cmax = jnp.max(scores, axis=0)
    cmax = jnp.where(jnp.isfinite(cmax), cmax, 0.0)
    cmax = jax.lax.stop_gradient(cmax)
    cmax8 = jnp.broadcast_to(cmax[None, :], (8, c))
    kernel = functools.partial(_softmax_agg_kernel, n_pad=n_pad, c=c)
    out, den = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,   # row_ptr, t
            grid=(n_pad // BN,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((8, c), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((BN, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BN, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, c), msgs.dtype),
            jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        ),
        interpret=interpret,
    )(row_ptr, t_arr, msgs, recv_row, cmax8)
    return out[:, :c_orig], den[:, :c_orig], cmax[:c_orig]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def gen_softmax_aggregate_csr(msgs: Array, receivers: Array, row_ptr: Array,
                              t: Array, grad_weights: bool = False,
                              interpret: bool = False) -> Array:
    """out[n] = Σ_{e→n} softmax_e(t·m_e)·m_e per channel.

    grad_weights=False reproduces the reference's `torch.no_grad()` softmax weights
    (`torch_message.py:51-58`): d out/d m = w only, d out/d t = 0.
    """
    out, _, _ = _softmax_agg_call(msgs, receivers, row_ptr, t, interpret)
    return out


def _softmax_fwd(msgs, receivers, row_ptr, t, grad_weights, interpret):
    out, den, cmax = _softmax_agg_call(msgs, receivers, row_ptr, t, interpret)
    return out, (msgs, receivers, t, out, den, cmax)


def _softmax_bwd(grad_weights, interpret, res, g):
    msgs, receivers, t, out, den, cmax = res
    n_pad = den.shape[0]
    r_safe = jnp.minimum(receivers, n_pad - 1)
    valid = (receivers < n_pad)[:, None]
    t_f = jnp.asarray(t, jnp.float32)
    t_s = t_f.reshape(()) if t_f.ndim else t_f
    m = msgs.astype(jnp.float32)
    den_e = jnp.take(den, r_safe, axis=0)
    w = jnp.exp(m * t_s - cmax[None, :]) / jnp.where(den_e > 0, den_e, 1.0)
    w = jnp.where(valid, w, 0.0)
    g_e = jnp.take(g.astype(jnp.float32), r_safe, axis=0)
    if grad_weights:
        out_e = jnp.take(out.astype(jnp.float32), r_safe, axis=0)
        dm = g_e * w * (1.0 + t_s * (m - out_e))
        dt = jnp.sum(g_e * w * m * (m - out_e))
    else:
        dm = g_e * w
        dt = jnp.zeros((), jnp.float32)
    dm = jnp.where(valid, dm, 0.0).astype(msgs.dtype)
    return dm, None, None, jnp.broadcast_to(dt, jnp.shape(t)).astype(jnp.float32)


gen_softmax_aggregate_csr.defvjp(_softmax_fwd, _softmax_bwd)
