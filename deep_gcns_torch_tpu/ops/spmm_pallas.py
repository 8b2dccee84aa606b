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

Pipelining: all kernels share a streamed-edge skeleton.  The edge stream is a single
global sequence of CHUNK tiles; VMEM holds ``NBUF`` tile slots (persistent scratch —
it survives across grid steps) and SMEM tracks two global cursors, ``next_fetch`` and
``waited_upto``, so each tile is DMA'd exactly once, prefetched ``LOOKAHEAD`` tiles
ahead of consumption, and reused without re-fetch when a tile straddles two node
blocks.  This keeps the DMA engine busy while the MXU computes — the naive
start→wait→compute loop is latency-bound ~5x slower.

Kernels:
  * segment_sum_csr — sum (mean via degree outside); custom VJP (bwd = gather).
  * gen_softmax_aggregate_csr — GENConv's generalized softmax aggregation
    Σ_e softmax_e(t·m)·m fused into ONE pass over the edges, with custom VJP
    covering d/dm and d/dt (`gcn_lib/sparse/torch_message.py:49-65` semantics incl.
    the reference's stop-gradient-on-weights behavior).
  * fused_softmax_gather_agg — the full GENConv aggregation *including* the message
    function (m = relu(x_j) + ε, `gcn_lib/sparse/torch_vertex.py:78-85`) fused at the
    node-feature level.  Forward: one XLA gather x[senders] + one kernel pass that
    applies relu+ε, the stabilized exp, and both numerator/denominator one-hot dots.
    Backward never materializes or permutes edge cotangents: q = g/den is computed in
    node space, gathered once by csc_receivers, and a CSC-major kernel reconstructs
    x_j from *contiguous* sender blocks via the transposed one-hot expansion — so the
    only random-access op in the whole VJP is a single node-table gather.  Residuals
    are node-sized (den, cmax), not edge-sized — O(N) memory per layer.
    Without edge embeddings the backward goes further: the message is a NODE-level
    function of x, so the VJP factors into node tables and ONE transposed SpMM
    (gather + plain CSC segment-sum, no reconstruction dots, no per-edge exp) —
    see the node-factored branch in `_fused_bwd`.

Stability: softmax per (node, channel) is invariant to subtracting any per-node
constant. We subtract a per-channel GLOBAL score upper bound (one cheap reduction),
so exp ≤ 1 everywhere and the kernel needs no per-node max pass. This is exact
unless a node's max score lags the global bound by > ~85 (f32 exp underflow) — with
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

BN = 128        # node rows per block
CHUNK = 512     # minimum edge-tile alignment (route checks gate on this)
CHUNK_WIDE = 1024  # preferred tile when e_pad allows (fewer loop iterations:
                   # measured ~5% faster backward at bench shapes)
NBUF = 6       # default VMEM tile slots (persistent across grid steps)
VMEM_STREAM_BUDGET = 6 * 1024 * 1024  # bytes for stream slots (of ~16MB VMEM)


def _pick_chunk(e_pad: int, *specs) -> int:
    """Edge-tile size for this call: the wide tile when alignment allows and at
    least 4 slots of every stream array still fit the VMEM budget."""
    if e_pad % CHUNK_WIDE:
        return CHUNK
    slot = sum(CHUNK_WIDE * w * jnp.dtype(dt).itemsize for w, dt in specs) \
        + CHUNK_WIDE * 4
    return CHUNK_WIDE if 4 * slot <= VMEM_STREAM_BUDGET else CHUNK


def _pick_nbuf(specs, chunk: int = CHUNK) -> int:
    """Tile slots per stream array, shrunk for wide packed tables so the scratch
    stays inside the scoped-VMEM limit (lookahead = nbuf - 2 shrinks with it)."""
    slot = sum(chunk * w * jnp.dtype(dt).itemsize for w, dt in specs) + chunk * 4
    return max(3, min(NBUF, VMEM_STREAM_BUDGET // max(slot, 1)))


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


def _dot_t(a, b):
    """aᵀ @ b for a [BN, CHUNK], b [BN, C] → [CHUNK, C] (contract dim 0)."""
    prec = (jax.lax.Precision.DEFAULT if a.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        precision=prec,
        preferred_element_type=jnp.float32)


def _out_struct(shape, dtype, like):
    """ShapeDtypeStruct carrying the input's varying-mesh-axes type so these
    kernels compose inside `shard_map` (check_vma) without disabling the
    replication checker — outside shard_map this is a plain struct."""
    vma = getattr(jax.typeof(like), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def _pad_lanes(msgs):
    """Mosaic DMA requires 128-aligned channel dims; zero lanes are exact no-ops
    for the sums/softmax numerators these kernels compute."""
    c = msgs.shape[1]
    pad = (-c) % 128
    return (jnp.pad(msgs, ((0, 0), (0, pad))) if pad else msgs), c


# ---------------------------------------------------------------------------
# streamed-edge skeleton
# ---------------------------------------------------------------------------

def _edge_stream_kernel(compute_chunk, row_ptr, edge_hbm_refs, scratch_bufs,
                        smem, sems, init_carry, *, n_pad,
                        on_first_wait=None, before_issue=None, finalize=None):
    nbuf = scratch_bufs[0].shape[0]  # slot count set by _stream_scratch
    chunk = scratch_bufs[-1].shape[2]  # ids buffer [nbuf, 1, chunk]
    lookahead = nbuf - 2
    """Shared pipelined skeleton: iterate this block's chunk range over the global
    edge-tile stream, prefetching LOOKAHEAD ahead and reusing straddling tiles.

    compute_chunk(slot, base, carry) -> carry consumes one resident tile.
    Returns the final carry for this block.
    """
    i = pl.program_id(0)
    base = i * BN
    start = row_ptr[base]
    end = row_ptr[jnp.minimum(base + BN, n_pad)]
    e_total = row_ptr[n_pad]
    last = jnp.maximum((e_total - 1) // chunk, 0)

    # ids arrays are [1, E_pad] rows; data arrays are [E_pad, C]
    _ids_flags = [r.shape[0] == 1 for r in edge_hbm_refs]

    def _issue(k):
        slot = k % nbuf
        off = k * chunk
        if before_issue is not None:
            before_issue(k)  # e.g. drain a pending write-back from this slot
        for ref, buf, sem, is_ids in zip(edge_hbm_refs, scratch_bufs, sems,
                                         _ids_flags):
            if is_ids:
                pltpu.make_async_copy(ref.at[:, pl.ds(off, chunk)], buf.at[slot],
                                      sem.at[slot]).start()
            else:
                pltpu.make_async_copy(ref.at[pl.ds(off, chunk), :], buf.at[slot],
                                      sem.at[slot]).start()

    def _wait(k):
        slot = k % nbuf
        off = k * chunk
        for ref, buf, sem, is_ids in zip(edge_hbm_refs, scratch_bufs, sems,
                                         _ids_flags):
            if is_ids:
                pltpu.make_async_copy(ref.at[:, pl.ds(off, chunk)], buf.at[slot],
                                      sem.at[slot]).wait()
            else:
                pltpu.make_async_copy(ref.at[pl.ds(off, chunk), :], buf.at[slot],
                                      sem.at[slot]).wait()

    @pl.when(i == 0)
    def _():
        # smem[0] = next_fetch, smem[1] = waited_upto; extra entries belong to the
        # caller (e.g. write-pending flags) and must start zeroed too.
        for j in range(smem.shape[0]):
            smem[j] = 0

        @pl.when(e_total > 0)
        def _():
            def warm(j, _):
                @pl.when(j <= last)
                def _():
                    _issue(j)
                    smem[0] = j + 1
                return 0

            jax.lax.fori_loop(0, lookahead + 1, warm, 0)

    c0 = start // chunk
    nchunks = jnp.where(end > start, ((end - 1) // chunk) - c0 + 1, 0)

    def body(j, carry):
        k = c0 + j
        # guarded prefetch (consumption cursor advances ≤1/step, 2 attempts keep
        # the invariant next_fetch ≥ min(k + lookahead, last) + 1)
        for _ in range(2):
            nf = smem[0]

            @pl.when((nf <= k + lookahead) & (nf <= last))
            def _():
                _issue(nf)
                smem[0] = nf + 1

        wu = smem[1]

        @pl.when(k >= wu)
        def _():
            _wait(k)
            if on_first_wait is not None:
                on_first_wait(k)  # e.g. flush chunk k-1, zero chunk k's write buf
            smem[1] = k + 1

        return compute_chunk(k % nbuf, base, carry)

    out = jax.lax.fori_loop(0, nchunks, body, init_carry)
    if finalize is not None:
        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            finalize()
    return out


def _row_ids(base):
    return jax.lax.broadcasted_iota(jnp.int32, (BN, 1), 0) + base


def _stream_scratch(specs, smem_extra=0, nbuf=None, chunk=CHUNK):
    """Scratch shapes for the skeleton: one [nbuf, chunk, width] buffer per
    (width, dtype) edge-data spec, one [nbuf, 1, chunk] id buffer, SMEM cursors
    (+ smem_extra caller slots), DMA semaphores."""
    if nbuf is None:
        nbuf = _pick_nbuf(specs, chunk)
    bufs = [pltpu.VMEM((nbuf, chunk, w), dt) for w, dt in specs]
    bufs.append(pltpu.VMEM((nbuf, 1, chunk), jnp.int32))
    sems = [pltpu.SemaphoreType.DMA((nbuf,)) for _ in range(len(specs) + 1)]
    return bufs + [pltpu.SMEM((2 + smem_extra,), jnp.int32)] + sems


# ---------------------------------------------------------------------------
# segment sum
# ---------------------------------------------------------------------------

def _seg_sum_kernel(row_ptr, msgs_hbm, recv_hbm, out_ref,
                    m_buf, r_buf, smem, sem_m, sem_r, *, n_pad, c):
    def compute(slot, base, acc):
        onehot_t = (r_buf[slot] == _row_ids(base)).astype(m_buf.dtype)
        return acc + _dot(onehot_t, m_buf[slot])

    acc = _edge_stream_kernel(compute, row_ptr, [msgs_hbm, recv_hbm],
                              [m_buf, r_buf], smem, [sem_m, sem_r],
                              jnp.zeros((BN, c), jnp.float32), n_pad=n_pad)
    out_ref[:, :] = acc.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def segment_sum_csr(msgs: Array, receivers: Array, row_ptr: Array,
                    interpret: bool = False) -> Array:
    """Sum msgs [E_pad, C] into [N_pad, C]. receivers sorted (sentinel-padded),
    row_ptr [N_pad+1]; E_pad % CHUNK == 0, N_pad % BN == 0."""
    return _segment_sum_impl(msgs, receivers, row_ptr, interpret)


def _segment_sum_impl(msgs, receivers, row_ptr, interpret):
    if interpret == "xla":
        # pure-XLA fallback (shard_map CPU-mesh tests — see band._band_call_xla);
        # sentinel receivers are out of range and dropped by segment_sum
        return jax.ops.segment_sum(msgs, receivers, row_ptr.shape[0] - 1,
                                   indices_are_sorted=True)
    msgs, c_orig = _pad_lanes(msgs)
    e_pad, c = msgs.shape
    n_pad = row_ptr.shape[0] - 1
    assert e_pad % CHUNK == 0 and n_pad % BN == 0, (e_pad, n_pad)
    chunk = _pick_chunk(e_pad, (c, msgs.dtype))
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
            scratch_shapes=_stream_scratch([(c, msgs.dtype)], chunk=chunk),
        ),
        out_shape=_out_struct((n_pad, c), msgs.dtype, msgs),
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
# fused generalized softmax aggregation over materialized messages
# ---------------------------------------------------------------------------

def _softmax_agg_kernel(row_ptr, t_smem, *refs, n_pad, c, relu_eps, has_ee):
    if has_ee:
        (msgs_hbm, ee_hbm, recv_hbm, cmax_ref, out_ref, den_ref,
         m_buf, e_buf, r_buf, smem, sem_m, sem_e, sem_r) = refs
        hbm = [msgs_hbm, ee_hbm, recv_hbm]
        bufs = [m_buf, e_buf, r_buf]
        sems = [sem_m, sem_e, sem_r]
    else:
        (msgs_hbm, recv_hbm, cmax_ref, out_ref, den_ref,
         m_buf, r_buf, smem, sem_m, sem_r) = refs
        hbm = [msgs_hbm, recv_hbm]
        bufs = [m_buf, r_buf]
        sems = [sem_m, sem_r]
    t = t_smem[0]
    cmax = cmax_ref[0:1, :]
    cd = msgs_hbm.dtype

    def compute(slot, base, carry):
        num, den = carry
        onehot_t = (r_buf[slot] == _row_ids(base)).astype(cd)
        m = m_buf[slot].astype(jnp.float32)
        if has_ee:
            m = m + e_buf[slot].astype(jnp.float32)
        if relu_eps is not None:
            m = jax.nn.relu(m) + relu_eps
        e = jnp.exp(m * t - cmax)  # ≤ 1
        rhs = jnp.concatenate([e * m, e], axis=1).astype(cd)  # [CHUNK, 2C]
        acc = _dot(onehot_t, rhs)
        return num + acc[:, :c], den + acc[:, c:]

    num = jnp.zeros((BN, c), jnp.float32)
    den = jnp.zeros((BN, c), jnp.float32)
    num, den = _edge_stream_kernel(
        compute, row_ptr, hbm, bufs, smem, sems, (num, den), n_pad=n_pad)
    out_ref[:, :] = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0),
                              0.0).astype(out_ref.dtype)
    den_ref[:, :] = den.astype(den_ref.dtype)


def _softmax_agg_pallas(msgs, recv_row, row_ptr, t_arr, cmax8, interpret,
                        relu_eps=None, ee=None):
    e_pad, c = msgs.shape
    n_pad = row_ptr.shape[0] - 1
    assert e_pad % CHUNK == 0 and n_pad % BN == 0, (e_pad, n_pad)
    has_ee = ee is not None
    kernel = functools.partial(_softmax_agg_kernel, n_pad=n_pad, c=c,
                               relu_eps=relu_eps, has_ee=has_ee)
    edge_inputs = [msgs] + ([ee] if has_ee else []) + [recv_row]
    buf_specs = [(c, msgs.dtype)] + ([(c, ee.dtype)] if has_ee else [])
    chunk = _pick_chunk(e_pad, *buf_specs)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,   # row_ptr, t
            grid=(n_pad // BN,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(edge_inputs) + [
                pl.BlockSpec((8, c), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((BN, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BN, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=_stream_scratch(buf_specs, chunk=chunk),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, c), msgs.dtype),
            # den follows the message dtype: an f32 den residual costs an extra
            # 87MB/layer of stacked-scan HBM traffic at arxiv scale; bf16 den
            # perturbs each node's incoming-edge gradients by ≤0.4% (uniform
            # per-node scale), f32 inputs keep the exact f32 den.
            jax.ShapeDtypeStruct((n_pad, c), msgs.dtype),
        ),
        interpret=interpret,
    )(row_ptr, t_arr, *edge_inputs, cmax8)


def _softmax_agg_call(msgs, receivers, row_ptr, t, interpret):
    msgs, c_orig = _pad_lanes(msgs)
    e_pad, c = msgs.shape
    n_pad = row_ptr.shape[0] - 1
    recv_row = receivers.reshape(1, e_pad)
    t_arr = jnp.asarray(t, jnp.float32).reshape(1)
    # per-channel global score max (one cheap XLA reduction; padding excluded)
    valid = (receivers < n_pad)[:, None]
    scores = jnp.where(valid, msgs.astype(jnp.float32) * t_arr[0], -jnp.inf)
    cmax = jnp.max(scores, axis=0)
    cmax = jnp.where(jnp.isfinite(cmax), cmax, 0.0)
    cmax = jax.lax.stop_gradient(cmax)
    cmax8 = jnp.broadcast_to(cmax[None, :], (8, c))
    out, den = _softmax_agg_pallas(msgs, recv_row, row_ptr, t_arr, cmax8, interpret)
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
    # `out` is only consumed by the grad_weights branch of the backward; keeping
    # it in the residuals unconditionally stacks a dead [L, N, C] array across
    # lax.scan (custom_vjp residuals are opaque to DCE).
    return out, (msgs, receivers, t, out if grad_weights else None, den, cmax)


def _softmax_bwd(grad_weights, interpret, res, g):
    msgs, receivers, t, out, den, cmax = res
    n_pad = den.shape[0]
    r_safe = jnp.minimum(receivers, n_pad - 1)
    valid = (receivers < n_pad)[:, None]
    t_f = jnp.asarray(t, jnp.float32)
    t_s = t_f.reshape(()) if t_f.ndim else t_f
    m = msgs.astype(jnp.float32)
    den_e = jnp.take(den, r_safe, axis=0).astype(jnp.float32)
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


# ---------------------------------------------------------------------------
# fully fused gather + message (relu+ε) + softmax aggregation at the x level
# ---------------------------------------------------------------------------

def _softmax_bwd_csc_kernel(col_ptr, t_smem, *refs, n_pad, c, eps, grad_weights,
                            has_ee):
    """CSC-major backward: grid over SENDER blocks; x rows arrive as a contiguous
    VMEM block; per-edge x_j is reconstructed with the transposed one-hot dot.

    qg: q[csc_receivers] (and, when grad_weights, also out[csc_receivers] in the
    second half of the channel axis), streamed in CSC edge order.

    When has_ee, the pre-encoded edge embeddings are streamed in CSC order and the
    kernel additionally emits d(edge_emb) in CSC order: contributions accumulate
    into a per-chunk VMEM buffer (zeroed when the chunk is first waited on; blocks
    touching a straddling chunk write disjoint edge ranges) and the buffer is
    DMA-flushed to HBM once the consumption cursor moves past the chunk.  The dee
    output must arrive pre-zeroed (input_output_aliased) so the unconsumed padding
    tail stays zero.
    """
    if has_ee:
        (qg_hbm, ee_hbm, send_hbm, dee_zeros, x_ref, cmax_ref,
         dx_ref, dt_ref, dee_hbm,
         q_buf, e_buf, s_buf, smem, sem_q, sem_e, sem_s,
         dee_buf, wsem) = refs
        hbm = [qg_hbm, ee_hbm, send_hbm]
        bufs = [q_buf, e_buf, s_buf]
        sems = [sem_q, sem_e, sem_s]
        del dee_zeros  # aliased to dee_hbm
    else:
        (qg_hbm, send_hbm, x_ref, cmax_ref, dx_ref, dt_ref,
         q_buf, s_buf, smem, sem_q, sem_s) = refs
        hbm = [qg_hbm, send_hbm]
        bufs = [q_buf, s_buf]
        sems = [sem_q, sem_s]
    t = t_smem[0]
    cmax = cmax_ref[0:1, :]
    cd = qg_hbm.dtype
    x_blk = x_ref[:, :]  # [BN, C] this sender block's features (contiguous)

    # --- dee write-back hooks (active only with edge embeddings) ---------------
    WP = 2  # smem offset of the per-slot write-pending flags

    def _dee_flush(k):
        chunk = dee_buf.shape[1]
        slot = k % dee_buf.shape[0]
        pltpu.make_async_copy(dee_buf.at[slot],
                              dee_hbm.at[pl.ds(k * chunk, chunk), :],
                              wsem.at[slot]).start()
        smem[WP + slot] = 1

    def _dee_drain(slot):
        chunk = dee_buf.shape[1]

        @pl.when(smem[WP + slot] == 1)
        def _():
            pltpu.make_async_copy(dee_buf.at[slot],
                                  dee_hbm.at[pl.ds(0, chunk), :],
                                  wsem.at[slot]).wait()
            smem[WP + slot] = 0

    def on_first_wait(k):
        # chunk k-1 is fully contributed (all its consumer blocks ran): flush it.
        @pl.when(k >= 1)
        def _():
            _dee_flush(k - 1)
        dee_buf[k % dee_buf.shape[0]] = jnp.zeros((dee_buf.shape[1], c),
                                                  dee_buf.dtype)

    def before_issue(k):
        _dee_drain(k % dee_buf.shape[0])

    def finalize():
        wu = smem[1]

        @pl.when(wu > 0)
        def _():
            _dee_flush(wu - 1)
        for s in range(dee_buf.shape[0]):
            _dee_drain(s)

    def compute(slot, base, carry):
        dx, dt = carry
        onehot_t = (s_buf[slot] == _row_ids(base)).astype(cd)  # [BN, CHUNK]
        xj = _dot_t(onehot_t, x_blk)  # [CHUNK, C] f32 — zeros for foreign edges
        if has_ee:
            xj = xj + e_buf[slot].astype(jnp.float32)
        m = jax.nn.relu(xj) + eps
        e = jnp.exp(m * t - cmax)
        q_all = q_buf[slot].astype(jnp.float32)
        q = q_all[:, :c]
        # restrict to this block's own edges (foreign/sentinel rows are garbage)
        mine = jnp.sum(onehot_t.astype(jnp.float32), axis=0)[:, None]  # [CHUNK, 1]
        if grad_weights:
            out_e = q_all[:, c:]
            dm = q * e * (1.0 + t * (m - out_e))
            dt = dt + jnp.sum(mine * q * e * m * (m - out_e))
        else:
            dm = q * e
        dxj = jnp.where(xj > 0, dm, 0.0)  # relu'
        dx = dx + _dot(onehot_t, dxj.astype(cd))
        if has_ee:
            dee_buf[slot] = dee_buf[slot] + (dxj * mine).astype(dee_buf.dtype)
        return dx, dt

    dx = jnp.zeros((BN, c), jnp.float32)
    dt0 = jnp.zeros((), jnp.float32)
    dx, dt = _edge_stream_kernel(
        compute, col_ptr, hbm, bufs, smem, sems, (dx, dt0), n_pad=n_pad,
        on_first_wait=on_first_wait if has_ee else None,
        before_issue=before_issue if has_ee else None,
        finalize=finalize if has_ee else None)
    dx_ref[:, :] = dx.astype(dx_ref.dtype)
    pos = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
           + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1))
    dt_ref[:, :] = jnp.where(pos == 0, dt, 0.0)


def _fused_bwd_pallas(qg, csc_senders, csc_col_ptr, x, t_arr, cmax8, interpret,
                      eps, grad_weights, ee_csc=None):
    e_pad = qg.shape[0]
    n_pad = csc_col_ptr.shape[0] - 1
    c = x.shape[1]
    assert e_pad % CHUNK == 0 and n_pad % BN == 0, (e_pad, n_pad)
    has_ee = ee_csc is not None
    send_row = csc_senders.reshape(1, e_pad)
    kernel = functools.partial(_softmax_bwd_csc_kernel, n_pad=n_pad, c=c, eps=eps,
                               grad_weights=grad_weights, has_ee=has_ee)
    qdt = qg.dtype
    edge_inputs = [qg] + ([ee_csc] if has_ee else []) + [send_row]
    num_edge = len(edge_inputs)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * num_edge
    inputs = list(edge_inputs)
    io_aliases = {}
    if has_ee:
        # pre-zeroed buffer aliased to the dee output (keeps the padding tail 0)
        inputs.append(jnp.zeros((e_pad, c), ee_csc.dtype))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        # alias keys index the flattened operands INCLUDING the 2 scalar-prefetch
        # args (col_ptr, t): zeros input -> dee output (output index 2)
        io_aliases = {2 + num_edge: 2}
    in_specs += [
        pl.BlockSpec((BN, c), lambda i, *_: (i, 0),
                     memory_space=pltpu.VMEM),  # x block
        pl.BlockSpec((8, c), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((BN, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_pad, c), x.dtype),
        jax.ShapeDtypeStruct((n_pad // BN * 8, 128), jnp.float32),
    ]
    buf_specs = [(qg.shape[1], qdt)] + ([(c, ee_csc.dtype)] if has_ee else [])
    # the dee write-back buffer shares the stream's slot rotation — same count
    all_specs = buf_specs + ([(c, ee_csc.dtype)] if has_ee else [])
    chunk = _pick_chunk(e_pad, *all_specs)
    nbuf = _pick_nbuf(all_specs, chunk)
    scratch = _stream_scratch(buf_specs, smem_extra=nbuf if has_ee else 0,
                              nbuf=nbuf, chunk=chunk)
    if has_ee:
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(jax.ShapeDtypeStruct((e_pad, c), ee_csc.dtype))
        scratch += [pltpu.VMEM((nbuf, chunk, c), ee_csc.dtype),
                    pltpu.SemaphoreType.DMA((nbuf,))]

    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,   # csc_col_ptr, t
            grid=(n_pad // BN,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=scratch,
        ),
        out_shape=tuple(out_shape),
        input_output_aliases=io_aliases,
        interpret=interpret,
    )(csc_col_ptr, t_arr, *inputs, x, cmax8)
    if has_ee:
        dx, dtp, dee = res
    else:
        (dx, dtp), dee = res, None
    return dx, jnp.sum(dtp[::8, 0]), dee


def _fused_cmax(x, t_arr, eps, c, ee=None):
    """Per-channel upper bound on the softmax scores t·(relu(x_j [+e_e])+ε),
    computed from node-space (and, with edge embeddings, one edge-space) channel
    maxima (padding rows are harmless: relu ≥ 0 and senders are valid rows).
    Any constant ≥ max keeps exp ≤ 1; shift-invariance keeps the result exact."""
    t0 = t_arr[0]
    m_ub = jnp.max(jax.nn.relu(x.astype(jnp.float32)), axis=0)
    if ee is not None:
        # relu(a+b) ≤ relu(max a + max b) per channel
        m_ub = jax.nn.relu(m_ub + jnp.max(ee.astype(jnp.float32), axis=0))
    m_ub = m_ub + eps
    cmax = jnp.where(t0 > 0, t0 * m_ub, t0 * eps)
    cmax = jax.lax.stop_gradient(cmax)
    return cmax, jnp.broadcast_to(cmax[None, :], (8, c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def fused_softmax_gather_agg(x: Array, senders: Array, receivers: Array,
                             row_ptr: Array, csc_senders: Array,
                             csc_receivers: Array, csc_col_ptr: Array, t: Array,
                             ee: Array | None = None, ee_csc: Array | None = None,
                             eps: float = 1e-7, grad_weights: bool = False,
                             interpret: bool = False) -> Array:
    """GENConv aggregation fused at the node level:

        out[n] = Σ_{e: recv=n} softmax_e(t·m_e)·m_e,   m_e = relu(x[send_e] + e_e) + ε

    (`gcn_lib/sparse/torch_vertex.py:78-85` message + `torch_message.py:44-58`
    softmax aggregation.)  x must be lane-aligned (C % 128 == 0); caller pads.

    Edge embeddings are supplied in BOTH edge orders: ``ee`` (receiver-sorted, used
    by the forward) and ``ee_csc`` (sender-sorted, used by the backward).  Encode
    ``graph.edge_attr`` and ``graph.edge_attr_csc`` separately to produce them —
    never permute on device.  The VJP routes the whole edge-embedding cotangent to
    ``ee_csc`` (in CSC order) and returns a symbolic zero for ``ee``; the two are
    the same values, so total gradients through the encoder are exact.  Pass
    ``ee = lax.stop_gradient(ee)`` to avoid a dead encoder-VJP branch.
    """
    out, _, _ = _fused_fwd_call(x, senders, receivers, row_ptr, t, ee, eps,
                                interpret)
    return out


def _fused_fwd_call(x, senders, receivers, row_ptr, t, ee, eps, interpret):
    e_pad = receivers.shape[0]
    n_pad = row_ptr.shape[0] - 1
    c = x.shape[1]
    assert c % 128 == 0, "fused path requires lane-aligned channels"
    t_arr = jnp.asarray(t, jnp.float32).reshape(1)
    cmax, cmax8 = _fused_cmax(x, t_arr, eps, c, ee)
    xj = jnp.take(x, jnp.minimum(senders, n_pad - 1), axis=0)
    recv_row = receivers.reshape(1, e_pad)
    out, den = _softmax_agg_pallas(xj, recv_row, row_ptr, t_arr, cmax8, interpret,
                                   relu_eps=eps, ee=ee)
    return out, den, cmax


def _fused_fwd(x, senders, receivers, row_ptr, csc_senders, csc_receivers,
               csc_col_ptr, t, ee, ee_csc, eps, grad_weights, interpret):
    out, den, cmax = _fused_fwd_call(x, senders, receivers, row_ptr, t, ee, eps,
                                     interpret)
    # drop `out` from the residuals unless the backward's grad_weights branch
    # needs it — custom_vjp residuals are opaque to DCE, so a dead entry stacks
    # a whole [L, N, C] array across lax.scan.
    return out, (x, csc_senders, csc_receivers, csc_col_ptr, t, ee_csc,
                 out if grad_weights else None, den, cmax)


def _fused_bwd(eps, grad_weights, interpret, res, g):
    x, csc_senders, csc_receivers, csc_col_ptr, t, ee_csc, out, den, cmax = res
    n_pad = den.shape[0]
    c = x.shape[1]
    t_arr = jnp.asarray(t, jnp.float32).reshape(1)
    # node-space cotangent-over-denominator; zero where a row had no (valid) edges
    den = den.astype(jnp.float32)
    q = jnp.where(den > 0, g.astype(jnp.float32) / jnp.where(den > 0, den, 1.0), 0.0)
    r_safe = jnp.minimum(csc_receivers, n_pad - 1)

    if ee_csc is None:
        # Node-factored backward: without edge embeddings the message
        # m_e = relu(x[send_e]) + ε is a NODE-level function, so the whole VJP
        # factors into node tables (M, E below) and ONE transposed SpMM:
        #
        #   softmax_sg:  dx = relu'(x) ⊙ E ⊙ (Aᵀ q)
        #   learn_t:     dx = relu'(x) ⊙ E ⊙ [(1 + t·M)·S₁ − t·S₂],
        #                dt = Σ E⊙M⊙(M⊙S₁ − S₂),   [S₁|S₂] = Aᵀ [q | q⊙out]
        #
        # This replaces the CSC reconstruction kernel (2 one-hot dots + per-edge
        # exp) with one gather + one plain CSC segment-sum — ~2.5 ms/layer less
        # at bench shape (2.54M edges × 128 ch).  Math matches the edge-space
        # formula in `_softmax_bwd_csc_kernel` exactly (same reference semantics,
        # `gcn_lib/sparse/torch_message.py:44-58`).
        m_node = jax.nn.relu(x.astype(jnp.float32)) + eps
        e_node = jnp.exp(m_node * t_arr[0] - cmax[None, :])
        if grad_weights:
            qo = jnp.concatenate([q, q * out.astype(jnp.float32)], axis=1)
        else:
            qo = q
        qg = jnp.take(qo.astype(x.dtype), r_safe, axis=0)
        # padding edges: sentinel csc_senders match no one-hot row in the kernel
        s_all = segment_sum_csr(qg, csc_senders, csc_col_ptr,
                                interpret).astype(jnp.float32)
        if grad_weights:
            s1, s2 = s_all[:, :c], s_all[:, c:]
            dm = e_node * ((1.0 + t_arr[0] * m_node) * s1 - t_arr[0] * s2)
            dt = jnp.sum(e_node * m_node * (m_node * s1 - s2))
        else:
            dm = e_node * s_all
            dt = jnp.zeros((), jnp.float32)
        dx = jnp.where(x > 0, dm, 0.0).astype(x.dtype)
        dt = jnp.broadcast_to(dt, jnp.shape(t)).astype(jnp.float32)
        return dx, None, None, None, None, None, None, dt, None, None

    cmax8 = jnp.broadcast_to(cmax[None, :], (8, c))
    if grad_weights:
        qo = jnp.concatenate([q, out.astype(jnp.float32)], axis=1)
    else:
        qo = q
    qo = qo.astype(x.dtype)
    qg = jnp.take(qo, r_safe, axis=0)
    # padding edges: sentinel senders match no one-hot row — no masking needed
    dx, dt, dee_csc = _fused_bwd_pallas(qg, csc_senders, csc_col_ptr, x, t_arr,
                                        cmax8, interpret, eps, grad_weights,
                                        ee_csc=ee_csc)
    if not grad_weights:
        dt = jnp.zeros((), jnp.float32)
    dt = jnp.broadcast_to(dt, jnp.shape(t)).astype(jnp.float32)
    return dx, None, None, None, None, None, None, dt, jnp.zeros_like(ee_csc), dee_csc


fused_softmax_gather_agg.defvjp(_fused_fwd, _fused_bwd)


def fused_softmax_gather_agg_auto(x, senders, receivers, row_ptr, csc_senders,
                                  csc_receivers, csc_col_ptr, t, ee=None,
                                  ee_csc=None, eps: float = 1e-7,
                                  grad_weights: bool = False,
                                  interpret: bool = False):
    """Lane-padding wrapper: pads channels up to a 128 multiple (Mosaic DMA
    requirement), runs the fused op, slices back.  Zero lanes are exact no-ops
    for relu/exp/softmax (they contribute constant columns that are sliced off),
    and `jnp.pad`'s VJP slices the cotangent — gradients are exact.  Worth it up
    to 2x padding overhead (use `fused_gather_ok` to route)."""
    c = x.shape[1]
    pad = (-c) % 128
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
        if ee is not None:
            ee = jnp.pad(ee, ((0, 0), (0, pad)))
            ee_csc = jnp.pad(ee_csc, ((0, 0), (0, pad)))
    out = fused_softmax_gather_agg(x, senders, receivers, row_ptr, csc_senders,
                                   csc_receivers, csc_col_ptr, t, ee, ee_csc,
                                   eps, grad_weights, interpret)
    return out[:, :c] if pad else out


# ---------------------------------------------------------------------------
# fused GAT attention + SpMM (DGL edge_softmax + u_mul_e sum, attn-dst-free)
# ---------------------------------------------------------------------------
#
# RevGAT's headline config (`ogb_eff/ogbn_arxiv_dgl/main.py:358,440` no_attn_dst)
# scores every edge from its SOURCE only: s_e = leaky_relu(el[send_e]).  That makes
# the whole layer one packed-table problem: T = [feat_src | el] is gathered once by
# senders; the CSR forward computes e = exp(s - cmax), the per-head weighted
# payload, and both one-hot dots, emitting agg = [num | den] in the same packed
# layout; the CSC backward reconstructs T_e from contiguous sender blocks and emits
# dT packed.  Renormalizing edge-drop (`model_rev.py:154-176` semantics) costs
# nothing in-kernel: dropped edges get sentinel receiver ids (excluded from num AND
# den), and the backward zeroes their gathered cotangents.


def _head_expand(e, h, hd):
    """[CHUNK, H] → [CHUNK, HD]: repeat each head's scalar across its payload
    block (lane broadcasts — exact, no MXU)."""
    d = hd // h
    return jnp.concatenate(
        [jnp.broadcast_to(e[:, k:k + 1], (e.shape[0], d)) for k in range(h)],
        axis=1)


def _head_reduce(x, h, hd):
    """[CHUNK, HD] → [CHUNK, H]: sum each head's payload block (lane reductions)."""
    d = hd // h
    return jnp.concatenate(
        [jnp.sum(x[:, k * d:(k + 1) * d], axis=1, keepdims=True)
         for k in range(h)], axis=1)


def _gat_fwd_kernel(row_ptr, t_hbm, recv_hbm, cmax_ref, out_ref,
                    t_buf, r_buf, smem, sem_t, sem_r, *, n_pad, pp, hd, h,
                    neg_slope):
    cmax = cmax_ref[0:1, :h]
    cd = t_hbm.dtype

    def compute(slot, base, acc):
        onehot_t = (r_buf[slot] == _row_ids(base)).astype(cd)
        te = t_buf[slot].astype(jnp.float32)     # [CHUNK, Pp]
        el = te[:, hd:hd + h]
        s = jnp.where(el >= 0, el, neg_slope * el)
        e = jnp.exp(s - cmax)                    # ≤ 1
        e_w = _head_expand(e, h, hd)             # [CHUNK, HD]
        rhs = jnp.concatenate(
            [e_w * te[:, :hd], e,
             jnp.zeros((te.shape[0], pp - hd - h), jnp.float32)],
            axis=1).astype(cd)
        return acc + _dot(onehot_t, rhs)

    acc = _edge_stream_kernel(
        compute, row_ptr, [t_hbm, recv_hbm], [t_buf, r_buf], smem,
        [sem_t, sem_r], jnp.zeros((BN, pp), jnp.float32), n_pad=n_pad)
    out_ref[:, :] = acc.astype(out_ref.dtype)


def _gat_bwd_kernel(col_ptr, qg_hbm, send_hbm, x_ref, cmax_ref, dt_ref,
                    q_buf, s_buf, smem, sem_q, sem_s, *, n_pad, pp, hd, h,
                    neg_slope):
    cmax = cmax_ref[0:1, :h]
    cd = qg_hbm.dtype
    t_blk = x_ref[:, :]

    def compute(slot, base, acc):
        onehot_t = (s_buf[slot] == _row_ids(base)).astype(cd)
        te = _dot_t(onehot_t, t_blk)             # [CHUNK, Pp] f32
        msg, el = te[:, :hd], te[:, hd:hd + h]
        s = jnp.where(el >= 0, el, neg_slope * el)
        e = jnp.exp(s - cmax)
        qg = q_buf[slot].astype(jnp.float32)     # keep-zeroed [ĝnum | ĝden]
        gnum, gden = qg[:, :hd], qg[:, hd:hd + h]
        per_head = _head_reduce(msg * gnum, h, hd)  # [CHUNK, H]
        de = per_head + gden
        del_ = de * e * jnp.where(el >= 0, 1.0, neg_slope)
        dmsg = _head_expand(e, h, hd) * gnum
        contrib = jnp.concatenate(
            [dmsg, del_, jnp.zeros((te.shape[0], pp - hd - h), jnp.float32)],
            axis=1).astype(cd)
        return acc + _dot(onehot_t, contrib)

    acc = _edge_stream_kernel(
        compute, col_ptr, [qg_hbm, send_hbm], [q_buf, s_buf], smem,
        [sem_q, sem_s], jnp.zeros((BN, pp), jnp.float32), n_pad=n_pad)
    dt_ref[:, :] = acc.astype(dt_ref.dtype)


def _gat_cmax(T, hd, h):
    el_max = jnp.max(T[:, hd:hd + h].astype(jnp.float32), axis=0)
    s_max = jnp.where(el_max >= 0, el_max, 0.0)  # include sentinel rows (el=0)
    return jax.lax.stop_gradient(s_max)


def _gat_call(T, recv_row, row_ptr, cmax8, hd, h, neg_slope, interpret):
    e_pad = recv_row.shape[1]
    pp = T.shape[1]
    n_pad = row_ptr.shape[0] - 1
    assert e_pad % CHUNK == 0 and n_pad % BN == 0 and pp % 128 == 0
    kernel = functools.partial(_gat_fwd_kernel, n_pad=n_pad, pp=pp, hd=hd, h=h,
                               neg_slope=neg_slope)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // BN,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((8, 128), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BN, pp), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=_stream_scratch(
                [(pp, T.dtype)], chunk=_pick_chunk(e_pad, (pp, T.dtype))),
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, pp), T.dtype),
        interpret=interpret,
    )(row_ptr, T, recv_row, cmax8)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def gat_softmax_spmm(T: Array, senders: Array, receivers_eff: Array,
                     row_ptr: Array, csc_senders: Array, csc_receivers: Array,
                     csc_col_ptr: Array, keep_csc: Array | None,
                     hd: int = 0, h: int = 1, neg_slope: float = 0.2,
                     interpret: bool = False) -> Array:
    """agg[n] = [ Σ_e e_{e,h}·msg_{e,h,d} | Σ_e e_{e,h} ] over edges into n, with
    e = exp(leaky_relu(el[send_e]) − cmax) per head; T packed [msg(HD) | el(H) | 0].

    Edge-drop: pre-fold into receivers_eff (dropped → sentinel) and pass the
    matching keep flags in CSC order (zeroes the backward's gathered cotangents).
    Normalization (num/den, self terms) happens outside in node space.
    """
    out, _ = _gat_fwd(T, senders, receivers_eff, row_ptr, csc_senders,
                      csc_receivers, csc_col_ptr, keep_csc, hd, h, neg_slope,
                      interpret)
    return out


def _gat_fwd(T, senders, receivers_eff, row_ptr, csc_senders, csc_receivers,
             csc_col_ptr, keep_csc, hd, h, neg_slope, interpret):
    e_pad = receivers_eff.shape[0]
    n_pad = row_ptr.shape[0] - 1
    cmax = _gat_cmax(T, hd, h)
    cmax8 = jnp.zeros((8, 128), jnp.float32).at[:, :h].set(
        jnp.broadcast_to(cmax[None, :], (8, h)))
    tj = jnp.take(T, jnp.minimum(senders, n_pad - 1), axis=0)
    out = _gat_call(tj, receivers_eff.reshape(1, e_pad), row_ptr, cmax8, hd, h,
                    neg_slope, interpret)
    return out, (T, csc_senders, csc_receivers, csc_col_ptr, keep_csc, cmax8)


def _gat_bwd(hd, h, neg_slope, interpret, res, g):
    T, csc_senders, csc_receivers, csc_col_ptr, keep_csc, cmax8 = res
    n_pad = csc_col_ptr.shape[0] - 1
    pp = T.shape[1]
    e_pad = csc_senders.shape[0]
    r_safe = jnp.minimum(csc_receivers, n_pad - 1)
    qg = jnp.take(g.astype(T.dtype), r_safe, axis=0)
    if keep_csc is not None:
        qg = jnp.where((keep_csc > 0)[:, None], qg, 0)
    kernel = functools.partial(_gat_bwd_kernel, n_pad=n_pad, pp=pp, hd=hd, h=h,
                               neg_slope=neg_slope)
    dT = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // BN,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((BN, pp), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BN, pp), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=_stream_scratch(
                [(pp, T.dtype)], chunk=_pick_chunk(e_pad, (pp, T.dtype))),
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, pp), T.dtype),
        interpret=interpret,
    )(csc_col_ptr, qg, csc_senders.reshape(1, e_pad), T, cmax8)
    return dT, None, None, None, None, None, None, None


gat_softmax_spmm.defvjp(
    lambda T, s, r, rp, cs, cr, cp, k, hd, h, ns, it: _gat_fwd(
        T, s, r, rp, cs, cr, cp, k, hd, h, ns, it),
    _gat_bwd)
