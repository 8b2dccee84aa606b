"""Band-dense SpMM: the gather-free aggregation path for locality-ordered graphs.

ROOFLINE.md measures XLA's row gather at ~420M rows/s REGARDLESS of index
locality (issue-rate bound), which floors the take+CSR aggregation at
~14.7 ms/layer on the bench workload.  For graphs whose edges concentrate near
the diagonal after RCM reordering (data/reorder.py), this module removes both
the gather and the per-edge one-hot VPU work of ops/blocksparse.py:

  host:   for each 128-row receiver block, pick the length-W source window
          covering the most edges; store that block's adjacency DENSELY as an
          int8 count matrix A[128, W]; edges outside the window go to a small
          leftover CSR handled by the streamed take+CSR kernel.
  kernel: grid over receiver blocks; the A block arrives by the normal Pallas
          pipeline, the x window [W, C] by a double-buffered DMA whose start is
          a prefetched scalar; out_block = A @ x_window — ONE dense MXU matmul,
          no gather, no one-hot construction.

Per-layer HBM cost at bench shape (N=169k, E=2.54M, C=128, W=512): A 87 MB
(int8) + x windows 173 MB + out 43 MB ≈ 0.35 ms at ~900 GB/s, vs 4.7 ms for the
take alone — the aggregation moves from the gather issue-rate wall to the HBM
roofline.  MXU waste (W/avg_deg ≈ 34x more MACs than edges) is free: the dots
cost ~0.2 ms at bench shape.

``band_softmax_agg`` fuses GENConv's full softmax aggregation family through
this path using the node-factored form (messages m = relu(x)+ε are node-level
functions when there are no edge embeddings, so num/den are TWO band SpMMs of
node tables and the VJP is one transposed band SpMM — the same factorization
`ops/spmm_pallas._fused_bwd` proves against the reference semantics,
`gcn_lib/sparse/torch_message.py:44-58` + `torch_vertex.py:78-85`).
Hot loop replaced: `/root/reference/gcn_lib/sparse/torch_message.py:52-58`.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spmm_pallas import CHUNK, _out_struct, segment_sum_csr

Array = jax.Array

BN = 128        # receiver rows per block (matches spmm_pallas.BN)
ALIGN = 16      # window-start alignment (bf16 sublane tile)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Band:
    """One direction's band structure (A or Aᵀ) plus its off-band leftover.

    Power-law graphs defeat a pure window band (hub senders land in every
    receiver block's window choice; hub receivers have rows no window covers),
    so a Band optionally carries two dense hub corrections — both plain MXU
    matmuls, preserving the no-gather property:

      hub columns:  out += A[:, hub_ids] @ x[hub_ids]   (top out-degree senders)
      hub rows:     out[hub_row_ids] = A[hub_row_ids, :] @ x   (top in-degree
                    receivers — their FULL rows, excluded from window/leftover)

    Cost per hub column ≈ N_pad bytes of int8 DMA + 2·N_pad·C MACs ≈ 0.4 µs at
    arxiv scale, vs deg(h)/420M s of skipped leftover gather — profitable for
    any node with degree ≳ 192 (the "auto" threshold is 256 with margin).
    """

    w_lo: Array         # [NB] int32 window start per receiver block (ALIGN-multiple)
    a: Array            # [NB*BN, W] int8 edge counts, row r = a[r], col = src - w_lo
    # off-band leftover edges, receiver-sorted CSR over the full node space
    # (sentinel-padded to a CHUNK multiple; empty → 1-chunk dummy of sentinels)
    lo_src: Array       # [E_lo_pad] int32
    lo_dst: Array       # [E_lo_pad] int32
    lo_row_ptr: Array   # [N_pad + 1] int32
    # dense hub corrections (None when the degree distribution never crosses
    # the threshold — e.g. uniform ER / kNN graphs build identical Bands)
    hub_ids: Optional[Array] = None       # [H] int32 sender ids (0-padded)
    a_hub: Optional[Array] = None         # [N_pad, H] int8 (padded cols zero)
    hub_row_ids: Optional[Array] = None   # [R] int32 receiver ids (0-padded)
    a_row: Optional[Array] = None         # [R, N_pad] int8 (padded rows zero)
    # transposed copies for the dense GAT kernels (ops/gat_dense.py): per-block
    # [W, BN] count tiles stacked [NB*W, BN], and a_hub^T [H, N_pad].  Host-
    # precomputed (an XLA int8 transpose of the 130MB arxiv-scale A costs
    # ~3.4 ms per layer call); None when built with store_transpose=False —
    # gat_dense then transposes on the fly.
    a_t: Optional[Array] = None           # [NB*W, BN] int8
    a_hub_t: Optional[Array] = None       # [H, N_pad] int8
    window: int = field(default=512, metadata=dict(static=True))
    n_edges: int = field(default=0, metadata=dict(static=True))
    n_lo: int = field(default=0, metadata=dict(static=True))
    n_hub: int = field(default=0, metadata=dict(static=True))   # edges via hub cols
    n_hub_row: int = field(default=0, metadata=dict(static=True))  # via hub rows

    @property
    def coverage(self) -> float:
        """Fraction of edges captured gather-free (window band + hub matmuls)."""
        return 1.0 - self.n_lo / max(self.n_edges, 1)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BandPair:
    """Forward (A) and transpose (Aᵀ) bands — what custom VJPs need."""

    fwd: Band
    bwd: Band


def _round_down(x: int, m: int) -> int:
    return (x // m) * m


# ---------------------------------------------------------------------------
# hash-based edge drop (renormalizing attention edge-drop through the band)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DropSpec:
    """Per-step edge-drop: each edge's keep decision is a counter-based hash
    of (recv_id, send_id, key) — reproducible from ids alone, so the band
    kernel, its TRANSPOSE (the VJP), the hub matmuls and the leftover CSR all
    agree on which edges were dropped without materializing an [E] mask, and
    a reversible inverse reusing the same key reuses the same mask.
    Multi-edges (count > 1 at one position) share one draw — a documented
    deviation, immaterial on simple graphs.  Statistical quality: a 2-round
    xorshift-multiply mixer; i.i.d.-Bernoulli-like, which already deviates
    from the reference's exact randperm subset the same way the prior
    Bernoulli keep-mask did (convs/dgl_gat.py docnote)."""

    k0: Array   # int32 scalar (from a PRNG key)
    k1: Array   # int32 scalar
    thresh: int = field(metadata=dict(static=True))   # floor(p_drop · 2³¹)


def drop_key_bits(key: Array) -> Array:
    """[2] int32 hash-key material from a jax PRNG key (bit-exact view)."""
    ks = jax.random.key_data(key).reshape(-1)[:2]
    return jax.lax.bitcast_convert_type(ks, jnp.int32)


def drop_thresh(drop_p: float) -> int:
    return min(int(drop_p * 2147483648.0), 2147483647)


def make_edge_drop(key: Array, drop_p: float) -> Optional[DropSpec]:
    """DropSpec from a jax PRNG key and a static drop rate (None if p == 0)."""
    if drop_p <= 0.0:
        return None
    kb = drop_key_bits(key)
    return DropSpec(k0=kb[0], k1=kb[1], thresh=drop_thresh(drop_p))


def _hash_keep(recv, send, k0, k1, thresh: int):
    """Bool keep mask from int32 id planes (jnp ops only — Mosaic-safe)."""
    h = recv * jnp.int32(-1640531527) + k0           # 0x9E3779B9
    h = h ^ (send * jnp.int32(-2048144789) + k1)     # 0x85EBCA6B
    h = h ^ jax.lax.shift_right_logical(h, 16)
    h = h * jnp.int32(668265295)                     # 0x27D4EB2F
    h = h ^ jax.lax.shift_right_logical(h, 15)
    return (h & jnp.int32(2147483647)) >= jnp.int32(thresh)


def edge_keep_mask(drop: Optional[DropSpec], receivers: Array,
                   senders: Array) -> Optional[Array]:
    """[E] float keep mask for per-edge (CSR/segment) paths — the SAME draws
    the band kernel makes, so band and gather paths agree bit-for-bit on
    which edges survive."""
    if drop is None:
        return None
    return _hash_keep(receivers.astype(jnp.int32), senders.astype(jnp.int32),
                      drop.k0, drop.k1, drop.thresh).astype(jnp.float32)


AUTO_WINDOWS = (256, 512, 768, 1024, 1536, 2048)


def _pick_window(s, blk_start, nb, n_pad) -> int:
    """Smallest candidate window reaching ≥99% coverage; else the candidate
    maximizing covered_edges − window·NB·BN/1536.  The divisor is the
    measured break-even (scripts/tpu_band_sweep.py, arxiv-scale realistic
    graph): a marginal window column costs ~0.9 µs of A+window DMA per block
    row set while a leftover edge costs ~8.7 ns of take+CSR — ≈110 edges per
    column across the node space, i.e. nb·BN/1536 edge-equivalents.  (The
    round-3 divisor 256 was ~6× too conservative and picked 512 where 1024
    measured 12% faster.)"""
    cands = [w for w in AUTO_WINDOWS if w <= n_pad] or [n_pad]
    covered = np.zeros(len(cands), np.int64)
    for b in range(nb):
        a, z = blk_start[b], blk_start[b + 1]
        if a == z:
            continue
        ss = s[a:z]
        for j, w in enumerate(cands):
            hi = np.searchsorted(ss, ss + w, side="left")
            covered[j] += int((hi - np.arange(len(ss))).max())
    n_edges = blk_start[-1]
    for j, w in enumerate(cands):
        if covered[j] >= 0.99 * n_edges:
            return w
    score = covered - np.asarray(cands, np.int64) * (nb * BN) // 1536
    return cands[int(np.argmax(score))]


HUB_DEGREE = 256    # "auto" extraction threshold (break-even ≈ 192, see Band)
MAX_HUBS = 4096     # per direction, per kind — caps A_hub at ~700MB int8/arxiv


def _top_degree(ids: np.ndarray, n: int, thr: int, cap: int) -> np.ndarray:
    """Nodes appearing ≥ thr times in ids, highest-degree first, ≤ cap."""
    deg = np.bincount(ids, minlength=n)
    cand = np.flatnonzero(deg >= thr)
    if cand.size > cap:
        cand = cand[np.argsort(deg[cand])[::-1][:cap]]
    return cand.astype(np.int64)


def _pad128(ids: np.ndarray) -> np.ndarray:
    """0-pad to a 128 multiple (padded entries get all-zero A slices)."""
    pad = (-len(ids)) % 128
    return np.concatenate([ids, np.zeros(pad, ids.dtype)]) if pad else ids


def _build_one(senders: np.ndarray, receivers: np.ndarray, n_pad: int,
               window, hub_degree=None) -> Band:
    n_edges_total = len(senders)
    if hub_degree == "auto":
        hub_degree = HUB_DEGREE

    # hub ROWS first (a hub row owns ALL its incoming edges, including those
    # from hub senders — the dense row matmul computes the complete row)
    hub_row_ids = a_row = None
    n_hub_row = 0
    extra_row_s = extra_row_r = None
    if hub_degree and n_edges_total:
        rows = _top_degree(receivers, n_pad, hub_degree, MAX_HUBS)
        if rows.size:
            row_of = np.full(n_pad, -1, np.int64)
            row_of[rows] = np.arange(rows.size)
            on_row = row_of[receivers] >= 0
            a_row32 = np.zeros((len(rows), n_pad), np.int32)
            np.add.at(a_row32, (row_of[receivers[on_row]], senders[on_row]), 1)
            over = a_row32 > 127
            if over.any():  # multi-edge overflow rides the leftover CSR
                rr, cc = np.nonzero(over)
                rep = a_row32[rr, cc] - 127
                extra_row_r = np.repeat(rows[rr], rep)
                extra_row_s = np.repeat(cc, rep)
                a_row32[rr, cc] = 127
            n_hub_row = int(on_row.sum())
            hub_row_ids = _pad128(rows).astype(np.int32)
            a_row = np.zeros((len(hub_row_ids), n_pad), np.int8)
            a_row[:len(rows)] = a_row32.astype(np.int8)
            senders, receivers = senders[~on_row], receivers[~on_row]

    # hub COLUMNS on the residual (top out-degree senders)
    hub_ids = a_hub = None
    n_hub = 0
    if hub_degree and len(senders):
        cols = _top_degree(senders, n_pad, hub_degree, MAX_HUBS)
        if cols.size:
            col_of = np.full(n_pad, -1, np.int64)
            col_of[cols] = np.arange(cols.size)
            on_col = col_of[senders] >= 0
            ah32 = np.zeros((n_pad, len(cols)), np.int32)
            np.add.at(ah32, (receivers[on_col], col_of[senders[on_col]]), 1)
            over = ah32 > 127
            if over.any():
                rr, cc = np.nonzero(over)
                rep = ah32[rr, cc] - 127
                extra_row_r = _cat(extra_row_r, np.repeat(rr, rep))
                extra_row_s = _cat(extra_row_s, np.repeat(cols[cc], rep))
                ah32[rr, cc] = 127
            n_hub = int(on_col.sum())
            hub_ids = _pad128(cols).astype(np.int32)
            a_hub = np.zeros((n_pad, len(hub_ids)), np.int8)
            a_hub[:, :len(cols)] = ah32.astype(np.int8)
            senders, receivers = senders[~on_col], receivers[~on_col]

    band = _build_window(senders, receivers, n_pad, window,
                         extra_s=extra_row_s, extra_r=extra_row_r,
                         n_edges_total=n_edges_total)
    return Band(w_lo=band.w_lo, a=band.a, lo_src=band.lo_src,
                lo_dst=band.lo_dst, lo_row_ptr=band.lo_row_ptr,
                hub_ids=hub_ids, a_hub=a_hub, hub_row_ids=hub_row_ids,
                a_row=a_row, window=band.window, n_edges=n_edges_total,
                n_lo=band.n_lo, n_hub=n_hub, n_hub_row=n_hub_row)


def _cat(a, b):
    return b if a is None else np.concatenate([a, b])


def _build_window(senders: np.ndarray, receivers: np.ndarray, n_pad: int,
                  window, extra_s=None, extra_r=None,
                  n_edges_total: Optional[int] = None) -> Band:
    nb = n_pad // BN
    n_edges = len(senders) if n_edges_total is None else n_edges_total
    rb = receivers // BN
    order = np.lexsort((senders, rb))
    s, r, rbo = senders[order], receivers[order], rb[order]
    blk_start = np.searchsorted(rbo, np.arange(nb + 1))

    from .. import native

    cands = ([w for w in AUTO_WINDOWS if w <= n_pad] or [n_pad]) \
        if window == "auto" else [window]
    res = native.band_windows(s, blk_start, n_pad, cands,
                              0.99 if window == "auto" else 0.0, 1536, ALIGN)
    if res is not None:
        window, w_lo, in_band = res
    else:
        if window == "auto":
            window = _pick_window(s, blk_start, nb, n_pad)
        w_lo = np.zeros(nb, np.int32)
        in_band = np.zeros(len(s), bool)
        for b in range(nb):
            a, z = blk_start[b], blk_start[b + 1]
            if a == z:
                continue
            ss = s[a:z]  # sorted ascending within the block
            # best length-`window` interval: two-pointer via searchsorted
            hi = np.searchsorted(ss, ss + window, side="left")
            cover = hi - np.arange(len(ss))
            i = int(np.argmax(cover))
            lo = _round_down(int(ss[i]), ALIGN)
            lo = min(max(lo, 0), n_pad - window)
            w_lo[b] = lo
            in_band[a:z] = (ss >= lo) & (ss < lo + window)

    # dense counts (int8 with saturation; >127 multi-edges overflow to
    # leftover).  Native single-pass fill when available (the numpy
    # add.at+astype pair costs ~4s at arxiv scale); numpy fallback below.
    counted = native.band_counts(s, r, in_band, w_lo, window, BN, nb * BN)
    if counted is not None:
        a_band, sp_s, sp_r = counted
        if len(sp_s):
            extra_s = _cat(extra_s, sp_s.astype(np.int64))
            extra_r = _cat(extra_r, sp_r.astype(np.int64))
    else:
        a_band = np.zeros((nb * BN, window), np.int32)
        sb, rb_b = s[in_band], r[in_band]
        np.add.at(a_band, (rb_b, sb - w_lo[rb_b // BN]), 1)
        over = a_band > 127
        if over.any():
            rows, cols = np.nonzero(over)
            rep = a_band[rows, cols] - 127
            extra_r = _cat(extra_r, np.repeat(rows, rep).astype(np.int64))
            extra_s = _cat(extra_s,
                           np.repeat(cols + w_lo[rows // BN],
                                     rep).astype(np.int64))
            a_band[rows, cols] = 127
        a_band = a_band.astype(np.int8)

    lo_s = s[~in_band]
    lo_r = r[~in_band]
    if extra_s is not None:
        lo_s = np.concatenate([lo_s, np.asarray(extra_s, np.int64)])
        lo_r = np.concatenate([lo_r, np.asarray(extra_r, np.int64)])
    n_lo = len(lo_s)
    # leftover CSR (receiver-sorted, sentinel-padded to a CHUNK multiple)
    lo_order = np.argsort(lo_r, kind="stable")
    lo_s, lo_r = lo_s[lo_order], lo_r[lo_order]
    e_lo_pad = max(-(-max(n_lo, 1) // CHUNK) * CHUNK, CHUNK)
    sentinel = np.int32(n_pad)
    lo_src = np.full(e_lo_pad, sentinel, np.int32)
    lo_dst = np.full(e_lo_pad, sentinel, np.int32)
    lo_src[:n_lo] = lo_s
    lo_dst[:n_lo] = lo_r
    counts = np.bincount(lo_r.astype(np.int64), minlength=n_pad) if n_lo else \
        np.zeros(n_pad, np.int64)
    lo_row_ptr = np.zeros(n_pad + 1, np.int64)
    np.cumsum(counts, out=lo_row_ptr[1:])
    return Band(w_lo=w_lo, a=a_band, lo_src=lo_src, lo_dst=lo_dst,
                lo_row_ptr=lo_row_ptr.astype(np.int32), window=window,
                n_edges=n_edges, n_lo=n_lo)


def _with_transposes(band: Band) -> Band:
    """Attach the host-transposed tiles the dense GAT kernels read."""
    import dataclasses

    n_pad, w = band.a.shape
    nb = n_pad // BN
    a_t = np.ascontiguousarray(
        np.asarray(band.a).reshape(nb, BN, w).swapaxes(1, 2)).reshape(-1, BN)
    a_hub_t = (np.ascontiguousarray(np.asarray(band.a_hub).T)
               if band.a_hub is not None else None)
    return dataclasses.replace(band, a_t=a_t, a_hub_t=a_hub_t)


def build_band_pair(senders: np.ndarray, receivers: np.ndarray, n_pad: int,
                    window="auto", hubs="auto",
                    store_transpose: bool = True) -> BandPair:
    """Host-side band structures for A (forward) and Aᵀ (backward).

    senders/receivers are VALID edges only (strip padding sentinels first);
    n_pad must be a BN multiple; window a 128-multiple ≤ n_pad, or "auto"
    (per-direction coverage/DMA-cost scan over AUTO_WINDOWS).  ``hubs``:
    "auto" extracts nodes with degree ≥ 256 into dense hub matmuls (no-op on
    uniform-degree graphs), an int overrides the threshold, None disables.
    ``store_transpose``: also keep the transposed count tiles the dense GAT
    kernels read (ops/gat_dense.py) — ~2x the A bytes on host and device."""
    assert n_pad % BN == 0, n_pad
    if window != "auto":
        window = min(window, n_pad)
        assert window % 128 == 0 and window > 0, window
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    fwd = _build_one(senders, receivers, n_pad, window, hubs)
    bwd = _build_one(receivers, senders, n_pad, window, hubs)
    if store_transpose:
        fwd, bwd = _with_transposes(fwd), _with_transposes(bwd)
    return BandPair(fwd=fwd, bwd=bwd)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _band_kernel(*refs, w, gb, thresh=None, swap=False):
    # gb receiver blocks per grid step: one grid step costs ~1.5 µs of Mosaic
    # overhead (measured, ROOFLINE.md) — at 1324 blocks that alone is 2 ms, so
    # the grid is coarsened and the per-128-row windows stream inside the step.
    if thresh is None:
        wlo_ref, a_ref, x_hbm, out_ref, xwin, sem = refs
        dk_ref = None
    else:
        wlo_ref, dk_ref, a_ref, x_hbm, out_ref, xwin, sem = refs
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    def _copy(j, slot, k):
        lo = pl.multiple_of(wlo_ref[j * gb + k], ALIGN)  # host aligns w_lo
        return pltpu.make_async_copy(x_hbm.at[pl.ds(lo, w), :],
                                     xwin.at[slot, k], sem.at[slot, k])

    @pl.when(i == 0)
    def _():
        for k in range(gb):
            _copy(0, 0, k).start()

    @pl.when(i + 1 < nb)
    def _():
        for k in range(gb):
            _copy(i + 1, (i + 1) % 2, k).start()

    cd = x_hbm.dtype
    # f32 inputs need HIGHEST for torch-f32 parity (see spmm_pallas._dot); the
    # int8 counts are exact in bf16 either way.
    prec = (jax.lax.Precision.DEFAULT if cd == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    for k in range(gb):
        _copy(i, i % 2, k).wait()
        a = a_ref[k * BN:(k + 1) * BN, :].astype(cd)
        if thresh is not None:
            # edge-drop: per-position keep from the (recv, send) id planes —
            # rows are this block's receivers (senders for the transpose
            # band), columns the window's node ids
            rows = ((i * gb + k) * BN
                    + jax.lax.broadcasted_iota(jnp.int32, (BN, w), 0))
            cols = wlo_ref[i * gb + k] + jax.lax.broadcasted_iota(
                jnp.int32, (BN, w), 1)
            recv, send = (cols, rows) if swap else (rows, cols)
            keep = _hash_keep(recv, send, dk_ref[0], dk_ref[1], thresh)
            a = a * keep.astype(cd)
        acc = jax.lax.dot_general(a, xwin[i % 2, k], (((1,), (0,)), ((), ())),
                                  precision=prec,
                                  preferred_element_type=jnp.float32)
        out_ref[k * BN:(k + 1) * BN, :] = acc.astype(out_ref.dtype)


def _pick_gb(nb: int, w: int, c: int, itemsize: int) -> int:
    """Blocks per grid step: largest divisor of nb (≤8) whose window scratch
    (2 slots) plus the A/out pipeline buffers stay within ~8MB of VMEM."""
    for gb in (8, 4, 2, 1):
        vmem = 2 * gb * w * c * itemsize + 2 * gb * BN * (w + c * itemsize)
        if nb % gb == 0 and vmem <= 8 * 1024 * 1024:
            return gb
    return 1


def _band_call_xla(x: Array, band: Band, drop=None, swap=False) -> Array:
    """Pure-XLA emulation of the band kernel (identical math: per-block dense
    window matmul).  Used for CPU-mesh tests inside `shard_map`, where jax's
    Pallas interpreter trips its own vma checks (jax 0.9); the Mosaic kernel
    itself is exercised by tests/test_band.py and the TPU drive scripts."""
    n_pad, c = x.shape
    w = band.window
    nb = n_pad // BN
    win = jnp.take(x, band.w_lo[:, None] + jnp.arange(w)[None, :], axis=0)
    a = band.a.reshape(nb, BN, w).astype(x.dtype)
    if drop is not None:
        rows = (jnp.arange(nb * BN, dtype=jnp.int32).reshape(nb, BN)[:, :, None]
                + jnp.zeros((1, 1, w), jnp.int32))
        cols = (band.w_lo[:, None, None]
                + jnp.arange(w, dtype=jnp.int32)[None, None, :]
                + jnp.zeros((1, BN, 1), jnp.int32))
        recv, send = (cols, rows) if swap else (rows, cols)
        a = a * _hash_keep(recv, send, drop.k0, drop.k1,
                           drop.thresh).astype(a.dtype)
    out = jnp.einsum("bnw,bwc->bnc", a, win,
                     preferred_element_type=jnp.float32)
    return out.reshape(n_pad, c).astype(x.dtype)


def _band_call(x: Array, band: Band, interpret, drop=None,
               swap: bool = False) -> Array:
    n_pad, c = x.shape
    assert c % 128 == 0, c
    assert band.a.shape[0] == n_pad and n_pad % BN == 0, (n_pad, band.a.shape)
    if interpret == "xla":
        return _band_call_xla(x, band, drop, swap)
    w = band.window
    nb = n_pad // BN
    gb = _pick_gb(nb, w, c, jnp.dtype(x.dtype).itemsize)
    kernel = functools.partial(_band_kernel, w=w, gb=gb,
                               thresh=None if drop is None else drop.thresh,
                               swap=swap)
    n_prefetch = 1 if drop is None else 2
    args = [band.w_lo]
    if drop is not None:
        args.append(jnp.stack([drop.k0, drop.k1]).astype(jnp.int32))
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,  # w_lo (+ drop key)
            grid=(nb // gb,),
            in_specs=[
                pl.BlockSpec((gb * BN, w), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),   # A blocks (auto pipeline)
                pl.BlockSpec(memory_space=pl.ANY),       # x [N_pad, C] (HBM)
            ],
            out_specs=pl.BlockSpec((gb * BN, c), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, gb, w, c), x.dtype),
                pltpu.SemaphoreType.DMA((2, gb)),
            ],
        ),
        out_shape=_out_struct((n_pad, c), x.dtype, x),
        interpret=interpret,
    )(*args, band.a, x)


def _hub_dot(a_int8: Array, x: Array) -> Array:
    """Dense int8-count × features matmul (the hub corrections).  XLA fuses
    the int8→float convert into the dot read; precision mirrors _band_kernel
    (bf16 DEFAULT / f32 HIGHEST for torch-f32 parity)."""
    prec = (jax.lax.Precision.DEFAULT if x.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    acc = jax.lax.dot_general(a_int8.astype(x.dtype), x,
                              (((1,), (0,)), ((), ())), precision=prec,
                              preferred_element_type=jnp.float32)
    return acc.astype(x.dtype)


def _band_all(x: Array, band: Band, interpret: bool, drop=None,
              swap: bool = False) -> Array:
    """Full A @ x: dense band kernel + hub matmuls + leftover take+CSR
    (non-differentiable building block — callers own the VJP via the
    transpose band).  ``drop``/``swap``: hash edge-drop (DropSpec), applied
    consistently across all four structures; swap=True for transpose bands
    (rows are senders there, so the id planes exchange before hashing)."""
    n_pad = x.shape[0]
    out = _band_call(x, band, interpret, drop, swap)
    if band.hub_ids is not None:
        # [N_pad, H] @ [H, C]: top-degree senders, gathered once (H rows)
        x_hub = jnp.take(x, band.hub_ids, axis=0)
        a_hub = band.a_hub
        if drop is not None:
            rows = jnp.arange(n_pad, dtype=jnp.int32)[:, None]
            cols = band.hub_ids[None, :].astype(jnp.int32)
            recv, send = (cols, rows) if swap else (rows, cols)
            a_hub = a_hub * _hash_keep(recv, send, drop.k0, drop.k1,
                                       drop.thresh).astype(jnp.int8)
        out = out + _hub_dot(a_hub, x_hub)
    if band.hub_row_ids is not None:
        # [R, N_pad] @ [N_pad, C]: hub receivers' complete rows (their band/
        # leftover slots hold only int8-overflow spill, which adds correctly;
        # padded rows are all-zero so the id-0 scatter slots add zeros)
        a_row = band.a_row
        if drop is not None:
            rows = band.hub_row_ids[:, None].astype(jnp.int32)
            cols = jnp.arange(n_pad, dtype=jnp.int32)[None, :]
            recv, send = (cols, rows) if swap else (rows, cols)
            a_row = a_row * _hash_keep(recv, send, drop.k0, drop.k1,
                                       drop.thresh).astype(jnp.int8)
        rows_out = _hub_dot(a_row, x)
        out = out.at[band.hub_row_ids].add(rows_out)
    if band.n_lo:
        # no validity mask needed: sentinel lo_dst rows match no one-hot row in
        # the CSR kernel (clip-gathered garbage is finite and never lands)
        xg = jnp.take(x, jnp.minimum(band.lo_src, n_pad - 1), axis=0)
        if drop is not None:
            recv, send = ((band.lo_src, band.lo_dst) if swap
                          else (band.lo_dst, band.lo_src))
            keep = _hash_keep(recv.astype(jnp.int32), send.astype(jnp.int32),
                              drop.k0, drop.k1, drop.thresh)
            xg = xg * keep[:, None].astype(xg.dtype)
        out = out + segment_sum_csr(jax.lax.stop_gradient(xg), band.lo_dst,
                                    band.lo_row_ptr, interpret).astype(out.dtype)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def band_spmm(x: Array, bands: BandPair, interpret: bool = False,
              drop: Optional[DropSpec] = None) -> Array:
    """out = A @ x for the adjacency encoded by ``bands.fwd``
    (out[r] = Σ_{e: recv_e=r} x[send_e]); backward = Aᵀ @ g via ``bands.bwd``.
    x must be lane-aligned (C % 128 == 0) and node-padded to a BN multiple.
    ``drop``: hash edge-drop applied identically in forward and transpose."""
    return _band_all(x, bands.fwd, interpret, drop, swap=False)


def _band_spmm_fwd(x, bands, interpret, drop):
    return (_band_all(x, bands.fwd, interpret, drop, swap=False),
            (bands.bwd, drop))


def _band_spmm_bwd(interpret, res, g):
    bwd_band, drop = res
    return _band_all(g, bwd_band, interpret, drop, swap=True), None, None


band_spmm.defvjp(_band_spmm_fwd, _band_spmm_bwd)


# ---------------------------------------------------------------------------
# fused GENConv softmax aggregation through the band path (node-factored)
# ---------------------------------------------------------------------------

def _band_cmax(x, t0, eps):
    """Per-channel upper bound on scores t·(relu(x)+ε) — same shift-invariance
    argument as spmm_pallas._fused_cmax (no edge-embedding case)."""
    m_ub = jnp.max(jax.nn.relu(x.astype(jnp.float32)), axis=0) + eps
    cmax = jnp.where(t0 > 0, t0 * m_ub, t0 * eps)
    return jax.lax.stop_gradient(cmax)


def _band_softmax_fwd_call(x, bands, t, eps, interpret):
    c = x.shape[1]
    t_arr = jnp.asarray(t, jnp.float32)
    t0 = t_arr.reshape(-1)[0]
    cmax = _band_cmax(x, t0, eps)
    m = jax.nn.relu(x.astype(jnp.float32)) + eps
    e = jnp.exp(m * t0 - cmax[None, :])
    p = jnp.concatenate([e * m, e], axis=1).astype(x.dtype)  # [N, 2C]
    agg = _band_all(p, bands.fwd, interpret)
    # slice BEFORE converting: upcast+divide+downcast then fuse into one pass
    # (an astype on the whole [N, 2C] materializes 174MB of f32 — measured
    # 0.5 ms/layer at arxiv scale)
    num = agg[:, :c].astype(jnp.float32)
    den = agg[:, c:].astype(jnp.float32)
    out = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)
    # den residual follows the message dtype — an f32 den stacks an extra
    # 87MB/layer across lax.scan at arxiv scale (same trade as the CSC-kernel
    # path, spmm_pallas._softmax_agg_pallas out_shape note).
    return out.astype(x.dtype), den.astype(x.dtype), cmax


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def band_softmax_agg(x: Array, bands: BandPair, t: Array, eps: float = 1e-7,
                     grad_weights: bool = False,
                     interpret: bool = False) -> Array:
    """GENConv softmax aggregation, gather-free:

        out[n] = Σ_{e: recv=n} softmax_e(t·m_e)·m_e,   m_e = relu(x[send_e]) + ε

    (`gcn_lib/sparse/torch_vertex.py:78-85` message + `torch_message.py:44-58`
    aggregation; no edge embeddings — that case stays on the CSC-kernel path.)
    Node-factored: num/den are ONE band SpMM of the packed node table
    [e·m | e], and the VJP is one transposed band SpMM — the factorization of
    `spmm_pallas._fused_bwd`.  x lane-aligned (C % 128 == 0), N_pad % BN == 0.
    """
    out, _, _ = _band_softmax_fwd_call(x, bands, t, eps, interpret)
    return out


def _band_softmax_fwd(x, bands, t, eps, grad_weights, interpret):
    out, den, cmax = _band_softmax_fwd_call(x, bands, t, eps, interpret)
    return out, (x, bands.bwd, t, out if grad_weights else None, den, cmax)


def _band_softmax_bwd(eps, grad_weights, interpret, res, g):
    x, bwd_band, t, out, den, cmax = res
    c = x.shape[1]
    t_arr = jnp.asarray(t, jnp.float32)
    t0 = t_arr.reshape(-1)[0]
    den = den.astype(jnp.float32)
    q = jnp.where(den > 0, g.astype(jnp.float32) / jnp.where(den > 0, den, 1.0),
                  0.0)
    m_node = jax.nn.relu(x.astype(jnp.float32)) + eps
    e_node = jnp.exp(m_node * t0 - cmax[None, :])
    if grad_weights:
        qo = jnp.concatenate([q, q * out.astype(jnp.float32)], axis=1)
    else:
        qo = q
    s_all = _band_all(qo.astype(x.dtype), bwd_band, interpret).astype(jnp.float32)
    if grad_weights:
        s1, s2 = s_all[:, :c], s_all[:, c:]
        dm = e_node * ((1.0 + t0 * m_node) * s1 - t0 * s2)
        dt = jnp.sum(e_node * m_node * (m_node * s1 - s2))
    else:
        dm = e_node * s_all
        dt = jnp.zeros((), jnp.float32)
    dx = jnp.where(x > 0, dm, 0.0).astype(x.dtype)
    dt = jnp.broadcast_to(dt, jnp.shape(t)).astype(jnp.float32)
    return dx, None, dt


band_softmax_agg.defvjp(_band_softmax_fwd, _band_softmax_bwd)


def band_softmax_agg_auto(x, bands, t, eps: float = 1e-7,
                          grad_weights: bool = False,
                          interpret: bool = False):
    """Lane-padding wrapper (zero lanes are exact no-ops; gradients exact —
    same argument as spmm_pallas.fused_softmax_gather_agg_auto)."""
    c = x.shape[1]
    pad = (-c) % 128
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    out = band_softmax_agg(x, bands, t, eps, grad_weights, interpret)
    return out[:, :c] if pad else out


def band_gat_agg(feat_src: Array, el: Array, bands: BandPair,
                 neg_slope: float = 0.2, compute_dtype=None,
                 interpret: bool = False,
                 drop: Optional["DropSpec"] = None) -> Tuple[Array, Array]:
    """Gather-free DGL-flavor GAT aggregation for the sender-only score case
    (`use_attn_dst=False` — the published RevGAT/ogbn-arxiv config,
    `examples/ogb_eff/ogbn_arxiv_dgl/main.py:99` with --no-attn-dst):

        score_e = leaky_relu(el[send_e])          (node-factored!)
        out[r]  = Σ_e softmax_e(score)·feat_src[send_e]

    Because the score depends only on the SENDER, exp(score − cmax) is a node
    table and num/den are ONE band SpMM of the packed [e·feat | e] table —
    the same factorization as band_softmax_agg.  The global per-head cmax
    stabilizer is exact softmax algebra (any shift cancels); numerics match
    the segment path to bf16 tolerance (tests/test_band_gat.py).

    Dynamic-range assumption: the single GLOBAL per-head max (vs the segment
    path's per-receiver max) underflows a receiver to den = 0 when ALL its
    senders score ≳87 below the global max (exp(−87) < f32 tiny), and the
    caller's den>0 guard then emits exactly 0 where the segment path returns
    a valid average.  Post-norm attention logits (the RevGAT config: BN'd
    features into a bounded a_l) stay within a few units of spread, far from
    the cliff; if you feed un-normalized features with score spread ≳80,
    route through band_gat_dense_agg (exact per-receiver stabilization)
    instead.  (ADVICE r4 finding, documented by design decision.)

    feat_src: [N, H, D] (symmetric-norm pre-scaling already applied);
    el: [N, H] attention logits a_l·feat_src.  Returns (num [N,H,D],
    den [N,H]) both f32 — caller divides (keeps the den>0 masking in one
    place, convs/dgl_gat.py).  ``drop``: hash edge-drop (DropSpec) — the
    renormalizing attention edge-drop, applied before the softmax exactly as
    `model_rev.py:166-172` does, consistently in forward and VJP.
    """
    n, h, d = feat_src.shape
    score = jax.nn.leaky_relu(el.astype(jnp.float32), neg_slope)
    cmax = jax.lax.stop_gradient(jnp.max(score, axis=0))
    e = jnp.exp(score - cmax[None, :])                        # [N, H]
    cd = compute_dtype or feat_src.dtype
    p = jnp.concatenate(
        [(e[:, :, None] * feat_src.astype(jnp.float32)).reshape(n, h * d), e],
        axis=1).astype(cd)
    agg = band_sum_auto(p, bands, interpret, drop)
    num = agg[:, :h * d].astype(jnp.float32).reshape(n, h, d)
    den = agg[:, h * d:].astype(jnp.float32)
    return num, den


def band_gat_dense_agg(feat_src: Array, el: Array, er: Array,
                       bands: BandPair, neg_slope: float = 0.2,
                       compute_dtype=None,
                       drop: Optional[DropSpec] = None,
                       self_score: Optional[Array] = None,
                       self_feat: Optional[Array] = None,
                       self_count: Optional[Array] = None,
                       interpret=False) -> Tuple[Array, Array]:
    """Gather-free GAT aggregation for the DST-SCORE case
    (`use_attn_dst=True`: score_e = leaky_relu(el[send] + er[recv]), per
    head — NOT additively separable, so the sum factorization of
    band_gat_agg does not apply).  Served by DENSE evaluation over ALL band
    structures — window, hub columns, hub rows — with an exact shared
    per-receiver stabilizer and a manual custom VJP (d_er over the forward
    structures, d_el/d_feat over the transpose band\'s): ops/gat_dense.py.
    Hub-capable since round 5 (the r4 hub-free gate is lifted).

    Returns (num [N, H, D], den [N, H]) f32 — caller divides.

    PyG-1.x self-loop semantics (`convs/sparse.GATConv`): pass
    ``self_score`` [N, H], ``self_feat`` [N, H, D] and ``self_count`` [N]
    (# explicit self edges per node) — the softmax then runs over
    neighbors ∪ {exactly one self term}: the band/leftover contributions of
    explicit self edges are cancelled by a (1 − self_count) weighting of
    the analytic self term, which also joins the stabilizer.
    """
    assert self_score is None or drop is None, \
        "self-loop semantics + edge-drop not composed (PyG GATConv has no drop)"
    from .gat_dense import gat_dense_agg

    return gat_dense_agg(feat_src, el, er, self_score, self_feat, self_count,
                         bands, drop, neg_slope, compute_dtype, interpret)


def band_gat_dense_ok(g, min_coverage: float = 0.5) -> bool:
    """Gate for the dense dst-score GAT route (ops/gat_dense.py).  Hub-capable
    since round 5: hub columns/rows get their own dense score passes with the
    shared stabilizer, so power-law graphs ride the only-trainable dst-score
    path too.  Only coverage still gates (a large leftover pays per-edge
    [H, D] gathers in every pass)."""
    band = getattr(g, "band", None)
    if band is None:
        return False
    f = band.fwd
    if f.coverage < min_coverage:
        from .segment import _miss
        return _miss("band_gat_dense",
                     f"band coverage {f.coverage:.2f} < {min_coverage}")
    return _band_platform_ok()


def band_sum_auto(x: Array, bands: BandPair, interpret: bool = False,
                  drop: Optional[DropSpec] = None) -> Array:
    """Lane-padding wrapper over ``band_spmm``: out[r] = Σ_{e: recv=r} x[send_e]
    over the graph's VALID edges (with multiplicity, self edges included) —
    gather-free twin of ``ops.segment.segment_sum(gather(x), receivers)``.
    Convs whose aggregation is node-factorable (GIN's sum, SemiGCN's sym-norm,
    SAGE's mean, GENConv's mean/power families) route here via the band gates."""
    c = x.shape[1]
    pad = (-c) % 128
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    out = band_spmm(x, bands, interpret, drop)
    return out[:, :c] if pad else out


# ---------------------------------------------------------------------------
# band extreme (max/min): masked window reduce — gather-free forward
# ---------------------------------------------------------------------------

_NEG_INF = float("-inf")


def _window_extreme(x: Array, band: Band, kind: str) -> Array:
    """Per-receiver extreme over the window band's edges: for each 128-row
    block, reduce the DMA'd window under the count>0 mask.  Pure XLA — the
    where() fuses into the reduction (input fusion), so HBM traffic is the
    same windows+A the sum kernel moves; the VPU pays W/deg redundant
    compares, which the gather path trades for its 420M rows/s take
    (measured comparison: scripts/tpu_band_sweep.py notes / ROOFLINE.md)."""
    n_pad, c = x.shape
    w = band.window
    nb = n_pad // BN
    fill = _NEG_INF if kind == "max" else float("inf")
    win = jnp.take(x, band.w_lo[:, None] + jnp.arange(w)[None, :], axis=0)
    mask = band.a.reshape(nb, BN, w) > 0
    fn = jnp.max if kind == "max" else jnp.min
    out = fn(jnp.where(mask[:, :, :, None], win[:, None, :, :],
                       jnp.asarray(fill, x.dtype)), axis=2)
    return out.reshape(n_pad, c)


def _band_extreme_fwd_impl(x, band, kind):
    n_pad = x.shape[0]
    fill = jnp.asarray(_NEG_INF if kind == "max" else float("inf"), x.dtype)
    out = _window_extreme(x, band, kind)
    if band.n_lo:
        # leftover: sentinel rows contribute ±inf to segment 0 — a no-op for
        # the extreme; ids clip instead of masking
        xg = jnp.take(x, jnp.minimum(band.lo_src, n_pad - 1), axis=0)
        sent = (band.lo_dst >= n_pad)[:, None]
        vals = jnp.where(sent, fill, xg)
        fn = jax.ops.segment_max if kind == "max" else jax.ops.segment_min
        lo = fn(vals, jnp.minimum(band.lo_dst, n_pad - 1), n_pad,
                indices_are_sorted=True)
        cmb = jnp.maximum if kind == "max" else jnp.minimum
        out = cmb(out, lo)
    # torch_scatter empty-segment semantics: no edges → exactly 0
    return jnp.where(jnp.isfinite(out), out, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def band_extreme(x: Array, bands: BandPair, senders: Array, receivers: Array,
                 edge_mask: Array, kind: str = "max",
                 indices_are_sorted: bool = True) -> Array:
    """Gather-free segment max/min of a NODE table over the graph's edges:
    out[r] = extreme_{e: recv=r} x[send_e], empty → 0 (torch_scatter
    semantics, `utils/pyg_util.py:30-34`).  Forward reads windows instead of
    per-edge rows; backward is the tie-splitting gather/compare/segment-sum of
    ops.segment._segment_extreme (same eligibility: an edge's receiver is
    nonempty by construction, so out[r] is a true extreme and equality testing
    is sound).  Requires a hub-free band (see band_extreme_ok) — dense hub
    columns would need a [N, H, C] masked reduce.  senders/receivers/edge_mask
    are the graph's (sentinel-padded) edge arrays, used only by the VJP."""
    return _band_extreme_fwd_impl(x, bands.fwd, kind)


def _band_extreme_fwd(x, bands, senders, receivers, edge_mask, kind,
                      indices_are_sorted):
    out = _band_extreme_fwd_impl(x, bands.fwd, kind)
    return out, (x, out, senders, receivers, edge_mask)


def _band_extreme_bwd(kind, indices_are_sorted, res, g):
    x, out, senders, receivers, edge_mask = res
    n_pad = x.shape[0]
    ids = jnp.minimum(receivers, n_pad - 1)
    sid = jnp.minimum(senders, n_pad - 1)
    x_e = jnp.take(x, sid, axis=0)
    out_e = jnp.take(out, ids, axis=0)
    elig = (x_e == out_e) & edge_mask[:, None]
    cnt = jax.ops.segment_sum(elig.astype(jnp.float32), ids, n_pad,
                              indices_are_sorted=indices_are_sorted)
    cnt_e = jnp.take(jnp.maximum(cnt, 1.0), ids, axis=0)
    g_e = jnp.take(g.astype(jnp.float32), ids, axis=0)
    dd = jnp.where(elig, g_e / cnt_e, 0.0)
    dx = jax.ops.segment_sum(dd, sid, n_pad, indices_are_sorted=False)
    return (dx.astype(x.dtype), None, None, None, None)


band_extreme.defvjp(_band_extreme_fwd, _band_extreme_bwd)


MAX_EXTREME_WINDOW = 256


def band_extreme_ok(g, min_coverage: float = 0.98) -> bool:
    """Gate for the max/min band route.  Unlike the sum family (whose MXU
    waste is free), the window reduce pays VPU compares for every
    (row, window, channel) element, so it only beats the gather when the
    window is TIGHT: measured on chip at arxiv scale, W=768 / avg-deg 15 runs
    0.69× of the segment path (scripts/tpu_gat_drive.py) — linear-in-W cost
    puts break-even near W≈530, so the gate requires window ≤ 256 (the
    RCM-ordered kNN regime MRConv/EdgeConv actually run in), near-total
    coverage (a large leftover pays the gather anyway), and no hub
    structures (not servable by the window reduce)."""
    band = getattr(g, "band", None)
    if band is None:
        return False
    f = band.fwd
    if f.hub_ids is not None or f.hub_row_ids is not None:
        from .segment import _miss
        return _miss("band_extreme", "hub structures present (max/min window "
                     "reduce serves the pure window band only)")
    if f.window > MAX_EXTREME_WINDOW:
        from .segment import _miss
        return _miss("band_extreme",
                     f"window {f.window} > {MAX_EXTREME_WINDOW} (measured "
                     "0.69x of the segment path at W=768 — the VPU masked "
                     "reduce only wins on tight windows)")
    if f.coverage < min_coverage:
        from .segment import _miss
        return _miss("band_extreme",
                     f"band coverage {f.coverage:.2f} < {min_coverage}")
    return _band_platform_ok()


# Aggregators with a node-factored band form.  max/min ride band_extreme
# (masked window reduce) when band_extreme_ok passes; softmax needs the fused
# band_softmax_agg; the rest ride plain band_sum_auto on a node table.
BAND_SOFTMAX_AGGRS = ("softmax", "softmax_sg", "softmax_sum")
BAND_SUM_AGGRS = ("add", "sum", "mean", "power", "power_sum")

# Test hook: when True, the gates skip the platform check and callers should
# pass interpret=band_interpret() so the XLA emulation runs (CPU parity tests;
# tests/test_band_convs.py monkeypatches this).
_TEST_MODE = False


def band_interpret():
    """Interpret mode convs should pass to band calls ("xla" under the CPU
    test hook, False → Mosaic kernel otherwise)."""
    return "xla" if _TEST_MODE else False


def _band_platform_ok() -> bool:
    if _TEST_MODE:
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def band_ok(g, aggr: str, min_coverage: float = 0.5) -> bool:
    """Route GENConv's aggregation to the band path when profitable: a
    band-servable aggregator and a band attached with enough coverage (the
    leftover rides take+CSR either way — below ~50% coverage the A-matrix DMA
    exceeds what the skipped gather rows would have cost at the measured
    420M rows/s)."""
    return (aggr in BAND_SOFTMAX_AGGRS + BAND_SUM_AGGRS
            and band_sum_ok(g, min_coverage))


def band_sum_ok(g, min_coverage: float = 0.5) -> bool:
    """Gate for the plain-sum band route used by the non-GEN convs (GIN,
    SemiGCN, SAGE): band attached with enough coverage, TPU backend."""
    band = getattr(g, "band", None)
    if band is None:
        return False
    if band.fwd.coverage < min_coverage:
        from .segment import _miss
        return _miss("band_agg",
                     f"band coverage {band.fwd.coverage:.2f} < {min_coverage} "
                     "(graph not locality-ordered? run data/reorder.rcm_order)")
    return _band_platform_ok()
