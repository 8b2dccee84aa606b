"""Block-sparse SpMM: the gather-free aggregation path for locality-ordered graphs.

ROOFLINE.md measures XLA's row gather at ~420M rows/s REGARDLESS of index
locality (issue-rate bound) — the dominant cost of the CSR path's
`x[senders]`.  For graphs whose edges concentrate in (receiver-block,
sender-block) pairs (banded / RCM-ordered / strongly clustered), this module
removes the gather entirely:

  host:   sort edges by (rb, sb); cut into tiles of ≤T edges, one (rb, sb)
          pair per tile, tiles ordered by rb;
  kernel: grid over tiles; the x SOURCE BLOCK arrives by a data-dependent
          BlockSpec index_map (sb prefetched) — a contiguous 32KB DMA instead
          of T row gathers; per-edge rows are reconstructed with a one-hot
          matmul (out = onehot_recv @ (onehot_send @ x_block)), accumulated in
          a VMEM scratch across the tiles of one receiver block and flushed
          through the revisited output block.

Cost per FULL tile: two [T,BN]x[BN,C] MXU dots per T edges + one 32KB block
DMA — ~5x the take+CSR path at bench-like shapes when tiles are ≥~60% full.
Tile fill is the whole game: an ER-random graph has ~1.45 edges per 128x128
block pair (useless); a bandwidth-B banded graph has ~BN·deg/(B/BN) per pair.
`build_block_tiles` reports the fill ratio so callers can route.

The backward is the same kernel on host-built TRANSPOSE tiles (dx = Aᵀ @ g).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BN = 128    # receiver rows per output block (matches spmm_pallas.BN)
SB = 128    # sender rows per SOURCE block: small one-hot AREA (the VPU compare
            # + convert per tile is T*(SB+BN) elements — measured VPU-bound at
            # SB=512); the inner-loop dots amortize the K=128 MXU pipeline
T = 512     # edges per tile


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BlockTiles:
    """One direction's tile structure (A or Aᵀ)."""

    tile_start: Array  # [NB+1] int32: tiles of receiver block b are
                       # [tile_start[b], tile_start[b+1]) (tiles sorted by rb)
    tile_sb: Array     # [Nt] int32 sender (source) block id per tile
    # per-tile offsets packed into one (8, T)-tiled array (Mosaic block shapes
    # need the last two dims (8k, 128k)): row 0 = sender offset in its SOURCE
    # block [0, SB), row 1 = receiver offset [0, BN), rows 2-7 pad; sentinels
    # SB/BN match no one-hot row
    offs: Array        # [Nt, 8, T] int32
    n_blocks: int = field(default=0, metadata=dict(static=True))
    n_edges: int = field(default=0, metadata=dict(static=True))

    @property
    def fill(self) -> float:
        """Fraction of tile slots holding real edges."""
        nt = int(self.tile_sb.shape[0])
        return self.n_edges / max(nt * T, 1)


def _build_one(senders, receivers, n_blocks):
    rb = receivers // BN
    sb = senders // SB
    order = np.lexsort((senders, sb, rb))
    s, r, rbo, sbo = senders[order], receivers[order], rb[order], sb[order]
    # tile boundaries: pair changes or T-edge cuts (vectorized)
    pair = rbo.astype(np.int64) * n_blocks + sbo
    if len(pair):
        pstart = np.concatenate([[0], np.nonzero(np.diff(pair))[0] + 1])
        plen = np.diff(np.concatenate([pstart, [len(pair)]]))
        within = np.arange(len(pair)) - np.repeat(pstart, plen)
        starts = np.nonzero(within % T == 0)[0].tolist() + [len(pair)]
    else:
        starts = [0, 0]
    tiles = [(int(rbo[a]), int(sbo[a]), s[a:b] % SB, r[a:b] % BN)
             for a, b in zip(starts[:-1], starts[1:])]
    nt = len(tiles)
    tile_rb = np.fromiter((t[0] for t in tiles), np.int64, nt)
    tile_start = np.searchsorted(tile_rb, np.arange(n_blocks + 1)).astype(np.int32)
    tile_sb = np.fromiter((t[1] for t in tiles), np.int32, nt)
    offs = np.full((max(nt, 1), 8, T), max(SB, BN), np.int32)
    for i, (_, _, so, ro) in enumerate(tiles):
        offs[i, 0, : len(so)] = so
        offs[i, 1, : len(ro)] = ro
    return BlockTiles(tile_start=tile_start, tile_sb=tile_sb, offs=offs,
                      n_blocks=n_blocks, n_edges=len(senders))


def build_block_tiles(senders: np.ndarray, receivers: np.ndarray, n_pad: int):
    """Host-side tile structures for A (forward) and Aᵀ (backward).

    n_pad must be an SB multiple; senders/receivers are VALID edges only (drop
    padding sentinels before calling)."""
    assert n_pad % SB == 0, n_pad
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    nb = n_pad // BN
    fwd = _build_one(senders, receivers, nb)
    bwd = _build_one(receivers, senders, nb)  # Aᵀ: roles swapped
    return fwd, bwd


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

NBUF = 6       # tile slots in the manual pipeline (one grid step per tile
LOOKAHEAD = 4  # costs ~1.5µs of Mosaic overhead — measured 10ms/2.5M edges —
               # so the tile loop runs INSIDE the kernel with deep-prefetch
               # dynamic DMAs, the same pattern as the streamed CSR kernels)


def _bsp_kernel(start_ref, sb_ref, offs_hbm, x_hbm, out_ref,
                x_buf, o_buf, sem_x, sem_o, acc, *, c):
    i = pl.program_id(0)
    lo = start_ref[i]
    hi = start_ref[i + 1]

    def _copies(t, slot):
        sb = sb_ref[t]
        return (
            pltpu.make_async_copy(x_hbm.at[pl.ds(sb * SB, SB), :],
                                  x_buf.at[slot], sem_x.at[slot]),
            pltpu.make_async_copy(offs_hbm.at[t], o_buf.at[slot],
                                  sem_o.at[slot]),
        )

    def _issue(t, slot):
        for cp in _copies(t, slot):
            cp.start()

    def _wait(t, slot):
        for cp in _copies(t, slot):
            cp.wait()

    # warm-up: prefetch the first LOOKAHEAD+1 tiles (slots RELATIVE to lo:
    # slot(t) = (t - lo) % NBUF)
    def _warm(j, _):
        @pl.when(lo + j < hi)
        def _():
            _issue(lo + j, j % NBUF)
        return 0

    jax.lax.fori_loop(0, LOOKAHEAD + 1, _warm, 0)

    # one-hots are built in their LANE-NATIVE orientation (offset vectors stay
    # [1, T] rows; iota runs down sublanes) — reshaping offsets to a [T, 1]
    # column costs a cross-layout transpose of T elements per one-hot
    # (~1µs/tile, measured: it dominated the kernel). The send dot contracts
    # over dim 0 of BOTH operands instead.
    iota_sb = jax.lax.broadcasted_iota(jnp.int32, (SB, 1), 0)
    iota_bn = jax.lax.broadcasted_iota(jnp.int32, (BN, 1), 0)
    cd = x_hbm.dtype

    def body(t, acc_v):
        slot = (t - lo) % NBUF
        nxt = t + LOOKAHEAD + 1

        @pl.when(nxt < hi)
        def _():
            _issue(nxt, (nxt - lo) % NBUF)

        _wait(t, slot)
        soff = o_buf[slot, 0:1, :]                   # [1, T] lane-major
        roff = o_buf[slot, 1:2, :]
        onehot_st = (soff == iota_sb).astype(cd)     # [SB, T]; pad cols all-zero
        xj = jax.lax.dot_general(onehot_st, x_buf[slot],
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [T, C]
        onehot_r = (roff == iota_bn).astype(cd)      # [BN, T]
        return acc_v + jax.lax.dot_general(
            onehot_r, xj.astype(cd), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(lo, hi, body, jnp.zeros((BN, c), jnp.float32))
    out_ref[:, :] = acc.astype(out_ref.dtype)


def _bsp_spmm_call(x: Array, tiles: BlockTiles, interpret: bool) -> Array:
    n_pad, c = x.shape
    assert n_pad % SB == 0 and c % 128 == 0, (n_pad, c)
    nb = tiles.n_blocks
    kernel = functools.partial(_bsp_kernel, c=c)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # tile_start, tile_sb
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # offs [Nt, 8, T] (HBM)
                pl.BlockSpec(memory_space=pl.ANY),   # x [N_pad, C] (HBM)
            ],
            out_specs=pl.BlockSpec((BN, c), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((NBUF, SB, c), x.dtype),
                pltpu.VMEM((NBUF, 8, T), jnp.int32),
                pltpu.SemaphoreType.DMA((NBUF,)),
                pltpu.SemaphoreType.DMA((NBUF,)),
                pltpu.VMEM((BN, c), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), x.dtype),
        interpret=interpret,
    )(tiles.tile_start, tiles.tile_sb, tiles.offs, x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def block_spmm(x: Array, tiles: BlockTiles, tiles_t: BlockTiles,
               interpret: bool = False) -> Array:
    """out = A @ x for the 0/1 adjacency encoded by `tiles`
    (out[r] = Σ_{e: recv=e→r} x[send_e]); backward runs the same kernel on the
    transpose tiles (dx = Aᵀ @ g).  x must be lane-aligned (C % 128 == 0) and
    node-padded to a BN multiple."""
    return _bsp_spmm_call(x, tiles, interpret)


def _bsp_fwd(x, tiles, tiles_t, interpret):
    return _bsp_spmm_call(x, tiles, interpret), tiles_t


def _bsp_bwd(interpret, tiles_t, g):
    return _bsp_spmm_call(g, tiles_t, interpret), None, None


block_spmm.defvjp(_bsp_fwd, _bsp_bwd)
