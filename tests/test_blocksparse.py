"""Block-sparse SpMM (ops/blocksparse.py): gather-free A@x for locality-ordered
graphs. Goldens against jax.ops.segment_sum of x[senders]; VJP against the
reference path's gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_gcns_torch_tpu.ops.blocksparse import (BN, SB, T, BlockTiles,
                                                 block_spmm, build_block_tiles)


def ref_spmm(x, senders, receivers, n):
    return jax.ops.segment_sum(jnp.take(x, jnp.asarray(senders), axis=0),
                               jnp.asarray(receivers), n,
                               indices_are_sorted=False)


def banded_graph(rng, n, deg, bandwidth):
    s = rng.integers(0, n, n * deg)
    r = np.clip(s + rng.integers(-bandwidth, bandwidth + 1, n * deg), 0, n - 1)
    return s, r


@pytest.mark.parametrize("bandwidth", [100, 1000])
def test_block_spmm_matches_segment_sum(rng_np, bandwidth):
    n = 2 * SB
    s, r = banded_graph(rng_np, n, 6, bandwidth)
    x = jnp.asarray(rng_np.standard_normal((n, 128)).astype(np.float32))
    tiles, tiles_t = build_block_tiles(s, r, n)
    assert tiles.n_edges == len(s)
    got = block_spmm(x, tiles, tiles_t, True)
    want = ref_spmm(x, s, r, n)
    # accumulation order differs (per-tile partial sums) → f32 reassociation
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4,
                               atol=1e-4)


def test_block_spmm_empty_receiver_blocks(rng_np):
    """Receiver blocks with no incoming edges must come out zero."""
    n = 2 * SB
    # all receivers land in block 1 only
    s = rng_np.integers(0, n, 500)
    r = rng_np.integers(BN, 2 * BN, 500)
    x = jnp.asarray(rng_np.standard_normal((n, 128)).astype(np.float32))
    tiles, tiles_t = build_block_tiles(s, r, n)
    got = np.asarray(block_spmm(x, tiles, tiles_t, True))
    want = np.asarray(ref_spmm(x, s, r, n))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert np.all(got[:BN] == 0) and np.all(got[2 * BN:] == 0)


def test_block_spmm_grad_matches_reference(rng_np):
    n = 2 * SB
    s, r = banded_graph(rng_np, n, 5, 200)
    x = jnp.asarray(rng_np.standard_normal((n, 128)).astype(np.float32))
    tiles, tiles_t = build_block_tiles(s, r, n)
    co = jnp.asarray(rng_np.standard_normal((n, 128)).astype(np.float32))

    g1 = jax.grad(lambda x_: jnp.sum(block_spmm(x_, tiles, tiles_t, True) * co))(x)
    g2 = jax.grad(lambda x_: jnp.sum(ref_spmm(x_, s, r, n) * co))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=3e-4,
                               atol=1e-4)


def test_tile_fill_reporting(rng_np):
    n = 2 * SB
    s, r = banded_graph(rng_np, n, 20, 64)   # tight band → dense pairs
    tiles, _ = build_block_tiles(s, r, n)
    assert 0.0 < tiles.fill <= 1.0
    s2 = rng_np.integers(0, n, n * 4)        # ER → ~1 edge per pair
    r2 = rng_np.integers(0, n, n * 4)
    tiles2, _ = build_block_tiles(s2, r2, n)
    assert tiles.fill > tiles2.fill
