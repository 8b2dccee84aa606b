"""Real-chip Mosaic kernel tests (`pytest -m tpu` on a TPU host; auto-skipped
on CPU — see conftest.py).

The CPU suite exercises the band/CSC paths through XLA emulation
(interpret="xla" / the Pallas interpreter); these tests compile the ACTUAL
Mosaic kernels so kernel drift is caught the day CI gets a chip (VERDICT r3
weak #6).  Shapes stay small to keep tunnel compiles ~20-40s each.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _banded(rng, n, deg, bw):
    s = rng.integers(0, n, n * deg)
    r = np.clip(s + rng.integers(-bw, bw + 1, n * deg), 0, n - 1)
    return s, r


def _ref_spmm(x, s, r, n):
    return jax.ops.segment_sum(jnp.take(x, jnp.asarray(s), axis=0),
                               jnp.asarray(r), n, indices_are_sorted=False)


def test_band_kernel_mosaic_parity(rng_np):
    """band_spmm fwd+grad on the real kernel (DMA windows, int8 A blocks) vs
    XLA segment_sum — includes an off-band leftover in both directions."""
    from deep_gcns_torch_tpu.ops.band import band_spmm, build_band_pair

    n = 2048
    s, r = _banded(rng_np, n, 6, 700)
    bp = build_band_pair(s, r, n, 256, hubs=None)
    assert bp.fwd.n_lo > 0 and bp.bwd.n_lo > 0
    x = jnp.asarray(rng_np.standard_normal((n, 128)).astype(np.float32))
    co = jnp.asarray(rng_np.standard_normal((n, 128)).astype(np.float32))
    bp_d = jax.device_put(bp)
    got, gx = jax.jit(lambda x_: (
        band_spmm(x_, bp_d),
        jax.grad(lambda x__: jnp.sum(band_spmm(x__, bp_d) * co))(x_)))(x)
    want = _ref_spmm(x, s, r, n)
    gwant = jax.grad(lambda x_: jnp.sum(_ref_spmm(x_, s, r, n) * co))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gwant), rtol=3e-4,
                               atol=1e-4)


def test_band_kernel_with_hubs_parity(rng_np):
    """Hub-extended band (dense hub-column/row matmuls) on chip."""
    from deep_gcns_torch_tpu.ops.band import band_spmm, build_band_pair

    n = 2048
    w = (1.0 / (1.0 + np.arange(n, dtype=np.float64))) ** 0.9
    rng_np.shuffle(w)
    s = rng_np.choice(n, n * 6, p=w / w.sum())
    r = np.clip(s + rng_np.integers(-200, 201, n * 6), 0, n - 1)
    cross = rng_np.random(n * 6) < 0.3
    r[cross] = rng_np.integers(0, n, int(cross.sum()))
    bp = build_band_pair(s, r, n, 256, hubs=32)
    assert bp.fwd.n_hub > 0 and bp.bwd.n_hub_row > 0
    x = jnp.asarray(rng_np.standard_normal((n, 128)).astype(np.float32))
    got = jax.jit(lambda x_: band_spmm(x_, jax.device_put(bp)))(x)
    want = _ref_spmm(x, s, r, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4,
                               atol=1e-4)


def test_csc_segment_sum_kernel_parity(rng_np):
    """segment_sum_csr (one-hot MXU matmul kernel) on chip vs XLA."""
    from deep_gcns_torch_tpu.graph import build_graph
    from deep_gcns_torch_tpu.ops.spmm_pallas import segment_sum_csr

    n = 1024
    s = rng_np.integers(0, n, 4096)
    r = rng_np.integers(0, n, 4096)
    g = build_graph(None, s, r, num_nodes=n, node_pad=n)
    x = jnp.asarray(rng_np.standard_normal((g.num_edges_padded, 128))
                    .astype(np.float32))
    got = jax.jit(lambda x_: segment_sum_csr(x_, g.receivers, g.row_ptr))(x)
    em = np.asarray(g.edge_mask)
    want = jax.ops.segment_sum(
        jnp.where(jnp.asarray(em)[:, None], x, 0),
        jnp.minimum(g.receivers, n - 1), n, indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4,
                               atol=1e-4)


def test_fused_softmax_gather_agg_kernel_parity(rng_np):
    """The fused CSC softmax-aggregation kernel pair on chip vs the unfused
    XLA reference semantics (relu+eps message, softmax_sg aggregation)."""
    from deep_gcns_torch_tpu.graph import build_graph
    from deep_gcns_torch_tpu.ops.segment import generalized_aggregate
    from deep_gcns_torch_tpu.ops.spmm_pallas import fused_softmax_gather_agg

    n = 1024
    s = rng_np.integers(0, n, 4096)
    r = rng_np.integers(0, n, 4096)
    g = build_graph(None, s, r, num_nodes=n, node_pad=n)
    x = jnp.asarray(rng_np.standard_normal((n, 128)).astype(np.float32))
    t = jnp.asarray([0.7], jnp.float32)
    got = jax.jit(lambda x_: fused_softmax_gather_agg(
        x_, g.senders, g.receivers, g.row_ptr, g.csc_senders,
        g.csc_receivers, g.csc_col_ptr, t, None, None, 1e-7, False))(x)
    msg = jax.nn.relu(jnp.take(x, jnp.asarray(s), axis=0)) + 1e-7
    want = generalized_aggregate(msg, jnp.asarray(r), n, aggr="softmax_sg",
                                 t=t, learn_t=False, indices_are_sorted=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-3,
                               atol=1e-3)


def test_band_drop_kernel_matches_edge_mask(rng_np):
    """The Mosaic drop branch (in-kernel hash masking) must equal the
    per-edge hash mask applied through the reference segment path."""
    from deep_gcns_torch_tpu.graph import build_graph
    from deep_gcns_torch_tpu.ops.band import (build_band_pair, band_spmm,
                                              edge_keep_mask, make_edge_drop)

    n = 2048
    s, r = _banded(rng_np, n, 6, 700)
    bp = build_band_pair(s, r, n, 256, hubs=None)
    g = build_graph(None, s, r, num_nodes=n, node_pad=n)
    x = jnp.asarray(rng_np.standard_normal((n, 128)).astype(np.float32))
    spec = make_edge_drop(jax.random.PRNGKey(5), 0.4)
    bp_d = jax.device_put(bp)
    got, gx = jax.jit(lambda x_: (
        band_spmm(x_, bp_d, False, spec),
        jax.grad(lambda x__: jnp.sum(band_spmm(x__, bp_d, False, spec)))(x_)
    ))(x)
    keep = edge_keep_mask(spec, g.receivers, g.senders)
    xg = jnp.take(x, jnp.minimum(g.senders, n - 1), axis=0)
    masked = xg * (keep * g.edge_mask)[:, None]
    want = jax.ops.segment_sum(masked, jnp.minimum(g.receivers, n - 1), n,
                               indices_are_sorted=True)
    gwant = jax.grad(lambda x_: jnp.sum(jax.ops.segment_sum(
        jnp.take(x_, jnp.minimum(g.senders, n - 1), axis=0)
        * (keep * g.edge_mask)[:, None],
        jnp.minimum(g.receivers, n - 1), n)))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gwant), rtol=3e-4,
                               atol=1e-4)
