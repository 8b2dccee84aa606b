"""Band-dense GAT (ops/band.band_gat_agg + SymGATConv band route): parity with
the segment-softmax path.  The sender-only score (`use_attn_dst=False`, the
published RevGAT config) is node-factored, so the band serves it like the GEN
softmax family (VERDICT r3 #4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import deep_gcns_torch_tpu.ops.band as band_mod
from deep_gcns_torch_tpu.convs.dgl_gat import SymGATConv
from deep_gcns_torch_tpu.graph import attach_band, build_graph


@pytest.fixture(autouse=True)
def _band_test_mode():
    band_mod._TEST_MODE = True
    yield
    band_mod._TEST_MODE = False


def make_graph(rng, n=512, deg=6, hubby=False):
    if hubby:
        w = (1.0 / (1.0 + np.arange(n, dtype=np.float64))) ** 0.9
        rng.shuffle(w)
        s = rng.choice(n, n * deg, p=w / w.sum())
    else:
        s = rng.integers(0, n, n * deg)
    r = np.clip(s + rng.integers(-100, 101, n * deg), 0, n - 1)
    x = rng.standard_normal((n, 32)).astype(np.float32)
    g = build_graph(x, s, r, num_nodes=n)
    return attach_band(g, window=256, hubs=64 if hubby else None)


@pytest.mark.parametrize("hubby,sym,res", [(False, False, False),
                                           (True, True, True)])
def test_symgat_band_matches_segment_path(rng_np, hubby, sym, res):
    g = make_graph(rng_np, hubby=hubby)
    conv = SymGATConv(32, 16, num_heads=3, use_attn_dst=False,
                      use_symmetric_norm=sym, residual=res)
    params, _ = conv.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.asarray(g.x))

    assert band_mod.band_sum_ok(g)
    out_band, _ = conv.apply(params, {}, x, g)
    out_seg, _ = conv.apply(params, {}, x, g.replace(band=None))
    np.testing.assert_allclose(np.asarray(out_band), np.asarray(out_seg),
                               rtol=2e-3, atol=2e-4)


def test_symgat_band_grads_match(rng_np):
    g = make_graph(rng_np, hubby=True)
    conv = SymGATConv(32, 16, num_heads=2, use_attn_dst=False)
    params, _ = conv.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.asarray(g.x))
    co = jnp.asarray(rng_np.standard_normal((g.num_nodes_padded, 2, 16))
                     .astype(np.float32))

    def loss(p, x_, graph):
        out, _ = conv.apply(p, {}, x_, graph)
        return jnp.sum(out * co)

    gb = jax.grad(loss, argnums=(0, 1))(params, x, g)
    gs = jax.grad(loss, argnums=(0, 1))(params, x, g.replace(band=None))
    for a, b in zip(jax.tree_util.tree_leaves(gb),
                    jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-3,
                                   atol=3e-4)


def test_symgat_edge_drop_falls_back(rng_np):
    """Training with edge-drop keeps the fused/segment path (per-edge masks
    are not band-expressible yet) — band and non-band graphs must agree."""
    g = make_graph(rng_np)
    conv = SymGATConv(32, 16, num_heads=2, use_attn_dst=False, edge_drop=0.5)
    params, _ = conv.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.asarray(g.x))
    keep = jnp.asarray(
        rng_np.random(g.num_edges_padded) > 0.5).astype(np.float32)
    o1, _ = conv.apply(params, {}, x, g, train=True, keep_mask=keep)
    o2, _ = conv.apply(params, {}, x, g.replace(band=None), train=True,
                       keep_mask=keep)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-3,
                               atol=2e-4)


def test_band_gat_agg_empty_receivers_zero(rng_np):
    """Receivers with no incoming edges get exactly 0 (den==0 masking)."""
    n = 256
    s = rng_np.integers(0, n, 800)
    r = rng_np.integers(0, 128, 800)   # second half receives nothing
    x = rng_np.standard_normal((n, 32)).astype(np.float32)
    g = attach_band(build_graph(x, s, r, num_nodes=n), window=256)
    conv = SymGATConv(32, 8, num_heads=2, use_attn_dst=False)
    params, _ = conv.init(jax.random.PRNGKey(0))
    out, _ = conv.apply(params, {}, jnp.asarray(x), g)
    assert np.all(np.asarray(out)[128:] == 0)


def test_revgat_edge_drop_band_matches_csc(rng_np):
    """Edge-drop TRAINING through the band: the hash DropSpec reproduces the
    same keep draws in the band kernel, its transpose, and the per-edge CSC
    path — so a full RevGAT train forward+grad is identical with and without
    the band attached."""
    from deep_gcns_torch_tpu.models.rev_gat import RevGAT, RevGATConfig

    g = make_graph(rng_np, n=512, hubby=True)
    cfg = RevGATConfig(in_feats=32, n_classes=8, n_layers=4, n_hidden=12,
                       n_heads=2, group=2, dropout=0.3, input_drop=0.1,
                       edge_drop=0.4)
    model = RevGAT(cfg)
    params, _ = jax.jit(model.init)(jax.random.PRNGKey(0))
    x = jnp.asarray(np.asarray(g.x))
    lab = jnp.asarray(rng_np.integers(0, 8, g.num_nodes_padded))
    co_rng = jax.random.PRNGKey(7)

    def loss(p, graph):
        out, _ = model.apply(p, {}, x, graph, train=True, rng=co_rng)
        logp = jax.nn.log_softmax(out, -1)
        nll = -jnp.take_along_axis(logp, lab[:, None], 1)[:, 0]
        m = graph.node_mask.astype(nll.dtype)
        return jnp.sum(nll * m) / jnp.sum(m)

    l_band, g_band = jax.value_and_grad(loss)(params, g)
    l_csc, g_csc = jax.value_and_grad(loss)(params, g.replace(band=None))
    np.testing.assert_allclose(float(l_band), float(l_csc), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_band),
                    jax.tree_util.tree_leaves(g_csc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=4e-3,
                                   atol=4e-4)


def test_drop_spec_statistics_and_determinism(rng_np):
    """Hash keep rate ≈ 1-p; same key → same mask; different key → different."""
    from deep_gcns_torch_tpu.ops.band import (drop_key_bits, edge_keep_mask,
                                              make_edge_drop)

    r = jnp.asarray(rng_np.integers(0, 100_000, 50_000))
    s = jnp.asarray(rng_np.integers(0, 100_000, 50_000))
    spec = make_edge_drop(jax.random.PRNGKey(3), 0.3)
    k1 = np.asarray(edge_keep_mask(spec, r, s))
    k2 = np.asarray(edge_keep_mask(spec, r, s))
    np.testing.assert_array_equal(k1, k2)
    assert abs(k1.mean() - 0.7) < 0.02
    spec2 = make_edge_drop(jax.random.PRNGKey(4), 0.3)
    k3 = np.asarray(edge_keep_mask(spec2, r, s))
    assert (k1 != k3).mean() > 0.2
    assert make_edge_drop(jax.random.PRNGKey(0), 0.0) is None
    assert drop_key_bits(jax.random.PRNGKey(5)).shape == (2,)


def test_symgat_dense_dst_score_matches_segment_path(rng_np):
    """use_attn_dst=True through DENSE in-window score evaluation: fwd +
    grads match the segment path, incl. sym-norm/residual and hash edge-drop
    (hub-free band)."""
    n = 512
    s = rng_np.integers(0, n, n * 6)
    r = np.clip(s + rng_np.integers(-80, 81, n * 6), 0, n - 1)
    x = rng_np.standard_normal((n, 32)).astype(np.float32)
    g = attach_band(build_graph(x, s, r, num_nodes=n), window=256, hubs=None)
    assert g.band.fwd.hub_ids is None
    conv = SymGATConv(32, 16, num_heads=3, use_attn_dst=True,
                      use_symmetric_norm=True, residual=True, edge_drop=0.4)
    params, _ = conv.init(jax.random.PRNGKey(0))
    xj = jnp.asarray(np.asarray(g.x))

    from deep_gcns_torch_tpu.ops.band import drop_key_bits
    dk = drop_key_bits(jax.random.PRNGKey(3))
    co = jnp.asarray(rng_np.standard_normal((g.num_nodes_padded, 3, 16))
                     .astype(np.float32))

    for kwargs in ({}, {"train": True, "drop_key": dk}):
        def loss(p, x_, graph):
            out, _ = conv.apply(p, {}, x_, graph, **kwargs)
            return jnp.sum(out * co)

        l1, g1 = jax.value_and_grad(loss, argnums=(0, 1))(params, xj, g)
        l2, g2 = jax.value_and_grad(loss, argnums=(0, 1))(
            params, xj, g.replace(band=None))
        np.testing.assert_allclose(float(l1), float(l2), rtol=2e-4)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=4e-3, atol=4e-4)


def test_dense_dst_gate_hub_capable(rng_np):
    """Round 5: the dense dst-score route serves hub structures too (its own
    dense score passes share the stabilizer) — only coverage still gates."""
    from deep_gcns_torch_tpu.ops.band import band_gat_dense_ok

    g = make_graph(rng_np, hubby=True)  # hub structures present
    assert g.band.fwd.hub_ids is not None
    assert band_gat_dense_ok(g) is True
    g2 = make_graph(rng_np, hubby=False)
    assert band_gat_dense_ok(g2) is True
    assert band_gat_dense_ok(g2, min_coverage=1.01) is False


def test_symgat_dense_dst_score_hubby_matches_segment_path(rng_np):
    """use_attn_dst=True on a HUBBY band (hub cols + hub rows + leftover):
    fwd + grads match the segment path, with and without hash edge-drop."""
    g = make_graph(rng_np, n=512, deg=8, hubby=True)
    f = g.band.fwd
    assert f.hub_ids is not None and f.hub_row_ids is not None
    conv = SymGATConv(32, 16, num_heads=3, use_attn_dst=True,
                      use_symmetric_norm=True, residual=True, edge_drop=0.4)
    params, _ = conv.init(jax.random.PRNGKey(0))
    xj = jnp.asarray(np.asarray(g.x))

    from deep_gcns_torch_tpu.ops.band import drop_key_bits
    dk = drop_key_bits(jax.random.PRNGKey(3))
    co = jnp.asarray(rng_np.standard_normal((g.num_nodes_padded, 3, 16))
                     .astype(np.float32))

    for kwargs in ({}, {"train": True, "drop_key": dk}):
        def loss(p, x_, graph):
            out, _ = conv.apply(p, {}, x_, graph, **kwargs)
            return jnp.sum(out * co)

        l1, g1 = jax.value_and_grad(loss, argnums=(0, 1))(params, xj, g)
        l2, g2 = jax.value_and_grad(loss, argnums=(0, 1))(
            params, xj, g.replace(band=None))
        np.testing.assert_allclose(float(l1), float(l2), rtol=2e-4)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=4e-3, atol=4e-4)


def test_pyg_gatconv_dense_band_hubby_matches_segment_path(rng_np):
    """PyG-flavor GATConv (analytic self) on a hubby band — the self_count
    cancellation must compose with the hub structures."""
    from deep_gcns_torch_tpu.convs.sparse import GATConv

    n = 512
    w = (1.0 / (1.0 + np.arange(n, dtype=np.float64))) ** 0.9
    rng_np.shuffle(w)
    s = rng_np.choice(n, n * 6, p=w / w.sum())
    r = np.clip(s + rng_np.integers(-80, 81, n * 6), 0, n - 1)
    self_ids = rng_np.choice(n, n // 3, replace=False)
    s = np.concatenate([s, self_ids])
    r = np.concatenate([r, self_ids])
    x = rng_np.standard_normal((n, 32)).astype(np.float32)
    g = attach_band(build_graph(x, s, r, num_nodes=n), window=256, hubs=64)
    assert g.band.fwd.hub_ids is not None
    conv = GATConv(32, 16, heads=2, act="relu", norm=None)
    params, state = conv.init(jax.random.PRNGKey(0))
    xj = jnp.asarray(np.asarray(g.x))
    co = jnp.asarray(rng_np.standard_normal((g.num_nodes_padded, 32))
                     .astype(np.float32))

    def loss(p, x_, graph):
        out, _ = conv.apply(p, state, x_, graph)
        return jnp.sum(out * co)

    l1, g1 = jax.value_and_grad(loss, argnums=(0, 1))(params, xj, g)
    l2, g2 = jax.value_and_grad(loss, argnums=(0, 1))(
        params, xj, g.replace(band=None))
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=4e-3,
                                   atol=4e-4)


def test_pyg_gatconv_dense_band_matches_segment_path(rng_np):
    """PyG-flavor GATConv (dst+src score, neighbors ∪ {one self}, analytic
    self-loop) through the dense in-window route — incl. graphs with
    explicit self edges (cancelled by the self_count weighting)."""
    from deep_gcns_torch_tpu.convs.sparse import GATConv

    n = 512
    s = rng_np.integers(0, n, n * 5)
    r = np.clip(s + rng_np.integers(-80, 81, n * 5), 0, n - 1)
    # explicit self edges for a third of the nodes (PyG pipelines add them)
    self_ids = rng_np.choice(n, n // 3, replace=False)
    s = np.concatenate([s, self_ids])
    r = np.concatenate([r, self_ids])
    x = rng_np.standard_normal((n, 32)).astype(np.float32)
    g = attach_band(build_graph(x, s, r, num_nodes=n), window=256, hubs=None)
    conv = GATConv(32, 16, heads=2, act="relu", norm=None)
    params, state = conv.init(jax.random.PRNGKey(0))
    xj = jnp.asarray(np.asarray(g.x))
    co = jnp.asarray(rng_np.standard_normal((g.num_nodes_padded, 32))
                     .astype(np.float32))

    def loss(p, x_, graph):
        out, _ = conv.apply(p, state, x_, graph)
        return jnp.sum(out * co)

    l1, g1 = jax.value_and_grad(loss, argnums=(0, 1))(params, xj, g)
    l2, g2 = jax.value_and_grad(loss, argnums=(0, 1))(
        params, xj, g.replace(band=None))
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=4e-3,
                                   atol=4e-4)
