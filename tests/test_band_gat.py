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


def test_symgat_per_receiver_stabilizer_matches_segment_path(rng_np):
    """stabilizer="per_receiver" (sender-only scores through the dense route
    with er=0): fwd + grads match the segment path, incl. hubs, sym-norm,
    residual and hash edge-drop (VERDICT r4 next #6)."""
    g = make_graph(rng_np, hubby=True)
    conv = SymGATConv(32, 16, num_heads=3, use_attn_dst=False,
                      use_symmetric_norm=True, residual=True, edge_drop=0.4,
                      stabilizer="per_receiver")
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


import pytest as _pytest


@_pytest.mark.parametrize("spread", [90.0, 150.0])
def test_wide_score_spread_envelope(rng_np, spread):
    """The round-5 NaN mechanism and its two mitigations, at op level.

    With a per-head score spread ≫ 87 (one hub sender far above everyone),
    the GLOBAL-stabilizer fast path (band_gat_agg) underflows den to 0 /
    f32-denormals for receivers that don't see the hub — its caller guard
    (DEN_TINY) must then (a) emit 0 there WITHOUT NaN gradients, while
    (b) the per-receiver dense route stays exact vs the segment path.
    spread=90 puts hub-blind dens in the f32-DENORMAL window (the exact
    regime whose unguarded backward NaNs — verified to NaN under the old
    den>0 guard in f32 as well as bf16: the spread, not the dtype, is the
    envelope); spread=150 flushes them cleanly to zero."""
    from deep_gcns_torch_tpu.ops.band import band_gat_agg, band_gat_dense_agg
    from deep_gcns_torch_tpu.ops.segment import segment_softmax, segment_sum
    from deep_gcns_torch_tpu.convs.dgl_gat import DEN_TINY, _safe_div

    n, deg = 512, 6
    s = rng_np.integers(0, n, n * deg)
    r = np.clip(s + rng_np.integers(-80, 81, n * deg), 0, n - 1)
    # make node 0 a hub sender into the first few receivers only
    s[:8] = 0
    r[:8] = np.arange(8)
    g = attach_band(build_graph(
        rng_np.standard_normal((n, 32)).astype(np.float32), s, r,
        num_nodes=n), window=256, hubs=None)
    npd = g.num_nodes_padded
    h, d = 2, 16
    feat = jnp.asarray(rng_np.standard_normal((npd, h, d)).astype(np.float32))
    el_np = rng_np.standard_normal((npd, h)).astype(np.float32)
    el_np[0] = spread  # hub scores far above the crowd: spread >> exp range
    el = jnp.asarray(el_np)

    def global_route(el_, feat_):
        num, den = band_gat_agg(feat_, el_, g.band, 0.2, interpret="xla")
        return _safe_div(num, den)

    def dense_route(el_, feat_):
        num, den = band_gat_dense_agg(feat_, el_, jnp.zeros_like(el_), g.band,
                                      0.2, interpret="xla")
        return _safe_div(num, den)

    def segment_route(el_, feat_):
        score = jax.nn.leaky_relu(
            jnp.take(el_, jnp.minimum(g.senders, npd - 1), axis=0), 0.2)
        alpha = segment_softmax(score, g.receivers, npd, mask=g.edge_mask)
        msg = jnp.take(feat_, jnp.minimum(g.senders, npd - 1), axis=0)
        return segment_sum(msg * alpha[..., None], g.receivers, npd,
                           mask=g.edge_mask)

    out_g = global_route(el, feat)
    out_d = dense_route(el, feat)
    out_s = segment_route(el, feat)
    # (b) per-receiver dense route is exact everywhere
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s),
                               rtol=2e-3, atol=2e-4)
    # the global route demonstrably zeroes hub-blind receivers (the envelope)
    zeroed = np.flatnonzero(
        (np.abs(np.asarray(out_g)).sum(axis=(1, 2)) == 0)
        & (np.abs(np.asarray(out_s)).sum(axis=(1, 2)) > 1e-3))
    assert zeroed.size > 0
    # (a) ... but with FINITE gradients thanks to the DEN_TINY guard
    co = jnp.asarray(rng_np.standard_normal(out_s.shape).astype(np.float32))
    for route in (global_route, dense_route):
        gel, gfeat = jax.grad(
            lambda e_, f_: jnp.sum(route(e_, f_) * co), argnums=(0, 1))(
                el, feat)
        assert bool(jnp.all(jnp.isfinite(gel)))
        assert bool(jnp.all(jnp.isfinite(gfeat)))
    # dense-route grads also match the segment path on this adversarial input
    gd = jax.grad(lambda e_, f_: jnp.sum(dense_route(e_, f_) * co),
                  argnums=(0, 1))(el, feat)
    gs = jax.grad(lambda e_, f_: jnp.sum(segment_route(e_, f_) * co),
                  argnums=(0, 1))(el, feat)
    for a, b in zip(gd, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=4e-3,
                                   atol=4e-4)


def test_safe_div_custom_vjp_matches_autodiff_and_survives_tiny_dens(rng_np):
    """_safe_div's reassociated backward: exact vs plain autodiff on healthy
    dens, and finite at dens just above DEN_TINY where plain autodiff's den²
    underflows f32 (flushed to 0 on TPU → inf/NaN; the round-5 repro)."""
    from deep_gcns_torch_tpu.convs.dgl_gat import DEN_TINY, _safe_div

    num = jnp.asarray(rng_np.standard_normal((32, 2, 8)).astype(np.float32))
    den = jnp.asarray((rng_np.random((32, 2)) + 0.5).astype(np.float32))
    co = jnp.asarray(rng_np.standard_normal((32, 2, 8)).astype(np.float32))

    def naive(num_, den_):
        ok = den_ > DEN_TINY
        return jnp.where(ok[..., None],
                         num_ / jnp.where(ok, den_, 1.0)[..., None], 0.0)

    g1 = jax.grad(lambda a, b: jnp.sum(_safe_div(a, b) * co),
                  argnums=(0, 1))(num, den)
    g2 = jax.grad(lambda a, b: jnp.sum(naive(a, b) * co),
                  argnums=(0, 1))(num, den)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)

    # tiny dens: scale num down with den so out stays O(1) (softmax reality)
    tiny = jnp.asarray(np.full((32, 2), 3e-20, np.float32))
    num_t = num * tiny[..., None]
    gn, gd = jax.grad(lambda a, b: jnp.sum(_safe_div(a, b) * co),
                      argnums=(0, 1))(num_t, tiny)
    assert bool(jnp.all(jnp.isfinite(gn))) and bool(jnp.all(jnp.isfinite(gd)))
    # d_den = -<g,out>/den stays within f32 range (|out|~1, den=3e-20 → ~1e20)
    assert float(jnp.max(jnp.abs(gd))) < 3e21
