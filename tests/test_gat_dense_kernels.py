"""The gat_dense Mosaic kernels (interpret=True) vs the XLA emulation: the
window/hub-column passes must agree bit-for-tolerance on fwd AND the manual
VJP — including hash edge-drop — so the chip path is CI-checkable off-chip.
(The XLA emulation itself is parity-tested against the per-edge segment path
in tests/test_band_gat.py.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_gcns_torch_tpu.graph import attach_band, build_graph
from deep_gcns_torch_tpu.ops.band import make_edge_drop
from deep_gcns_torch_tpu.ops.gat_dense import gat_dense_agg


def make_inputs(rng, n=512, deg=6, h=3, d=16, hubby=True):
    if hubby:
        w = (1.0 / (1.0 + np.arange(n, dtype=np.float64))) ** 0.9
        rng.shuffle(w)
        s = rng.choice(n, n * deg, p=w / w.sum())
    else:
        s = rng.integers(0, n, n * deg)
    r = np.clip(s + rng.integers(-100, 101, n * deg), 0, n - 1)
    x = rng.standard_normal((n, 8)).astype(np.float32)
    g = build_graph(x, s, r, num_nodes=n)
    g = attach_band(g, window=256, hubs=64 if hubby else None)
    np_ = g.num_nodes_padded
    feat = jnp.asarray(rng.standard_normal((np_, h, d)).astype(np.float32))
    el = jnp.asarray(rng.standard_normal((np_, h)).astype(np.float32))
    er = jnp.asarray(rng.standard_normal((np_, h)).astype(np.float32))
    return g, feat, el, er


@pytest.mark.parametrize("hubby,dropping", [(False, False), (True, False),
                                            (True, True)])
def test_kernels_match_xla_fwd_and_vjp(rng_np, hubby, dropping):
    g, feat, el, er = make_inputs(rng_np, hubby=hubby)
    if hubby:
        assert g.band.fwd.hub_ids is not None
    drop = make_edge_drop(jax.random.PRNGKey(3), 0.4) if dropping else None
    co_n = jnp.asarray(rng_np.standard_normal(feat.shape).astype(np.float32))
    co_d = jnp.asarray(rng_np.standard_normal(el.shape).astype(np.float32))

    def run(interp):
        def loss(f, l, r_):
            num, den = gat_dense_agg(f, l, r_, None, None, None, g.band,
                                     drop, 0.2, None, interp)
            return jnp.sum(num * co_n) + jnp.sum(den * co_d)

        (lv, grads) = jax.value_and_grad(loss, argnums=(0, 1, 2))(feat, el, er)
        return lv, grads

    l_x, g_x = run("xla")
    l_k, g_k = run(True)   # Pallas interpreter
    np.testing.assert_allclose(float(l_k), float(l_x), rtol=1e-5)
    for a, b in zip(g_k, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)


def test_kernels_match_xla_self_flavor(rng_np):
    """PyG analytic-self flavor through the kernel path (hubby band)."""
    g, feat, el, er = make_inputs(rng_np, hubby=True)
    n = feat.shape[0]
    self_score = jax.nn.leaky_relu(el + er, 0.2)
    c_self = jax.ops.segment_sum(
        (g.edge_mask & (g.senders == g.receivers)).astype(jnp.float32),
        jnp.minimum(g.receivers, n - 1), n, indices_are_sorted=True)
    co_n = jnp.asarray(rng_np.standard_normal(feat.shape).astype(np.float32))

    def run(interp):
        def loss(f, ss):
            num, den = gat_dense_agg(f, el, er, ss, f, c_self, g.band,
                                     None, 0.2, None, interp)
            return jnp.sum(num * co_n) + jnp.sum(den)

        return jax.value_and_grad(loss, argnums=(0, 1))(feat, self_score)

    l_x, g_x = run("xla")
    l_k, g_k = run(True)
    np.testing.assert_allclose(float(l_k), float(l_x), rtol=1e-5)
    for a, b in zip(g_k, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)
