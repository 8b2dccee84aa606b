"""Conv-level parity for the extended band routes (ops/band.py): with a band
attached and the CPU test hook on, every band-servable conv must match its
take+segment reference path bit-for-bit in values AND gradients.

Covers the round-3 extension beyond GENConv softmax: GENConv sum/mean/power
families (node-factored band tables), GINConv (plain sum), SemiGCNConv
(factorized sym-norm), RSAGEConv (self-loop-corrected sum, both message
flavors).  Reference semantics: `gcn_lib/sparse/torch_vertex.py` +
`torch_message.py:44-85`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import deep_gcns_torch_tpu.ops.band as band_mod
from deep_gcns_torch_tpu.convs.sparse import (
    GENConv, GINConv, RSAGEConv, SemiGCNConv)
from deep_gcns_torch_tpu.graph import attach_band, build_graph


@pytest.fixture
def band_mode():
    band_mod._TEST_MODE = True
    yield
    band_mod._TEST_MODE = False


def messy_graph(rng, n, deg, bandwidth):
    """Banded graph + explicit self loops + duplicated edges (the cases the
    band corrections must get right)."""
    s = rng.integers(0, n, n * deg)
    r = np.clip(s + rng.integers(-bandwidth, bandwidth + 1, n * deg), 0, n - 1)
    loops = rng.integers(0, n, n // 4)          # self edges on some nodes
    dup = rng.integers(0, len(s), n // 4)       # multi-edges
    s = np.concatenate([s, loops, s[dup]])
    r = np.concatenate([r, loops, r[dup]])
    return s, r


def apply_both(conv, g, x, key, **kw):
    params, state = conv.init(key)

    def run():
        def f(p, x_):
            out, _ = conv.apply(p, state, x_, g, train=False, **kw)
            return out
        out = f(params, x)
        # grads through a scalar projection: checks the band VJPs end to end
        gp, gx = jax.grad(lambda p, x_: jnp.sum(jnp.cos(f(p, x_))),
                          argnums=(0, 1))(params, x)
        return out, gp, gx

    band_mod._TEST_MODE = False
    want = run()
    band_mod._TEST_MODE = True
    got = run()
    return got, want


def assert_close(got, want, rtol=2e-4, atol=2e-4):
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=rtol, atol=atol),
        got, want)


@pytest.mark.parametrize("aggr", ["sum", "mean", "power", "power_sum"])
def test_genconv_band_sum_family(rng_np, band_mode, aggr):
    n = 512
    s, r = messy_graph(rng_np, n, 5, 60)
    x = jnp.asarray(rng_np.standard_normal((n, 32)).astype(np.float32))
    g = attach_band(build_graph(None, s, r, num_nodes=n), window=512)
    assert g.band.fwd.coverage == 1.0
    conv = GENConv(in_dim=32, emb_dim=32, aggr=aggr, learn_p=(aggr == "power"),
                   norm="layer")
    got, want = apply_both(conv, g, x, jax.random.PRNGKey(0))
    assert_close(got, want)


def test_genconv_band_with_leftover(rng_np, band_mode):
    """Off-band leftover edges ride take+CSR; sum must still be exact."""
    n = 512
    s, r = messy_graph(rng_np, n, 5, 220)
    x = jnp.asarray(rng_np.standard_normal((n, 32)).astype(np.float32))
    g = attach_band(build_graph(None, s, r, num_nodes=n), window=256)
    assert 0.5 < g.band.fwd.coverage < 1.0
    conv = GENConv(in_dim=32, emb_dim=32, aggr="mean", norm="layer")
    got, want = apply_both(conv, g, x, jax.random.PRNGKey(1))
    assert_close(got, want)


def test_ginconv_band(rng_np, band_mode):
    n = 512
    s, r = messy_graph(rng_np, n, 5, 60)
    x = jnp.asarray(rng_np.standard_normal((n, 32)).astype(np.float32))
    g = attach_band(build_graph(None, s, r, num_nodes=n), window=512)
    conv = GINConv(in_dim=32, out_dim=48)
    got, want = apply_both(conv, g, x, jax.random.PRNGKey(2))
    assert_close(got, want)


def test_semigcn_band(rng_np, band_mode):
    n = 512
    s, r = messy_graph(rng_np, n, 5, 60)
    x = jnp.asarray(rng_np.standard_normal((n, 32)).astype(np.float32))
    g = attach_band(build_graph(None, s, r, num_nodes=n), window=512)
    conv = SemiGCNConv(in_dim=32, out_dim=48, act="relu", norm=None)
    got, want = apply_both(conv, g, x, jax.random.PRNGKey(3))
    assert_close(got, want)


@pytest.mark.parametrize("relative", [False, True])
def test_rsage_band(rng_np, band_mode, relative):
    """Self-loop corrections: the band covers self edges, SAGE excludes them."""
    n = 512
    s, r = messy_graph(rng_np, n, 5, 60)
    x = jnp.asarray(rng_np.standard_normal((n, 32)).astype(np.float32))
    g = attach_band(build_graph(None, s, r, num_nodes=n), window=512)
    conv = RSAGEConv(in_dim=32, out_dim=48, relative=relative, norm=None)
    got, want = apply_both(conv, g, x, jax.random.PRNGKey(4))
    assert_close(got, want)
