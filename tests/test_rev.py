import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_gcns_torch_tpu.data.synthetic import random_node_graph
from deep_gcns_torch_tpu.models.rev_gcn import RevGCN, RevGCNConfig
from deep_gcns_torch_tpu.rev.coupling import GroupAdditiveCoupling
from deep_gcns_torch_tpu.rev.invertible import make_reversible_scan
from deep_gcns_torch_tpu.rev.rev_layer import GENBlock


def make_setup(rng_np, n=60, e=240, hidden=16, group=2, edge_dim=0):
    g, _ = random_node_graph(rng_np, n, e // n, hidden, edge_dim=edge_dim)
    fm = GENBlock(hidden // group, hidden // group, aggr="softmax", norm="layer",
                  encode_edge=edge_dim > 0, edge_feat_dim=hidden if edge_dim else 0,
                  mlp_layers=1)
    coupling = GroupAdditiveCoupling(fm, group=group)
    p, _ = coupling.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (g.num_nodes_padded, hidden)).astype(np.float32))
    return g, coupling, p, x


def test_coupling_inverse_exact(rng_np):
    g, coupling, p, x = make_setup(rng_np)
    y = coupling.forward(p, x, g)
    x_rec = coupling.inverse(p, y, g)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("group", [1, 2, 4])
def test_coupling_groups(rng_np, group):
    g, coupling, p, x = make_setup(rng_np, hidden=16, group=group)
    y = coupling.forward(p, x, g)
    x_rec = coupling.inverse(p, y, g)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-4, atol=1e-5)


def test_reversible_grads_match_autodiff(rng_np):
    """O(1)-memory custom_vjp must produce the same gradients as plain autodiff
    (the reference checks this implicitly via InvertibleModuleWrapper.disable)."""
    g, coupling, p, x = make_setup(rng_np)
    L = 5
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(2), i))(
        jnp.arange(L))
    stacked, _ = jax.vmap(coupling.init)(keys)
    mask = (jax.random.bernoulli(jax.random.PRNGKey(3), 0.9, x.shape) / 0.9
            ).astype(x.dtype)

    def fwd_one(p_, h, diff):
        (m,) = diff
        return coupling.forward(p_, h, g, m, train=True)

    def inv_one(p_, y, diff):
        (m,) = diff
        return coupling.inverse(p_, y, g, m, train=True)

    run_rev = make_reversible_scan(fwd_one, inv_one)

    def plain(sp, h, m):
        def body(h, p_):
            return fwd_one(p_, h, (m,)), None
        out, _ = jax.lax.scan(body, h, sp)
        return out

    def loss_rev(sp, h, m):
        return jnp.sum(run_rev(sp, h, (m,)) ** 2)

    def loss_plain(sp, h, m):
        return jnp.sum(plain(sp, h, m) ** 2)

    # fused inverse+vjp backward (the production path in RevGCN/RevGAT)
    def inv_vjp_one(p_, y, diff, gy):
        (m,) = diff
        xx, gx, gp, (gm,) = coupling.inverse_and_vjp(p_, y, g, gy, m, train=True)
        return xx, gx, gp, (gm,)

    run_fused = make_reversible_scan(fwd_one, inv_one, inv_vjp_one)

    def loss_fused(sp, h, m):
        return jnp.sum(run_fused(sp, h, (m,)) ** 2)

    v1, (gp1, gx1, gm1) = jax.value_and_grad(loss_rev, argnums=(0, 1, 2))(
        stacked, x, mask)
    v2, (gp2, gx2, gm2) = jax.value_and_grad(loss_plain, argnums=(0, 1, 2))(
        stacked, x, mask)
    v3, (gp3, gx3, gm3) = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(
        stacked, x, mask)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(float(v3), float(v2), rtol=1e-5)
    for ref, got in ((gp2, gp1), (gp2, gp3)):
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                       atol=2e-4)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gx3), np.asarray(gx2), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gm1), np.asarray(gm2), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gm3), np.asarray(gm2), rtol=2e-3, atol=2e-4)


def test_revgcn_forward_and_grads(rng_np):
    g, _ = random_node_graph(rng_np, 50, 5, 8, edge_dim=8)
    cfg = RevGCNConfig(in_channels=8, node_feat_dim=8, edge_feat_dim=8,
                       hidden_channels=16, num_tasks=7, num_layers=6, group=2,
                       aggr="softmax", dropout=0.2, use_one_hot_encoding=True)
    model = RevGCN(cfg)
    p, s = jax.jit(model.init)(jax.random.PRNGKey(0))
    x = jnp.asarray(rng_np.standard_normal((g.num_nodes_padded, 8)).astype(np.float32))
    nf = jnp.asarray(rng_np.standard_normal((g.num_nodes_padded, 8)).astype(np.float32))

    y, _ = model.apply(p, s, x, g, node_feats=nf, train=False)
    assert y.shape == (g.num_nodes_padded, 7)
    assert np.all(np.isfinite(np.asarray(y)))

    def loss_fn(p_):
        out, _ = model.apply(p_, s, x, g, node_feats=nf, train=True,
                             rng=jax.random.PRNGKey(5))
        return jnp.sum(out[g.node_mask] ** 2)

    val, grads = jax.value_and_grad(loss_fn)(p)
    assert np.isfinite(float(val))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # edge encoder gets gradient through all reversible layers
    assert np.any(np.asarray(grads["edge_encoder"]["w"]) != 0)


def test_revgcn_train_deterministic_given_key(rng_np):
    g, _ = random_node_graph(rng_np, 40, 5, 8, edge_dim=8)
    cfg = RevGCNConfig(hidden_channels=16, num_tasks=3, num_layers=3, group=2,
                       dropout=0.5)
    model = RevGCN(cfg)
    p, s = jax.jit(model.init)(jax.random.PRNGKey(0))
    x = jnp.asarray(rng_np.standard_normal((g.num_nodes_padded, 8)).astype(np.float32))
    nf = jnp.asarray(rng_np.standard_normal((g.num_nodes_padded, 8)).astype(np.float32))
    y1, _ = model.apply(p, s, x, g, node_feats=nf, train=True,
                        rng=jax.random.PRNGKey(9))
    y2, _ = model.apply(p, s, x, g, node_feats=nf, train=True,
                        rng=jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
