import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_gcns_torch_tpu.data.synthetic import random_node_graph, sbm_arxiv_like
from deep_gcns_torch_tpu.models.deeper_gcn import DeeperGCN, DeeperGCNConfig
from deep_gcns_torch_tpu.utils.loss import cross_entropy


def small_cfg(**kw):
    base = dict(in_channels=16, hidden_channels=32, num_tasks=5, num_layers=4,
                block="res+", aggr="softmax", t=1.0, norm="batch", mlp_layers=1,
                dropout=0.1)
    base.update(kw)
    return DeeperGCNConfig(**base)


@pytest.mark.parametrize("block", ["res+", "res", "plain"])
def test_forward_shapes(rng_np, block):
    g, _ = random_node_graph(rng_np, 100, 6, 16)
    model = DeeperGCN(small_cfg(block=block))
    p, s = model.init(jax.random.PRNGKey(0))
    y, s2 = model.apply(p, s, g.x, g, train=True, rng=jax.random.PRNGKey(1))
    assert y.shape == (g.num_nodes_padded, 5)
    assert np.all(np.isfinite(np.asarray(y)))
    # eval mode deterministic
    y1, _ = model.apply(p, s, g.x, g, train=False)
    y2, _ = model.apply(p, s, g.x, g, train=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_gradients_flow(rng_np):
    g, labels = random_node_graph(rng_np, 80, 5, 16, num_classes=5)
    model = DeeperGCN(small_cfg(learn_t=True))
    p, s = model.init(jax.random.PRNGKey(0))
    lab = jnp.asarray(np.pad(labels, (0, g.num_nodes_padded - 80)))

    def loss_fn(params):
        y, _ = model.apply(params, s, g.x, g, train=True, rng=jax.random.PRNGKey(1))
        return cross_entropy(y, lab, mask=g.node_mask)

    val, grads = jax.value_and_grad(loss_fn)(p)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # learn_t=True → t gets gradient
    gt = np.asarray(grads["gcns"]["t"])
    assert np.any(gt != 0)


def test_remat_matches_no_remat(rng_np):
    g, _ = random_node_graph(rng_np, 60, 5, 16)
    p = None
    outs = []
    for remat in (True, False):
        model = DeeperGCN(small_cfg(remat=remat, dropout=0.0))
        if p is None:
            p, s = model.init(jax.random.PRNGKey(0))
        y, _ = model.apply(p, s, g.x, g, train=False)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6, atol=1e-6)


def test_learns_sbm(rng_np):
    """End-to-end sanity: a small DeeperGCN fits an SBM node-classification task."""
    import optax

    g, labels = sbm_arxiv_like(rng_np, n=512, num_classes=4, c=16, avg_degree=8)
    model = DeeperGCN(DeeperGCNConfig(in_channels=16, hidden_channels=32, num_tasks=4,
                                      num_layers=3, block="res+", aggr="softmax",
                                      norm="layer", dropout=0.0, remat=False))
    p, s = model.init(jax.random.PRNGKey(0))
    lab = jnp.asarray(np.pad(labels, (0, g.num_nodes_padded - 512)))
    tx = optax.adam(1e-2)
    opt = tx.init(p)

    @jax.jit
    def step(p, s, opt):
        def loss_fn(params):
            y, s2 = model.apply(params, s, g.x, g, train=True,
                                rng=jax.random.PRNGKey(2))
            return cross_entropy(y, lab, mask=g.node_mask), s2

        (l, s2), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        up, opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, up), s2, opt, l

    for _ in range(60):
        p, s, opt, l = step(p, s, opt)
    y, _ = model.apply(p, s, g.x, g, train=False)
    pred = np.asarray(jnp.argmax(y, -1))[:512]
    acc = (pred == labels).mean()
    assert acc > 0.8, f"SBM accuracy too low: {acc}"


def test_graph_pooling_head(rng_np):
    from deep_gcns_torch_tpu.graph import batch_graphs
    from np_ref import random_graph

    gs = []
    for _ in range(4):
        x, s, r = random_graph(rng_np, 20, 60, 16)
        gs.append(dict(x=x, senders=s, receivers=r))
    g = batch_graphs(gs)
    model = DeeperGCN(small_cfg(graph_pooling="mean", num_layers=2))
    p, s = model.init(jax.random.PRNGKey(0))
    y, _ = model.apply(p, s, g.x, g, train=False)
    assert y.shape == (4, 5)
