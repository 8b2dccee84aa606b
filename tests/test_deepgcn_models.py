import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_gcns_torch_tpu.graph import batch_graphs
from deep_gcns_torch_tpu.models.deepgcn import (
    DeepGCNCls, DeepGCNConfig, DeepGCNStatic, DenseDeepGCN, SparseDeepGCN,
)
from np_ref import random_graph


def small_cfg(**kw):
    base = dict(in_channels=9, n_classes=6, n_filters=16, n_blocks=4, conv="mr",
                norm="batch", k=4, dropout=0.1, num_points=32)
    base.update(kw)
    return DeepGCNConfig(**base)


@pytest.mark.parametrize("block", ["res", "dense", "plain"])
def test_ppi_deepgcn(rng_np, block):
    gs = []
    for _ in range(2):
        x, s, r = random_graph(rng_np, 30, 90, 9)
        gs.append(dict(x=x, senders=s, receivers=r))
    g = batch_graphs(gs)
    model = DeepGCNStatic(small_cfg(block=block, conv="mr"))
    p, st = model.init(jax.random.PRNGKey(0))
    y, st2 = model.apply(p, st, g.x, g, train=True, rng=jax.random.PRNGKey(1))
    assert y.shape == (g.num_nodes_padded, 6)
    assert np.all(np.isfinite(np.asarray(y)))
    y_eval, _ = model.apply(p, st, g.x, g, train=False)
    assert np.all(np.isfinite(np.asarray(y_eval)))


@pytest.mark.parametrize("block", ["res", "dense"])
def test_sparse_deepgcn_seg(rng_np, block):
    B, N = 2, 32
    x = jnp.asarray(rng_np.standard_normal((B * N, 9)).astype(np.float32))
    model = SparseDeepGCN(small_cfg(block=block, conv="edge", num_points=N))
    p, st = model.init(jax.random.PRNGKey(0))
    y, _ = model.apply(p, st, x, None, train=True, rng=jax.random.PRNGKey(1))
    assert y.shape == (B * N, 6)
    assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.parametrize("block", ["res", "dense"])
def test_dense_deepgcn_seg(rng_np, block):
    B, N = 2, 48
    x = jnp.asarray(rng_np.standard_normal((B, N, 9)).astype(np.float32))
    model = DenseDeepGCN(small_cfg(block=block, conv="edge"))
    p, st = model.init(jax.random.PRNGKey(0))
    y, _ = model.apply(p, st, x, train=True, rng=jax.random.PRNGKey(1))
    assert y.shape == (B, N, 6)
    assert np.all(np.isfinite(np.asarray(y)))


def test_modelnet_cls(rng_np):
    B, N = 2, 64
    x = jnp.asarray(rng_np.standard_normal((B, N, 3)).astype(np.float32))
    model = DeepGCNCls(small_cfg(in_channels=3, n_classes=40, conv="edge",
                                 stochastic=True, epsilon=0.2))
    p, st = model.init(jax.random.PRNGKey(0))
    y, _ = model.apply(p, st, x, train=True, rng=jax.random.PRNGKey(1))
    assert y.shape == (B, 40)
    assert np.all(np.isfinite(np.asarray(y)))
    # eval deterministic
    y1, _ = model.apply(p, st, x, train=False)
    y2, _ = model.apply(p, st, x, train=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_ppi_gradients(rng_np):
    x, s, r = random_graph(rng_np, 40, 120, 9)
    g = batch_graphs([dict(x=x, senders=s, receivers=r)])
    model = DeepGCNStatic(small_cfg(block="res"))
    p, st = model.init(jax.random.PRNGKey(0))

    def loss(p_):
        y, _ = model.apply(p_, st, g.x, g, train=True, rng=jax.random.PRNGKey(2))
        return jnp.sum(jnp.where(g.node_mask[:, None], y, 0) ** 2)

    grads = jax.grad(loss)(p)
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(grads))
