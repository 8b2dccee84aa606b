import jax
import jax.numpy as jnp
import numpy as np

from deep_gcns_torch_tpu.convs import dense as cd
from deep_gcns_torch_tpu.ops import knn as K


def test_batched_index_select(rng_np):
    x = rng_np.standard_normal((2, 10, 4)).astype(np.float32)
    idx = rng_np.integers(0, 10, (2, 10, 3))
    got = np.asarray(cd.batched_index_select(jnp.asarray(x), jnp.asarray(idx)))
    want = np.stack([x[b][idx[b]] for b in range(2)])
    np.testing.assert_array_equal(got, want)


def test_edgeconv2d_formula(rng_np):
    x = rng_np.standard_normal((2, 16, 6)).astype(np.float32)
    ei = K.knn_graph_dense(jnp.asarray(x), 4)
    conv = cd.EdgeConv2d(6, 8, act="relu", norm=None)
    p, st = conv.init(jax.random.PRNGKey(0))
    y, _ = conv.apply(p, st, jnp.asarray(x), ei)
    nn_idx = np.asarray(ei[0])
    w = np.asarray(p[0]["w"]); b = np.asarray(p[0]["b"])
    x_j = np.stack([x[bb][nn_idx[bb]] for bb in range(2)])  # [B,N,K,C]
    x_i = np.broadcast_to(x[:, :, None, :], x_j.shape)
    h = np.concatenate([x_i, x_j - x_i], -1)
    want = np.maximum(h @ w + b, 0).max(2)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5, atol=1e-5)


def test_mrconv2d_formula(rng_np):
    x = rng_np.standard_normal((2, 16, 6)).astype(np.float32)
    ei = K.knn_graph_dense(jnp.asarray(x), 4)
    conv = cd.MRConv2d(6, 8, act="relu", norm=None)
    p, st = conv.init(jax.random.PRNGKey(0))
    y, _ = conv.apply(p, st, jnp.asarray(x), ei)
    nn_idx = np.asarray(ei[0])
    w = np.asarray(p[0]["w"]); b = np.asarray(p[0]["b"])
    x_j = np.stack([x[bb][nn_idx[bb]] for bb in range(2)])
    x_i = np.broadcast_to(x[:, :, None, :], x_j.shape)
    rel = (x_j - x_i).max(2)
    h = np.concatenate([x, rel], -1)
    want = np.maximum(h @ w + b, 0)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5, atol=1e-5)


def test_dyn_blocks(rng_np):
    x = jnp.asarray(rng_np.standard_normal((2, 32, 12)).astype(np.float32))
    blk = cd.ResDynBlock2d(12, kernel_size=4, dilation=2, conv="edge", norm="batch")
    p, st = blk.init(jax.random.PRNGKey(1))
    y, st2 = blk.apply(p, st, x, train=True, rng=jax.random.PRNGKey(2))
    assert y.shape == (2, 32, 12)
    dense = cd.DenseDynBlock2d(12, 8, kernel_size=4, conv="mr", norm="batch")
    p, st = dense.init(jax.random.PRNGKey(3))
    y, _ = dense.apply(p, st, x, train=False)
    assert y.shape == (2, 32, 20)


def test_basicconv_batchnorm2d(rng_np):
    x = rng_np.standard_normal((2, 8, 4, 6)).astype(np.float32) * 2 + 1
    bc = cd.BasicConv((6, 10), act="relu", norm="batch")
    p, st = bc.init(jax.random.PRNGKey(0))
    y, st2 = bc.apply(p, st, jnp.asarray(x), train=True)
    yv = np.asarray(y).reshape(-1, 10)
    np.testing.assert_allclose(yv.mean(0), 0, atol=1e-4)
