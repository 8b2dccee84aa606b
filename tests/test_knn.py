import jax
import jax.numpy as jnp
import numpy as np

from deep_gcns_torch_tpu.ops import knn as K


def brute_knn(x, k):
    """x [B, N, C] → [B, N, k] neighbor ids by ascending squared distance."""
    d = ((x[:, :, None, :] - x[:, None, :, :]) ** 2).sum(-1)
    return np.argsort(d, axis=-1, kind="stable")[..., :k]


def test_pairwise_distance(rng_np):
    x = rng_np.standard_normal((2, 10, 3)).astype(np.float32)
    got = np.asarray(K.pairwise_distance(jnp.asarray(x)))
    want = ((x[:, :, None, :] - x[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_knn_dense_matches_bruteforce(rng_np):
    x = rng_np.standard_normal((3, 64, 3)).astype(np.float32)
    idx = np.asarray(K.knn_dense(jnp.asarray(x), 8))
    want = brute_knn(x, 8)
    # compare as sets per point (ties can reorder)
    d = ((x[:, :, None, :] - x[:, None, :, :]) ** 2).sum(-1)
    got_d = np.take_along_axis(d, idx, -1)
    want_d = np.take_along_axis(d, want, -1)
    np.testing.assert_allclose(np.sort(got_d, -1), np.sort(want_d, -1), atol=1e-3)
    # self is its own nearest neighbor
    assert np.all(idx[..., 0] == np.arange(64)[None, :])


def test_dilation_stride_semantics(rng_np):
    """dilation d keeps neighbor ranks {0, d, 2d, …} (`torch_edge.py:26-28`)."""
    x = rng_np.standard_normal((1, 32, 3)).astype(np.float32)
    full = np.asarray(K.knn_dense(jnp.asarray(x), 8))
    nn4, _ = K.dilated_knn_graph_dense(jnp.asarray(x), 4, 2)
    np.testing.assert_array_equal(np.asarray(nn4), full[..., ::2])


def test_stochastic_dilation(rng_np):
    x = rng_np.standard_normal((1, 32, 3)).astype(np.float32)
    nn, _ = K.dilated_knn_graph_dense(jnp.asarray(x), 4, 2, stochastic=True,
                                      epsilon=1.0, train=True,
                                      rng=jax.random.PRNGKey(0))
    assert np.asarray(nn).shape == (1, 32, 4)
    # eval mode ignores stochastic
    nn_eval, _ = K.dilated_knn_graph_dense(jnp.asarray(x), 4, 2, stochastic=True,
                                           epsilon=1.0, train=False)
    full = np.asarray(K.knn_dense(jnp.asarray(x), 8))
    np.testing.assert_array_equal(np.asarray(nn_eval), full[..., ::2])


def test_flat_knn_batch_offsets(rng_np):
    x = rng_np.standard_normal((2 * 16, 3)).astype(np.float32)
    s, r = K.dilated_knn_graph_flat(jnp.asarray(x), 4, 1, num_nodes_per_graph=16)
    s, r = np.asarray(s), np.asarray(r)
    assert s.shape == (2 * 16 * 4,)
    # receivers center-major sorted; edges stay within their graph
    assert np.all(np.diff(r) >= 0)
    assert np.all((s < 16) == (r < 16))


def test_blocked_knn_matches_direct(rng_np):
    """Streaming (row-blocked) kNN == direct N×N path."""
    import jax.numpy as jnp
    x = rng_np.standard_normal((2, 300, 3)).astype(np.float32)
    direct = np.asarray(K.knn_dense(jnp.asarray(x), 6, row_block=1024))
    blocked = np.asarray(K.knn_dense(jnp.asarray(x), 6, row_block=128))
    d = ((x[:, :, None, :] - x[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(
        np.sort(np.take_along_axis(d, direct, -1), -1),
        np.sort(np.take_along_axis(d, blocked, -1), -1), atol=1e-3)


def test_approx_knn_self_first_and_valid(rng_np):
    """Approx path: self at rank 0, ids in range, and (on CPU, where
    approx_min_k is exact) the d=1 neighbor set matches the exact path."""
    x = rng_np.standard_normal((2, 64, 3)).astype(np.float32)
    nn, center = K.dilated_knn_graph_dense(jnp.asarray(x), 6, 1, method="approx")
    nn = np.asarray(nn)
    assert nn.shape == (2, 64, 6)
    np.testing.assert_array_equal(
        nn[..., 0], np.broadcast_to(np.arange(64)[None, :], (2, 64)))
    assert nn.min() >= 0 and nn.max() < 64
    exact = np.asarray(K.knn_dense(jnp.asarray(x), 6))
    np.testing.assert_array_equal(np.sort(nn, -1), np.sort(exact, -1))


def test_approx_dilated_subsample_semantics(rng_np):
    """Dilated approx path: neighbors come from the d-strided candidate set
    (eval offset 0), self is rank 0, shapes are [B, N, k]."""
    d = 4
    x = rng_np.standard_normal((1, 128, 3)).astype(np.float32)
    nn, _ = K.dilated_knn_graph_dense(jnp.asarray(x), 5, d, method="approx",
                                      train=False)
    nn = np.asarray(nn)
    assert nn.shape == (1, 128, 5)
    np.testing.assert_array_equal(nn[..., 0], np.arange(128)[None, :])
    assert np.all(nn[..., 1:] % d == 0)  # offset-0 stride candidates
    # train-time randomized offset still yields valid ids
    nn_t, _ = K.dilated_knn_graph_dense(jnp.asarray(x), 5, d, method="approx",
                                        train=True, rng=jax.random.PRNGKey(3))
    assert np.asarray(nn_t).min() >= 0 and np.asarray(nn_t).max() < 128


def test_approx_dilated_no_duplicate_self(rng_np):
    """Points whose index lands in the candidate subsample must not get a
    duplicated self edge (regression: self was prepended without dedup)."""
    d = 4
    x = rng_np.standard_normal((1, 128, 3)).astype(np.float32)
    nn, _ = K.dilated_knn_graph_dense(jnp.asarray(x), 5, d, method="approx",
                                      train=False)
    nn = np.asarray(nn)[0]
    for i in range(128):
        assert len(set(nn[i].tolist())) == 5, (i, nn[i])
    # stochastic=False + train=True stays deterministic (offset 0)
    nn2, _ = K.dilated_knn_graph_dense(jnp.asarray(x), 5, d, method="approx",
                                       train=True, rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(nn2)[0], nn)
