import jax
import jax.numpy as jnp
import numpy as np

from deep_gcns_torch_tpu.graph import add_self_loops, batch_graphs, build_graph, to_undirected
from deep_gcns_torch_tpu.nn import core as nncore
from np_ref import random_graph


def test_build_graph_sorts_and_pads(rng_np):
    x, s, r = random_graph(rng_np, 100, 500, 8, sort=False)
    g = build_graph(x, s, r, with_row_ptr=True)
    assert g.num_nodes_padded % 128 == 0 and g.num_edges_padded % 128 == 0
    rr = np.asarray(g.receivers)[np.asarray(g.edge_mask)]
    assert np.all(np.diff(rr) >= 0)
    assert int(g.n_node) == 100 and int(g.n_edge) == 500
    # padding sentinel out of range
    assert np.all(np.asarray(g.receivers)[~np.asarray(g.edge_mask)] == g.num_nodes_padded)
    # row_ptr consistent
    rp = np.asarray(g.row_ptr)
    counts = np.bincount(rr, minlength=g.num_nodes_padded)
    np.testing.assert_array_equal(np.diff(rp), counts)


def test_batch_graphs_block_diagonal(rng_np):
    gs = []
    for n, e in [(10, 30), (15, 40), (7, 12)]:
        x, s, r = random_graph(rng_np, n, e, 4)
        gs.append(dict(x=x, senders=s, receivers=r))
    g = batch_graphs(gs)
    assert g.num_graphs == 3
    s = np.asarray(g.senders)[np.asarray(g.edge_mask)]
    r = np.asarray(g.receivers)[np.asarray(g.edge_mask)]
    gid = np.asarray(g.node_graph)
    # every edge stays within its graph
    assert np.all(gid[s] == gid[r])
    assert int(g.n_node) == 32 and int(g.n_edge) == 82


def test_self_loop_utils():
    s = np.array([0, 1, 2, 2])
    r = np.array([1, 0, 2, 0])
    s2, r2 = add_self_loops(s, r, 4)
    pairs = set(zip(s2.tolist(), r2.tolist()))
    assert (2, 2) in pairs and (0, 0) in pairs and (3, 3) in pairs and (0, 1) in pairs
    assert len(s2) == 3 + 4  # one old self loop removed, 4 added
    su, ru = to_undirected(np.array([0, 1]), np.array([1, 2]))
    assert set(zip(su.tolist(), ru.tolist())) == {(0, 1), (1, 0), (1, 2), (2, 1)}


def test_linear_matches_torch_default_stats():
    lin = nncore.Linear(64, 32)
    p, _ = lin.init(jax.random.PRNGKey(0))
    bound = 1 / 8.0
    assert np.abs(np.asarray(p["w"])).max() <= bound
    y, _ = lin.apply(p, {}, jnp.ones((4, 64)))
    assert y.shape == (4, 32)


def test_batchnorm_masked_and_running_stats(rng_np):
    bn = nncore.BatchNorm(4)
    p, s = bn.init(jax.random.PRNGKey(0))
    x = rng_np.standard_normal((20, 4)).astype(np.float32) * 3 + 1
    mask = np.zeros(20, bool)
    mask[:12] = True
    xj = jnp.asarray(x)
    y, s1 = bn.apply(p, s, xj, train=True, mask=jnp.asarray(mask))
    yv = np.asarray(y)[:12]
    np.testing.assert_allclose(yv.mean(0), 0, atol=1e-5)
    np.testing.assert_allclose(yv.std(0), 1, atol=1e-2)
    # running stats track the masked batch stats (momentum 0.1, unbiased var)
    np.testing.assert_allclose(np.asarray(s1["mean"]), 0.1 * x[:12].mean(0), rtol=1e-5)
    want_var = 0.9 * 1.0 + 0.1 * x[:12].var(0, ddof=1)
    np.testing.assert_allclose(np.asarray(s1["var"]), want_var, rtol=1e-5)
    # eval mode uses running stats, state unchanged
    y2, s2 = bn.apply(p, s1, xj, train=False)
    assert s2 is s1 or jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: np.array_equal(a, b), s1, s2))


def test_mlp_reference_structure():
    # channels [in, 2in, out] with last_lin: final linear bare
    mlp = nncore.MLP((8, 16, 4), norm="layer", last_lin=True)
    p, s = mlp.init(jax.random.PRNGKey(1))
    assert "norm" in p[0] and "norm" not in p[1]
    y, _ = mlp.apply(p, s, jnp.ones((3, 8)))
    assert y.shape == (3, 4)


def test_dropout_and_shared_mask():
    x = jnp.ones((100, 10))
    y = nncore.dropout(x, 0.5, train=True, rng=jax.random.PRNGKey(0))
    vals = np.unique(np.asarray(y))
    assert set(np.round(vals, 4).tolist()) <= {0.0, 2.0}
    m = nncore.shared_dropout_mask(jax.random.PRNGKey(1), (100, 10), 0.3)
    y2 = nncore.dropout(x, 0.3, train=True, rng=None, mask=m)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(m))
    # eval: identity
    np.testing.assert_allclose(np.asarray(nncore.dropout(x, 0.5, train=False, rng=None)), 1.0)
