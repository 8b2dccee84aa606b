import jax
import jax.numpy as jnp
import numpy as np

from deep_gcns_torch_tpu.graph import build_graph
from deep_gcns_torch_tpu.ops.gather import gather_src
from np_ref import random_graph


def test_gather_src_vjp_matches_plain(rng_np):
    x, s, r = random_graph(rng_np, 300, 2000, 16)
    g = build_graph(x, s, r, node_pad=512, edge_pad=2048)
    xj = jnp.asarray(np.asarray(g.x))

    def f_csc(x_):
        out = gather_src(x_, g.senders, g.csc_perm, g.csc_senders, g.csc_col_ptr,
                         True)
        return jnp.sum(jnp.where(g.edge_mask[:, None], out, 0) ** 2)

    def f_plain(x_):
        out = jnp.take(x_, jnp.minimum(g.senders, x_.shape[0] - 1), axis=0)
        return jnp.sum(jnp.where(g.edge_mask[:, None], out, 0) ** 2)

    v1, g1 = jax.value_and_grad(f_csc)(xj)
    v2, g2 = jax.value_and_grad(f_plain)(xj)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                               atol=1e-5)


def test_csc_aux_consistency(rng_np):
    x, s, r = random_graph(rng_np, 200, 1500, 4)
    g = build_graph(x, s, r, node_pad=256, edge_pad=1536)
    em = np.asarray(g.edge_mask)
    perm = np.asarray(g.csc_perm)[em.sum() and slice(0, em.sum())]
    ss = np.asarray(g.csc_senders)[: em.sum()]
    # csc_senders = senders permuted into sorted order
    np.testing.assert_array_equal(ss, np.asarray(g.senders)[perm])
    assert np.all(np.diff(ss) >= 0)
    cp = np.asarray(g.csc_col_ptr)
    counts = np.bincount(ss, minlength=g.num_nodes_padded)
    np.testing.assert_array_equal(np.diff(cp), counts)
