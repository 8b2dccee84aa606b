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


def test_gather_neighbors_grads_match_take(rng_np):
    """CSC-backed dense neighbor gather == plain take, values and grads.

    Shapes chosen kernel-aligned (E = B·N·K % 512 == 0, B·N % 128 == 0) so the
    Pallas route is exercised in interpret-free CPU mode via the fallback AND
    the custom-VJP math is checked against autodiff of plain take."""
    import jax
    import jax.numpy as jnp
    from deep_gcns_torch_tpu.ops.gather import (_gather_neighbors_csc,
                                                gather_neighbors,
                                                neighbor_transpose)

    b, n, k, c = 2, 64, 4, 8
    x = jnp.asarray(rng_np.standard_normal((b, n, c)), jnp.float32)
    idx = jnp.asarray(rng_np.integers(0, n, (b, n, k)), jnp.int32)
    g = jnp.asarray(rng_np.standard_normal((b, n, k, c)), jnp.float32)

    def take_ref(x):
        return jax.vmap(lambda xb, ib: jnp.take(xb, ib, axis=0))(x, idx)

    perm, senders, row_ptr = neighbor_transpose(idx)

    def csc(x):
        return _gather_neighbors_csc(x, idx, perm, senders, row_ptr,
                                     True)  # interpret mode on CPU

    np.testing.assert_allclose(np.asarray(csc(x)), np.asarray(take_ref(x)))
    _, vjp_ref = jax.vjp(take_ref, x)
    _, vjp_csc = jax.vjp(csc, x)
    np.testing.assert_allclose(np.asarray(vjp_csc(g)[0]),
                               np.asarray(vjp_ref(g)[0]), rtol=1e-5, atol=1e-5)
    # public wrapper agrees too
    np.testing.assert_allclose(np.asarray(gather_neighbors(x, idx)),
                               np.asarray(take_ref(x)))
