"""Golden tests for the Pallas CSR kernels (interpret mode on CPU) against the XLA
reference implementations in ops/segment.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_gcns_torch_tpu.graph import build_graph
from deep_gcns_torch_tpu.ops import segment as seg
from deep_gcns_torch_tpu.ops import spmm_pallas as sp
from np_ref import random_graph


def make_csr_graph(rng_np, n=500, e=3000, c=24, node_pad=512, edge_pad=3072):
    x, s, r = random_graph(rng_np, n, e, c)
    g = build_graph(x, s, r, node_pad=node_pad, edge_pad=edge_pad, with_row_ptr=True)
    msgs = np.zeros((g.num_edges_padded, c), np.float32)
    msgs[:e] = np.maximum(x[s], 0) + 1e-7
    return g, jnp.asarray(msgs)


def test_segment_sum_csr_matches_xla(rng_np):
    g, msgs = make_csr_graph(rng_np)
    got = sp.segment_sum_csr(msgs, jnp.asarray(g.receivers), jnp.asarray(g.row_ptr),
                             True)
    want = seg.segment_sum(msgs, jnp.asarray(g.receivers), g.num_nodes_padded,
                           mask=jnp.asarray(g.edge_mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_segment_sum_csr_grad(rng_np):
    g, msgs = make_csr_graph(rng_np)
    recv = jnp.asarray(g.receivers)
    rp = jnp.asarray(g.row_ptr)
    gmask = jnp.asarray(g.edge_mask)

    def f_pallas(m):
        return jnp.sum(sp.segment_sum_csr(m, recv, rp, True) ** 2)

    def f_xla(m):
        return jnp.sum(seg.segment_sum(m, recv, g.num_nodes_padded, mask=gmask) ** 2)

    g1 = jax.grad(f_pallas)(msgs)
    g2 = jax.grad(f_xla)(msgs)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("t", [0.5, 1.0, 3.0])
def test_softmax_aggregate_csr_matches_xla(rng_np, t):
    g, msgs = make_csr_graph(rng_np)
    recv = jnp.asarray(g.receivers)
    got = sp.gen_softmax_aggregate_csr(msgs, recv, jnp.asarray(g.row_ptr),
                                       jnp.float32(t), False, True)
    want = seg.generalized_aggregate(msgs, recv, g.num_nodes_padded, aggr="softmax",
                                     t=t, mask=jnp.asarray(g.edge_mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_softmax_aggregate_power_law_degrees(rng_np):
    """Heavy-tail degrees: one node receives most edges (spans many chunks)."""
    n, e, c = 300, 4096, 8
    r = np.concatenate([np.zeros(3000, np.int32),
                        rng_np.integers(0, n, e - 3000).astype(np.int32)])
    r.sort()
    s = rng_np.integers(0, n, e).astype(np.int32)
    x = rng_np.standard_normal((n, c)).astype(np.float32)
    g = build_graph(x, s, r, node_pad=512, edge_pad=4096, with_row_ptr=True)
    msgs = np.zeros((g.num_edges_padded, c), np.float32)
    msgs[:e] = np.maximum(x[np.asarray(g.senders)[:e]], 0) + 1e-7
    msgs = jnp.asarray(msgs)
    got = sp.gen_softmax_aggregate_csr(msgs, jnp.asarray(g.receivers),
                                       jnp.asarray(g.row_ptr), jnp.float32(1.0),
                                       False, True)
    want = seg.generalized_aggregate(msgs, jnp.asarray(g.receivers),
                                     g.num_nodes_padded, aggr="softmax", t=1.0,
                                     mask=jnp.asarray(g.edge_mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("grad_weights", [False, True])
def test_softmax_aggregate_grads(rng_np, grad_weights):
    g, msgs = make_csr_graph(rng_np, n=200, e=1200, c=8, node_pad=256, edge_pad=1536)
    recv = jnp.asarray(g.receivers)
    rp = jnp.asarray(g.row_ptr)
    emask = jnp.asarray(g.edge_mask)
    t0 = jnp.float32(1.7)

    def f_pallas(m, t):
        return jnp.sum(sp.gen_softmax_aggregate_csr(m, recv, rp, t, grad_weights,
                                                    True) ** 2)

    def f_xla(m, t):
        out = seg.generalized_aggregate(m, recv, g.num_nodes_padded, aggr="softmax",
                                        t=t, learn_t=grad_weights, mask=emask)
        return jnp.sum(out ** 2)

    (gm1, gt1) = jax.grad(f_pallas, argnums=(0, 1))(msgs, t0)
    (gm2, gt2) = jax.grad(f_xla, argnums=(0, 1))(msgs, t0)
    np.testing.assert_allclose(np.asarray(gm1), np.asarray(gm2), rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(float(gt1), float(gt2), rtol=5e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# fused gather + message + softmax aggregation (x-level op)
# ---------------------------------------------------------------------------

def _fused_setup(rng_np, n=400, e=2500, c=128, node_pad=512, edge_pad=3072):
    x, s, r = random_graph(rng_np, n, e, c)
    g = build_graph(x, s, r, node_pad=node_pad, edge_pad=edge_pad)
    return g, jnp.asarray(np.asarray(g.x), jnp.float32)


def _fused_xla_ref(x, g, t, eps=1e-7, learn_t=False, aggr="softmax"):
    n_pad = g.num_nodes_padded
    xj = jnp.take(x, jnp.minimum(jnp.asarray(g.senders), n_pad - 1), axis=0)
    m = jax.nn.relu(xj) + eps
    return seg.generalized_aggregate(m, jnp.asarray(g.receivers), n_pad, aggr=aggr,
                                     t=t, learn_t=learn_t,
                                     mask=jnp.asarray(g.edge_mask))


@pytest.mark.parametrize("t", [0.1, 1.0])
def test_fused_softmax_gather_agg_forward(rng_np, t):
    g, x = _fused_setup(rng_np)
    got = sp.fused_softmax_gather_agg(
        x, jnp.asarray(g.senders), jnp.asarray(g.receivers), jnp.asarray(g.row_ptr),
        jnp.asarray(g.csc_senders), jnp.asarray(g.csc_receivers),
        jnp.asarray(g.csc_col_ptr), jnp.float32(t), None, None, 1e-7, False, True)
    want = _fused_xla_ref(x, g, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("grad_weights", [False, True])
def test_fused_softmax_gather_agg_grads(rng_np, grad_weights):
    g, x = _fused_setup(rng_np, n=250, e=1500, c=128, node_pad=256, edge_pad=1536)
    t0 = jnp.float32(0.9)
    args = (jnp.asarray(g.senders), jnp.asarray(g.receivers), jnp.asarray(g.row_ptr),
            jnp.asarray(g.csc_senders), jnp.asarray(g.csc_receivers),
            jnp.asarray(g.csc_col_ptr))

    def f_pallas(x_, t_):
        out = sp.fused_softmax_gather_agg(x_, *args, t_, None, None, 1e-7, grad_weights, True)
        return jnp.sum(out ** 2)

    def f_xla(x_, t_):
        return jnp.sum(_fused_xla_ref(x_, g, t_, learn_t=grad_weights) ** 2)

    gx1, gt1 = jax.grad(f_pallas, argnums=(0, 1))(x, t0)
    gx2, gt2 = jax.grad(f_xla, argnums=(0, 1))(x, t0)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(float(gt1), float(gt2), rtol=5e-4, atol=1e-5)


def test_fused_softmax_power_law(rng_np):
    """Hub node spanning many chunks + isolated nodes (empty rows)."""
    n, e, c = 600, 4096, 128
    r = np.concatenate([np.zeros(2500, np.int32),
                        rng_np.integers(0, n // 2, e - 2500).astype(np.int32)])
    s = rng_np.integers(0, n, e).astype(np.int32)
    x = rng_np.standard_normal((n, c)).astype(np.float32)
    g = build_graph(x, s, r, node_pad=640, edge_pad=4096)
    xj = jnp.asarray(np.asarray(g.x), jnp.float32)
    got = sp.fused_softmax_gather_agg(
        xj, jnp.asarray(g.senders), jnp.asarray(g.receivers), jnp.asarray(g.row_ptr),
        jnp.asarray(g.csc_senders), jnp.asarray(g.csc_receivers),
        jnp.asarray(g.csc_col_ptr), jnp.float32(1.0), None, None, 1e-7, False, True)
    want = _fused_xla_ref(xj, g, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("grad_weights", [False, True])
def test_fused_softmax_with_edge_emb(rng_np, grad_weights):
    """Edge-embedding path: m = relu(x_j + e) + eps; d(edge_emb) emitted in CSC
    order via the accumulate-and-flush write-back."""
    n, e, c = 300, 2000, 128
    x, s, r = random_graph(rng_np, n, e, c)
    attr = rng_np.standard_normal((e, 8)).astype(np.float32)
    g = build_graph(x, s, r, edge_attr=attr, node_pad=384, edge_pad=2560)
    xj = jnp.asarray(np.asarray(g.x), jnp.float32)
    W = jnp.asarray(rng_np.standard_normal((8, c)) * 0.3, jnp.float32)
    t0 = jnp.float32(0.8)
    csc_perm = np.asarray(g.csc_perm)
    args = (jnp.asarray(g.senders), jnp.asarray(g.receivers), jnp.asarray(g.row_ptr),
            jnp.asarray(g.csc_senders), jnp.asarray(g.csc_receivers),
            jnp.asarray(g.csc_col_ptr))
    ea = jnp.asarray(g.edge_attr)
    ea_csc = jnp.asarray(g.edge_attr_csc)

    def f_pallas(x_, W_, t_):
        ee = jax.lax.stop_gradient(ea @ W_)
        ee_csc = ea_csc @ W_
        out = sp.fused_softmax_gather_agg(x_, *args, t_, ee, ee_csc, 1e-7,
                                          grad_weights, True)
        return jnp.sum(out ** 2)

    def f_xla(x_, W_, t_):
        ee = ea @ W_
        xg = jnp.take(x_, jnp.minimum(jnp.asarray(g.senders),
                                      g.num_nodes_padded - 1), axis=0)
        m = jax.nn.relu(xg + ee) + 1e-7
        out = seg.generalized_aggregate(m, jnp.asarray(g.receivers),
                                        g.num_nodes_padded, aggr="softmax", t=t_,
                                        learn_t=grad_weights,
                                        mask=jnp.asarray(g.edge_mask))
        return jnp.sum(out ** 2)

    v1 = f_pallas(xj, W, t0)
    v2 = f_xla(xj, W, t0)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)

    gx1, gw1, gt1 = jax.grad(f_pallas, argnums=(0, 1, 2))(xj, W, t0)
    gx2, gw2, gt2 = jax.grad(f_xla, argnums=(0, 1, 2))(xj, W, t0)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=5e-4, atol=1e-4)
    np.testing.assert_allclose(float(gt1), float(gt2), rtol=5e-4, atol=1e-5)
