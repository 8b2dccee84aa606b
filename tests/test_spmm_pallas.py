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


@pytest.mark.parametrize("with_drop", [False, True])
def test_gat_softmax_spmm(rng_np, with_drop):
    """Fused GAT attention+SpMM vs the XLA chain (attn-dst-free, renormalizing
    edge drop via sentinel receivers)."""
    n, e, H, D = 300, 2000, 3, 41   # packed width 3*41+3=126 -> pad 128
    x, s, r = random_graph(rng_np, n, e, H * D)
    g = build_graph(x, s, r, node_pad=384, edge_pad=2560)
    n_pad = g.num_nodes_padded
    feat = jnp.asarray(rng_np.standard_normal((n_pad, H, D)), jnp.float32)
    attn = jnp.asarray(rng_np.standard_normal((H, D)) * 0.3, jnp.float32)
    keep = None
    if with_drop:
        keep = jnp.asarray((rng_np.random(g.num_edges_padded) > 0.3)
                           .astype(np.float32))

    def f_pallas(feat, attn):
        el = jnp.einsum("nhd,hd->nh", feat, attn)
        T = jnp.concatenate([feat.reshape(n_pad, H * D), el], axis=1)
        T = jnp.pad(T, ((0, 0), (0, 128 - H * D - H)))
        att_mask = jnp.asarray(g.edge_mask)
        if keep is not None:
            att_mask = att_mask & (keep > 0)
        recv_eff = jnp.where(att_mask, jnp.asarray(g.receivers), n_pad)
        keep_csc = None if keep is None else jnp.take(keep, jnp.asarray(g.csc_perm))
        agg = sp.gat_softmax_spmm(T, jnp.asarray(g.senders), recv_eff,
                                  jnp.asarray(g.row_ptr), jnp.asarray(g.csc_senders),
                                  jnp.asarray(g.csc_receivers),
                                  jnp.asarray(g.csc_col_ptr), keep_csc,
                                  H * D, H, 0.2, True)
        num = agg[:, :H * D].reshape(n_pad, H, D)
        den = agg[:, H * D:H * D + H]
        out = jnp.where((den > 0)[..., None],
                        num / jnp.where(den > 0, den, 1.0)[..., None], 0.0)
        return jnp.sum(out ** 2)

    def f_xla(feat, attn):
        el = jnp.einsum("nhd,hd->nh", feat, attn)
        score = jax.nn.leaky_relu(
            jnp.take(el, jnp.minimum(jnp.asarray(g.senders), n_pad - 1), axis=0), 0.2)
        att_mask = jnp.asarray(g.edge_mask)
        if keep is not None:
            att_mask = att_mask & (keep > 0)
        alpha = seg.segment_softmax(score, jnp.asarray(g.receivers), n_pad,
                                    mask=att_mask)
        msg = jnp.take(feat.reshape(n_pad, H * D),
                       jnp.minimum(jnp.asarray(g.senders), n_pad - 1),
                       axis=0).reshape(-1, H, D)
        out = seg.segment_sum(msg * alpha[..., None], jnp.asarray(g.receivers),
                              n_pad, mask=att_mask)
        return jnp.sum(out ** 2)

    v1, v2 = f_pallas(feat, attn), f_xla(feat, attn)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    g1f, g1a = jax.grad(f_pallas, argnums=(0, 1))(feat, attn)
    g2f, g2a = jax.grad(f_xla, argnums=(0, 1))(feat, attn)
    np.testing.assert_allclose(np.asarray(g1f), np.asarray(g2f), rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1a), np.asarray(g2a), rtol=5e-4, atol=1e-4)


def test_bf16_den_backward_close_to_f32(rng_np):
    """Parity-caveat bound check (COMPONENTS.md): on the bf16 compute path the
    backward's softmax weights use a bf16-rounded denominator residual while the
    forward used f32 — assert the resulting gradient perturbation stays within
    the documented ~0.5% envelope so regressions in the bound are caught."""
    g, x = _fused_setup(rng_np, n=250, e=1500, c=128, node_pad=256, edge_pad=1536)
    # quantize inputs to bf16-representable values so the ONLY bf16 effect under
    # test is the denominator residual rounding, not input rounding
    x = x.astype(jnp.bfloat16).astype(jnp.float32)
    t0 = jnp.float32(1.0)
    args = (jnp.asarray(g.senders), jnp.asarray(g.receivers), jnp.asarray(g.row_ptr),
            jnp.asarray(g.csc_senders), jnp.asarray(g.csc_receivers),
            jnp.asarray(g.csc_col_ptr))

    def f(x_, dtype):
        out = sp.fused_softmax_gather_agg(x_.astype(dtype), *args, t0, None, None,
                                          1e-7, False, True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g32 = jax.grad(lambda x_: f(x_, jnp.float32))(x)
    g16 = jax.grad(lambda x_: f(x_, jnp.bfloat16))(x)
    g32 = np.asarray(g32)
    g16 = np.asarray(g16, np.float32)
    denom = np.linalg.norm(g32)
    rel = np.linalg.norm(g16 - g32) / max(denom, 1e-30)
    assert rel < 1.5e-2, f"bf16-path grad deviates {rel:.4f} rel-l2 from f32 path"
