"""Optimizer parity vs numpy transcriptions of the reference update rules
(`utils/optim.py` RAdam `:76-144`, AdamW `:146-205`), plus the prelu activation
factory wiring (`gcn_lib/sparse/torch_nn.py:9-20`)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deep_gcns_torch_tpu.utils.optim import adamw_ref, adamw_warmup, radam


def _np_radam_steps(p0, grads, lr, wd, b1=0.9, b2=0.999, eps=1e-8):
    """Numpy transcription of reference RAdam.step (`utils/optim.py:92-142`)."""
    p = p0.astype(np.float64).copy()
    m = np.zeros_like(p)
    v = np.zeros_like(p)
    n_sma_max = 2.0 / (1.0 - b2) - 1.0
    for t, g in enumerate(grads, start=1):
        g = g.astype(np.float64)
        v = b2 * v + (1 - b2) * g * g
        m = b1 * m + (1 - b1) * g
        beta2_t = b2 ** t
        n_sma = n_sma_max - 2.0 * t * beta2_t / (1.0 - beta2_t)
        if wd != 0:
            p = p - wd * lr * p  # lr-SCALED decoupled decay (`:129-130`)
        if n_sma >= 5:
            step_size = lr * np.sqrt(
                (1 - beta2_t) * (n_sma - 4) / (n_sma_max - 4)
                * (n_sma - 2) / n_sma * n_sma_max / (n_sma_max - 2)) / (1 - b1 ** t)
            p = p - step_size * m / (np.sqrt(v) + eps)
        else:
            p = p - (lr / (1 - b1 ** t)) * m
    return p


def _np_adamw_steps(p0, grads, lr, wd, warmup, b1=0.9, b2=0.999, eps=1e-8):
    """Numpy transcription of reference AdamW.step (`utils/optim.py:158-205`),
    including the quirk that warmup scales only the weight-decay term."""
    p = p0.astype(np.float64).copy()
    m = np.zeros_like(p)
    v = np.zeros_like(p)
    for t, g in enumerate(grads, start=1):
        g = g.astype(np.float64)
        v = b2 * v + (1 - b2) * g * g
        m = b1 * m + (1 - b1) * g
        bias1 = 1 - b1 ** t
        bias2 = 1 - b2 ** t
        if warmup > t:
            scheduled_lr = 1e-8 + t * lr / warmup
        else:
            scheduled_lr = lr
        step_size = lr * np.sqrt(bias2) / bias1  # quirk: raw lr, not scheduled
        if wd != 0:
            p = p - wd * scheduled_lr * p
        p = p - step_size * m / (np.sqrt(v) + eps)
    return p


@pytest.mark.parametrize("wd", [0.0, 0.01])
def test_radam_matches_reference_rule(rng_np, wd):
    lr = 3e-3
    p0 = rng_np.normal(size=(7, 5)).astype(np.float32)
    grads = [rng_np.normal(size=(7, 5)).astype(np.float32) for _ in range(8)]

    tx = radam(lr, weight_decay=wd)
    p = jnp.asarray(p0)
    st = tx.init(p)
    for g in grads:
        upd, st = tx.update(jnp.asarray(g), st, p)
        p = optax.apply_updates(p, upd)

    want = _np_radam_steps(p0, grads, lr, wd)
    np.testing.assert_allclose(np.asarray(p), want, rtol=2e-5, atol=2e-6)


def test_radam_covers_both_rectification_branches():
    # steps 1-4 take the un-rectified branch (N_sma < 5), step 5+ rectified —
    # make sure the transition produces finite, reference-matching params
    lr = 1e-2
    rng = np.random.default_rng(3)
    p0 = rng.normal(size=(4,)).astype(np.float32)
    grads = [rng.normal(size=(4,)).astype(np.float32) for _ in range(6)]
    tx = radam(lr, weight_decay=0.05)
    p = jnp.asarray(p0)
    st = tx.init(p)
    for g in grads:
        upd, st = tx.update(jnp.asarray(g), st, p)
        p = optax.apply_updates(p, upd)
    assert np.isfinite(np.asarray(p)).all()
    want = _np_radam_steps(p0, grads, lr, 0.05)
    np.testing.assert_allclose(np.asarray(p), want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("wd,warmup", [(0.0, 0), (0.02, 4)])
def test_adamw_ref_matches_reference_rule(rng_np, wd, warmup):
    lr = 2e-3
    p0 = rng_np.normal(size=(6,)).astype(np.float32)
    grads = [rng_np.normal(size=(6,)).astype(np.float32) for _ in range(7)]

    tx = adamw_ref(lr, warmup=warmup, weight_decay=wd)
    p = jnp.asarray(p0)
    st = tx.init(p)
    for g in grads:
        upd, st = tx.update(jnp.asarray(g), st, p)
        p = optax.apply_updates(p, upd)

    want = _np_adamw_steps(p0, grads, lr, wd, warmup)
    np.testing.assert_allclose(np.asarray(p), want, rtol=2e-5, atol=2e-6)


def test_adamw_warmup_honors_total_steps():
    # with total_steps set, lr decays linearly to 0 after warmup: the step-size
    # near total_steps must be much smaller than right after warmup
    tx = adamw_warmup(1e-2, warmup_steps=5, total_steps=50, weight_decay=0.0)
    p = jnp.ones((3,))
    st = tx.init(p)
    g = jnp.ones((3,))
    sizes = []
    for i in range(50):
        upd, st = tx.update(g, st, p)
        sizes.append(float(jnp.abs(upd).max()))
    assert sizes[6] > 10 * sizes[-1]  # decayed to (near) zero at the end


def test_prelu_dispatch_and_learnable_param():
    from deep_gcns_torch_tpu.nn.core import MLP, activation

    x = jnp.asarray([-2.0, 3.0])
    # static dispatch with the reference's init slope (neg_slope=0.2)
    np.testing.assert_allclose(np.asarray(activation("prelu", x)),
                               [-0.4, 3.0], rtol=1e-6)
    # learnable slope overrides
    np.testing.assert_allclose(
        np.asarray(activation("prelu", x, prelu=jnp.asarray([0.5]))),
        [-1.0, 3.0], rtol=1e-6)

    mlp = MLP((4, 8, 8), act="prelu", norm=None)
    params, state = mlp.init(jax.random.PRNGKey(0))
    assert all("prelu" in p for p in params), "MLP(prelu) layers own a slope param"

    # gradient flows to the slope param
    xin = -jnp.ones((3, 4))

    def loss(ps):
        y, _ = mlp.apply(ps, state, xin)
        return jnp.sum(y ** 2)

    grads = jax.grad(loss)(params)
    assert float(jnp.abs(grads[0]["prelu"]).sum()) > 0.0


def test_fastpath_miss_counter_increments():
    from deep_gcns_torch_tpu.ops import segment as seg

    before = seg.fastpath_misses().get(
        "segment_sum:graph has no CSR row_ptr aux", 0)
    ok = seg.sum_pallas_ok_shape((1024, 128), 512, has_row_ptr=False)
    assert not ok
    after = seg.fastpath_misses().get(
        "segment_sum:graph has no CSR row_ptr aux", 0)
    assert after == before + 1


def test_approx_knn_degenerate_has_no_duplicate_edges():
    # ceil(N/d) < k previously padded with self → duplicate edges; now falls
    # back to exact kNN (ADVICE r1: ops/knn.py approx path)
    from deep_gcns_torch_tpu.ops.knn import dilated_knn_graph_dense

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 3)).astype(np.float32))
    nn_idx, centers = dilated_knn_graph_dense(x, 5, 4, method="approx")
    idx = np.asarray(nn_idx)
    for b in range(idx.shape[0]):
        for n in range(idx.shape[1]):
            row = idx[b, n]
            assert len(set(row.tolist())) == len(row), f"dup neighbors: {row}"


@pytest.mark.parametrize("wd", [0.0, 0.01])
def test_rmsprop_matches_torch(rng_np, wd):
    """torch-exact RMSprop (RevGAT's optimizer,
    `examples/ogb_eff/ogbn_arxiv_dgl/main.py:231`): alpha=0.99, eps OUTSIDE
    the sqrt, coupled weight decay."""
    import torch

    from deep_gcns_torch_tpu.utils.optim import rmsprop

    lr = 3e-3
    p0 = rng_np.normal(size=(7, 5)).astype(np.float32)
    grads = [rng_np.normal(size=(7, 5)).astype(np.float32) for _ in range(8)]

    tx = rmsprop(lr, weight_decay=wd)
    p = jnp.asarray(p0)
    st = tx.init(p)
    for g in grads:
        upd, st = tx.update(jnp.asarray(g), st, p)
        p = optax.apply_updates(p, upd)

    tp = torch.nn.Parameter(torch.tensor(p0))
    opt = torch.optim.RMSprop([tp], lr=lr, weight_decay=wd)
    for g in grads:
        tp.grad = torch.tensor(g)
        opt.step()
    np.testing.assert_allclose(np.asarray(p), tp.detach().numpy(), rtol=2e-5,
                               atol=2e-6)
