"""Tensor (channel) parallelism (parallel/tensor.py): the TP twin must match
the single-chip DeeperGCN exactly — forward logits AND one SGD step — with
params genuinely sharded across the mesh (leading device axis)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deep_gcns_torch_tpu.graph import build_graph
from deep_gcns_torch_tpu.models import DeeperGCN, DeeperGCNConfig
from deep_gcns_torch_tpu.parallel import (TPDeeperGCN, make_mesh,
                                          shard_deeper_params, tp_forward,
                                          tp_train_step,
                                          unshard_deeper_params)

N_DEV = 4


def setup(rng, n=512, e=3000, c_hidden=32, aggr="softmax", norm="batch"):
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    x = rng.standard_normal((n, 16)).astype(np.float32)
    g = build_graph(x, s, r, num_nodes=n)
    cfg = DeeperGCNConfig(
        in_channels=16, hidden_channels=c_hidden, num_tasks=8, num_layers=3,
        block="res+", aggr=aggr, t=0.5, norm=norm, mlp_layers=1,
        dropout=0.0)
    return g, cfg


@pytest.mark.parametrize("aggr,norm", [("softmax", "batch"),
                                       ("mean", "batch"),
                                       ("softmax", "layer")])
def test_tp_forward_matches_single_chip(rng_np, aggr, norm):
    g, cfg = setup(rng_np, aggr=aggr, norm=norm)
    single = DeeperGCN(cfg)
    params, state = jax.jit(single.init)(jax.random.PRNGKey(0))
    want, _ = single.apply(params, state, g.x, g, train=False)

    model = TPDeeperGCN(cfg)
    p_tp, s_tp = shard_deeper_params(
        jax.tree_util.tree_map(np.asarray, params),
        jax.tree_util.tree_map(np.asarray, state), N_DEV, cfg)
    mesh = make_mesh(("tp",), devices=jax.devices()[:N_DEV])
    got = tp_forward(model, mesh)(
        jax.tree_util.tree_map(jnp.asarray, p_tp),
        jax.tree_util.tree_map(jnp.asarray, s_tp), g.x, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=2e-5)


@pytest.mark.parametrize("norm", ["batch", "layer"])
def test_tp_train_step_matches_single_chip(rng_np, norm):
    # norm="layer": the proteins 112-layer flagship norm — cross-channel
    # stats via ONE packed (sum, sq) tp psum (round 5; r4 gated it off)
    g, cfg = setup(rng_np, norm=norm)
    n_pad = g.num_nodes_padded
    labels = jnp.asarray(rng_np.integers(0, 8, n_pad))
    single = DeeperGCN(cfg)
    params, state = jax.jit(single.init)(jax.random.PRNGKey(0))
    tx = optax.sgd(0.05)

    def loss_fn(logits, lab, mask):
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, lab[:, None], 1)[:, 0]
        m = mask.astype(nll.dtype)
        return jnp.sum(nll * m) / jnp.sum(m)

    def loss_single(p):
        logits, s2 = single.apply(p, state, g.x, g, train=True,
                                  rng=jax.random.PRNGKey(1))
        return loss_fn(logits, labels, g.node_mask), s2

    (l_want, _), grads = jax.value_and_grad(loss_single, has_aux=True)(params)
    up, _ = tx.update(grads, tx.init(params), params)
    p_want = jax.tree_util.tree_map(np.asarray, optax.apply_updates(params, up))

    model = TPDeeperGCN(cfg)
    p_tp, s_tp = shard_deeper_params(
        jax.tree_util.tree_map(np.asarray, params),
        jax.tree_util.tree_map(np.asarray, state), N_DEV, cfg)
    p_tp = jax.tree_util.tree_map(jnp.asarray, p_tp)
    s_tp = jax.tree_util.tree_map(jnp.asarray, s_tp)
    mesh = make_mesh(("tp",), devices=jax.devices()[:N_DEV])
    step = tp_train_step(model, tx, loss_fn, mesh)
    p2, s2, _, loss = step(p_tp, s_tp, tx.init(p_tp), g.x, g, labels,
                           jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss), float(l_want), rtol=1e-5)

    # unshard and compare the updated params against the single-chip step
    p2_un, _ = unshard_deeper_params(
        jax.tree_util.tree_map(np.asarray, p2),
        jax.tree_util.tree_map(np.asarray, s2))
    flat_tp = {jax.tree_util.keystr(k): v for k, v in
               jax.tree_util.tree_flatten_with_path(p2_un)[0]}
    flat_single = {jax.tree_util.keystr(k): v for k, v in
                   jax.tree_util.tree_flatten_with_path(p_want)[0]}
    assert set(flat_tp) == set(flat_single)
    for k in flat_single:
        np.testing.assert_allclose(flat_tp[k], flat_single[k], rtol=4e-4,
                                   atol=4e-5, err_msg=k)


def test_tp_shard_roundtrip(rng_np):
    g, cfg = setup(rng_np)
    single = DeeperGCN(cfg)
    params, state = jax.jit(single.init)(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(np.asarray, params)
    state = jax.tree_util.tree_map(np.asarray, state)
    p_tp, s_tp = shard_deeper_params(params, state, N_DEV, cfg)
    p_un, s_un = unshard_deeper_params(p_tp, s_tp)
    for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_flatten_with_path(p_un)[0],
            jax.tree_util.tree_flatten_with_path(
                {k: params[k] for k in ("encoder", "pred", "gcns", "norms")}
            )[0]):
        np.testing.assert_array_equal(a, b, err_msg=str(k1))


def test_tp_rejects_unsupported_configs(rng_np):
    _, cfg = setup(rng_np)
    with pytest.raises(AssertionError):
        TPDeeperGCN(dataclasses.replace(cfg, mlp_layers=3))
    with pytest.raises(AssertionError):
        TPDeeperGCN(dataclasses.replace(cfg, norm="instance"))
    with pytest.raises(AssertionError):
        TPDeeperGCN(dataclasses.replace(cfg, block="res"))
    with pytest.raises(AssertionError):
        TPDeeperGCN(dataclasses.replace(cfg, msg_norm=True))


@pytest.mark.parametrize("norm", ["batch", "layer"])
def test_tp_mlp2_forward_and_step_match(rng_np, norm):
    """mlp_layers=2 (the ogbg config shape): the Megatron-style two-matmul
    MLP with its inter-layer norm on the channel shard — forward and one
    SGD step match the single chip (BatchNorm: running stats included;
    LayerNorm: cross-channel stats via the packed tp psum, round 5)."""
    g, cfg = setup(rng_np, norm=norm)
    cfg = dataclasses.replace(cfg, mlp_layers=2)
    single = DeeperGCN(cfg)
    params, state = jax.jit(single.init)(jax.random.PRNGKey(0))
    want, st_want = single.apply(params, state, g.x, g, train=True,
                                 rng=jax.random.PRNGKey(1))

    model = TPDeeperGCN(cfg)
    p_tp, s_tp = shard_deeper_params(
        jax.tree_util.tree_map(np.asarray, params),
        jax.tree_util.tree_map(np.asarray, state), N_DEV, cfg)
    p_tp = jax.tree_util.tree_map(jnp.asarray, p_tp)
    s_tp = jax.tree_util.tree_map(jnp.asarray, s_tp)
    mesh = make_mesh(("tp",), devices=jax.devices()[:N_DEV])
    labels = jnp.asarray(rng_np.integers(0, 8, g.num_nodes_padded))
    tx = optax.sgd(0.05)

    def loss_fn(logits, lab, mask):
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, lab[:, None], 1)[:, 0]
        m = mask.astype(nll.dtype)
        return jnp.sum(nll * m) / jnp.sum(m)

    step = tp_train_step(model, tx, loss_fn, mesh)
    p2, s2, _, loss = step(p_tp, s_tp, tx.init(p_tp), g.x, g, labels,
                           jax.random.PRNGKey(1))

    def loss_single(p):
        logits, s_out = single.apply(p, state, g.x, g, train=True,
                                     rng=jax.random.PRNGKey(1))
        return loss_fn(logits, labels, g.node_mask), s_out

    (l_want, st_out), grads = jax.value_and_grad(loss_single,
                                                 has_aux=True)(params)
    up, _ = tx.update(grads, tx.init(params), params)
    p_want = jax.tree_util.tree_map(np.asarray, optax.apply_updates(params, up))
    np.testing.assert_allclose(float(loss), float(l_want), rtol=1e-5)

    p2_un, s2_un = unshard_deeper_params(
        jax.tree_util.tree_map(np.asarray, p2),
        jax.tree_util.tree_map(np.asarray, s2))
    for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_flatten_with_path(p2_un)[0],
            jax.tree_util.tree_flatten_with_path(p_want)[0]):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5,
                                   err_msg=str(k1))
    # BN running stats (incl. the MLP's inter-layer norm) match the
    # single-chip update
    for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_flatten_with_path(s2_un)[0],
            jax.tree_util.tree_flatten_with_path(
                jax.tree_util.tree_map(np.asarray, st_out))[0]):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5,
                                   err_msg=str(k1))
