"""2-D mesh (spatial x tensor) parallelism (parallel/spatial_tp.py): nodes
sharded over "gp", channels over "tp" — forward and one SGD step must match
the single-chip DeeperGCN exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deep_gcns_torch_tpu.graph import build_graph
from deep_gcns_torch_tpu.models import DeeperGCN, DeeperGCNConfig
from deep_gcns_torch_tpu.parallel import (SpatialTPDeeperGCN, make_mesh,
                                          shard_deeper_params, shard_graph,
                                          shard_nodes, spatial_tp_forward,
                                          spatial_tp_train_step,
                                          unshard_deeper_params)

GP, TP = 2, 2


def setup(rng, n=1000, e=6000, c_hidden=32, norm="batch"):
    s = rng.integers(0, n, e)
    r = rng.integers(0, n, e)
    x = rng.standard_normal((n, 16)).astype(np.float32)
    cfg = DeeperGCNConfig(
        in_channels=16, hidden_channels=c_hidden, num_tasks=8, num_layers=3,
        block="res+", aggr="softmax", t=0.5, norm=norm, mlp_layers=1,
        dropout=0.0)
    return s, r, x, cfg


def _mesh():
    return make_mesh(("gp", "tp"), shape=(GP, TP),
                     devices=jax.devices()[:GP * TP])


def _shard_all(params, state, s, r, x, n, cfg):
    p_tp, s_tp = shard_deeper_params(
        jax.tree_util.tree_map(np.asarray, params),
        jax.tree_util.tree_map(np.asarray, state), TP, cfg)
    shards = shard_graph(s, r, n, GP)
    xs = jnp.asarray(shard_nodes(x, shards))
    return (jax.tree_util.tree_map(jnp.asarray, p_tp),
            jax.tree_util.tree_map(jnp.asarray, s_tp), shards, xs)


@pytest.mark.parametrize("norm", ["batch", "layer"])
def test_spatial_tp_forward_matches_single_chip(rng_np, norm):
    # norm="layer" (round 5): per-node cross-channel stats via one tp psum —
    # no gp reduction needed, so it composes with the spatial axis for free
    n = 1000
    s, r, x, cfg = setup(rng_np, n=n, norm=norm)
    single = DeeperGCN(cfg)
    params, state = jax.jit(single.init)(jax.random.PRNGKey(0))
    g = build_graph(x, s, r, num_nodes=n)
    want, _ = single.apply(params, state, g.x, g, train=False)

    model = SpatialTPDeeperGCN(cfg)
    p_tp, s_tp, shards, xs = _shard_all(params, state, s, r, x, n, cfg)
    out = spatial_tp_forward(model, _mesh())(p_tp, s_tp, xs,
                                             jax.device_put(shards))
    got = np.asarray(out).reshape(-1, cfg.num_tasks)[:n]
    np.testing.assert_allclose(got, np.asarray(want)[:n], rtol=3e-4,
                               atol=3e-5)


def test_spatial_tp_train_step_matches_single_chip(rng_np):
    n = 1000
    s, r, x, cfg = setup(rng_np, n=n)
    single = DeeperGCN(cfg)
    params, state = jax.jit(single.init)(jax.random.PRNGKey(0))
    g = build_graph(x, s, r, num_nodes=n)
    labels = rng_np.integers(0, 8, n)
    lab_full = jnp.asarray(np.pad(labels, (0, g.num_nodes_padded - n)))
    tx = optax.sgd(0.05)

    def loss_single(p):
        logits, s2 = single.apply(p, state, g.x, g, train=True,
                                  rng=jax.random.PRNGKey(1))
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, lab_full[:, None], 1)[:, 0]
        m = g.node_mask.astype(nll.dtype)
        return jnp.sum(nll * m) / jnp.sum(m), s2

    (l_want, _), grads = jax.value_and_grad(loss_single, has_aux=True)(params)
    up, _ = tx.update(grads, tx.init(params), params)
    p_want = jax.tree_util.tree_map(np.asarray, optax.apply_updates(params, up))

    model = SpatialTPDeeperGCN(cfg)
    p_tp, s_tp, shards, xs = _shard_all(params, state, s, r, x, n, cfg)
    lab_sh = jnp.asarray(shard_nodes(labels[:, None].astype(np.int32),
                                     shards)[..., 0])
    mask_sh = jnp.asarray(np.asarray(shards.node_mask))

    def sum_loss(logits, lab, m):
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, lab[:, None], 1)[:, 0]
        m = m.astype(nll.dtype)
        return jnp.sum(nll * m), jnp.sum(m)

    step = spatial_tp_train_step(model, tx, sum_loss, _mesh())
    p2, s2, _, loss = step(p_tp, s_tp, tx.init(p_tp), xs,
                           jax.device_put(shards), lab_sh, mask_sh,
                           jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss), float(l_want), rtol=1e-5)

    p2_un, _ = unshard_deeper_params(
        jax.tree_util.tree_map(np.asarray, p2),
        jax.tree_util.tree_map(np.asarray, s2))
    flat_tp = {jax.tree_util.keystr(k): v for k, v in
               jax.tree_util.tree_flatten_with_path(p2_un)[0]}
    flat_single = {jax.tree_util.keystr(k): v for k, v in
                   jax.tree_util.tree_flatten_with_path(p_want)[0]}
    for k in flat_single:
        np.testing.assert_allclose(flat_tp[k], flat_single[k], rtol=5e-4,
                                   atol=5e-5, err_msg=k)
