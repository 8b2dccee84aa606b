"""Spatial × reversible composition: multi-device RevGCN output and training
step must equal the single-chip RevGCN (exact edge partitioning + exact
additive inverse — the 'RevGNN at pod scale' path, VERDICT r1 item 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deep_gcns_torch_tpu.graph import build_graph
from deep_gcns_torch_tpu.models.rev_gcn import RevGCN, RevGCNConfig
from deep_gcns_torch_tpu.parallel.mesh import make_mesh
from deep_gcns_torch_tpu.parallel.spatial import shard_graph, shard_nodes
from deep_gcns_torch_tpu.parallel.spatial_rev import (
    SpatialRevGCN, spatial_rev_forward, spatial_rev_train_step,
)
from np_ref import random_graph

N_DEV = 8


def setup(rng_np, n=640, e=4000, edge_dim=6, tasks=5, num_layers=3, group=2):
    x, s, r = random_graph(rng_np, n, e, 8, sort=False)
    ea = rng_np.standard_normal((e, edge_dim)).astype(np.float32)
    nf = rng_np.standard_normal((n, 8)).astype(np.float32)
    cfg = RevGCNConfig(in_channels=8, node_feat_dim=8, edge_feat_dim=edge_dim,
                       hidden_channels=16, num_tasks=tasks,
                       num_layers=num_layers, group=group, aggr="softmax",
                       conv_encode_edge=True, norm="layer", dropout=0.0,
                       use_one_hot_encoding=True)
    return x, nf, s, r, ea, cfg


def test_spatial_rev_forward_matches_single_chip(rng_np):
    n = 640
    x, nf, s, r, ea, cfg = setup(rng_np)
    model = SpatialRevGCN(cfg, exchange="halo")
    params, _ = jax.jit(model.init)(jax.random.PRNGKey(0))

    shards = shard_graph(s, r, n, N_DEV, edge_attr=ea)
    xs = jnp.asarray(shard_nodes(x, shards))
    nfs = jnp.asarray(shard_nodes(nf, shards))
    mesh = make_mesh(("gp",), devices=jax.devices()[:N_DEV])
    out = np.asarray(spatial_rev_forward(model, mesh)(
        params, xs, nfs, jax.device_put(shards)))
    got = out.reshape(-1, cfg.num_tasks)[:n]

    g = build_graph(x, s, r, edge_attr=ea, num_nodes=n)
    nf_pad = np.zeros((g.num_nodes_padded, 8), np.float32)
    nf_pad[:n] = nf
    single = RevGCN(cfg)
    want, _ = single.apply(params, {}, jnp.asarray(np.asarray(g.x)), g,
                           node_feats=jnp.asarray(nf_pad), train=False)
    np.testing.assert_allclose(got, np.asarray(want)[:n], rtol=3e-4, atol=3e-5)


def test_spatial_rev_train_step_matches_single_chip(rng_np):
    n = 512
    x, nf, s, r, ea, cfg = setup(rng_np, n=n, e=3000, num_layers=2)
    model = SpatialRevGCN(cfg)
    params, _ = jax.jit(model.init)(jax.random.PRNGKey(1))
    labels = rng_np.integers(0, cfg.num_tasks, n)
    tx = optax.sgd(0.05)

    # single-chip step first (the spatial step donates params)
    g = build_graph(x, s, r, edge_attr=ea, num_nodes=n)
    nf_pad = np.zeros((g.num_nodes_padded, 8), np.float32)
    nf_pad[:n] = nf
    lab_full = jnp.asarray(np.pad(labels, (0, g.num_nodes_padded - n)))
    mask_full = jnp.asarray(g.node_mask)
    single = RevGCN(cfg)

    def loss_single(p):
        logits, _ = single.apply(p, {}, jnp.asarray(np.asarray(g.x)), g,
                                 node_feats=jnp.asarray(nf_pad), train=True,
                                 rng=jax.random.PRNGKey(3))
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, lab_full[:, None], 1)[:, 0]
        m = mask_full.astype(nll.dtype)
        return jnp.sum(nll * m) / jnp.sum(m)

    l_want, grads = jax.value_and_grad(loss_single)(params)
    up, _ = tx.update(grads, tx.init(params), params)
    p_want = jax.tree_util.tree_map(np.asarray, optax.apply_updates(params, up))

    shards = shard_graph(s, r, n, N_DEV, edge_attr=ea)
    xs = jnp.asarray(shard_nodes(x, shards))
    nfs = jnp.asarray(shard_nodes(nf, shards))
    lab_sh = jnp.asarray(shard_nodes(labels[:, None].astype(np.int32),
                                     shards)[..., 0])
    mask_sh = jnp.asarray(np.asarray(shards.node_mask))
    mesh = make_mesh(("gp",), devices=jax.devices()[:N_DEV])

    def sum_loss(logits, lab, m):
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, lab[:, None], 1)[:, 0]
        m = m.astype(nll.dtype)
        return jnp.sum(nll * m), jnp.sum(m)

    step = spatial_rev_train_step(model, tx, sum_loss, mesh)
    p2, _, loss = step(params, tx.init(params), xs, nfs,
                       jax.device_put(shards), lab_sh, mask_sh,
                       jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(loss), float(l_want), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p2),
                    jax.tree_util.tree_leaves(p_want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=4e-4,
                                   atol=4e-5)


import dataclasses

import pytest


@pytest.mark.parametrize("conv", ["gcn", "sage", "gat"])
def test_spatial_rev_zoo_matches_single_chip(rng_np, conv):
    """Rev-zoo spatial twins (`eff_gcn_modules/rev/rev_layer.py:80-109`)
    compose with spatial partitioning — forward AND one SGD step match the
    single-chip RevGCN (gat: 2 heads, averaged, PyG-1.x self-loop softmax)."""
    n = 512
    x, nf, s, r, _, cfg = setup(rng_np, n=n, e=3000, num_layers=2)
    cfg = dataclasses.replace(cfg, conv=conv,
                              heads=2 if conv == "gat" else 1)
    model = SpatialRevGCN(cfg, exchange="halo")
    params, _ = jax.jit(model.init)(jax.random.PRNGKey(4))
    labels = rng_np.integers(0, cfg.num_tasks, n)
    tx = optax.sgd(0.05)

    # single-chip twins (forward + one step) FIRST: the spatial step donates
    g = build_graph(x, s, r, num_nodes=n)
    nf_pad = np.zeros((g.num_nodes_padded, 8), np.float32)
    nf_pad[:n] = nf
    lab_full = jnp.asarray(np.pad(labels, (0, g.num_nodes_padded - n)))
    mask_full = jnp.asarray(g.node_mask)
    single = RevGCN(cfg)
    want, _ = single.apply(params, {}, jnp.asarray(np.asarray(g.x)), g,
                           node_feats=jnp.asarray(nf_pad), train=False)

    def loss_single(p):
        logits, _ = single.apply(p, {}, jnp.asarray(np.asarray(g.x)), g,
                                 node_feats=jnp.asarray(nf_pad), train=True,
                                 rng=jax.random.PRNGKey(5))
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, lab_full[:, None], 1)[:, 0]
        m = mask_full.astype(nll.dtype)
        return jnp.sum(nll * m) / jnp.sum(m)

    l_want, grads = jax.value_and_grad(loss_single)(params)
    up, _ = tx.update(grads, tx.init(params), params)
    p_want = jax.tree_util.tree_map(np.asarray, optax.apply_updates(params, up))

    shards = shard_graph(s, r, n, N_DEV)
    xs = jnp.asarray(shard_nodes(x, shards))
    nfs = jnp.asarray(shard_nodes(nf, shards))
    mesh = make_mesh(("gp",), devices=jax.devices()[:N_DEV])
    out = np.asarray(spatial_rev_forward(model, mesh)(
        params, xs, nfs, jax.device_put(shards)))
    np.testing.assert_allclose(out.reshape(-1, cfg.num_tasks)[:n],
                               np.asarray(want)[:n], rtol=3e-4, atol=3e-5)

    lab_sh = jnp.asarray(shard_nodes(labels[:, None].astype(np.int32),
                                     shards)[..., 0])
    mask_sh = jnp.asarray(np.asarray(shards.node_mask))

    def sum_loss(logits, lab, m):
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, lab[:, None], 1)[:, 0]
        m = m.astype(nll.dtype)
        return jnp.sum(nll * m), jnp.sum(m)

    step = spatial_rev_train_step(model, tx, sum_loss, mesh)
    p2, _, loss = step(params, tx.init(params), xs, nfs,
                       jax.device_put(shards), lab_sh, mask_sh,
                       jax.random.PRNGKey(5))
    np.testing.assert_allclose(float(loss), float(l_want), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p2),
                    jax.tree_util.tree_leaves(p_want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=4e-4,
                                   atol=4e-5)
