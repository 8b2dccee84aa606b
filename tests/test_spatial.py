"""Spatial (edge-partitioned) parallelism: multi-device output must equal the
single-chip model — the correctness oracle from SURVEY §7 (hard part 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deep_gcns_torch_tpu.graph import build_graph
from deep_gcns_torch_tpu.models import DeeperGCN, DeeperGCNConfig
from deep_gcns_torch_tpu.parallel.mesh import make_mesh
from deep_gcns_torch_tpu.parallel.spatial import (
    SpatialDeeperGCN, shard_graph, shard_nodes, spatial_forward,
    spatial_train_step,
)
from np_ref import random_graph

N_DEV = 8


def setup(rng_np, n=900, e=5000, c=16, tasks=5, num_layers=3, edge_dim=0):
    x, s, r = random_graph(rng_np, n, e, c, sort=False)
    ea = (rng_np.standard_normal((e, edge_dim)).astype(np.float32)
          if edge_dim else None)
    cfg = DeeperGCNConfig(
        in_channels=c, hidden_channels=24, num_tasks=tasks, num_layers=num_layers,
        block="res+", aggr="softmax", norm="layer", mlp_layers=1, dropout=0.0,
        remat=False, edge_mode="per_layer" if edge_dim else "none",
        edge_feat_dim=edge_dim)
    return x, s, r, ea, cfg


def single_chip_logits(x, s, r, ea, cfg, params, state, n):
    g = build_graph(x, s, r, edge_attr=ea, num_nodes=n)
    model = DeeperGCN(cfg)
    y, _ = model.apply(params, state, jnp.asarray(np.asarray(g.x)), g, train=False)
    return np.asarray(y)[:n]


import pytest


@pytest.mark.parametrize("exchange", ["halo", "allgather"])
def test_spatial_forward_matches_single_chip(rng_np, exchange):
    n = 900
    x, s, r, ea, cfg = setup(rng_np, n=n)
    model = SpatialDeeperGCN(cfg, exchange=exchange)
    params, state = model.init(jax.random.PRNGKey(0))

    shards = shard_graph(s, r, n, N_DEV, edge_attr=ea)
    xs = jnp.asarray(shard_nodes(x, shards))
    mesh = make_mesh(("gp",), devices=jax.devices()[:N_DEV])
    fwd = spatial_forward(model, mesh)
    out = np.asarray(fwd(params, state, xs, jax.device_put(shards)))
    out_full = out.reshape(-1, cfg.num_tasks)[:n]

    want = single_chip_logits(x, s, r, ea, cfg, params, state, n)
    np.testing.assert_allclose(out_full, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("block", ["res", "plain"])
def test_spatial_res_plain_blocks_match_single_chip(rng_np, block):
    n = 700
    x, s, r, ea, cfg = setup(rng_np, n=n)
    import dataclasses
    cfg = dataclasses.replace(cfg, block=block)
    model = SpatialDeeperGCN(cfg, exchange="halo")
    params, state = model.init(jax.random.PRNGKey(4))
    shards = shard_graph(s, r, n, N_DEV)
    xs = jnp.asarray(shard_nodes(x, shards))
    mesh = make_mesh(("gp",), devices=jax.devices()[:N_DEV])
    out = np.asarray(spatial_forward(model, mesh)(
        params, state, xs, jax.device_put(shards)))
    want = single_chip_logits(x, s, r, None, cfg, params, state, n)
    np.testing.assert_allclose(out.reshape(-1, cfg.num_tasks)[:n], want,
                               rtol=2e-4, atol=2e-5)


def test_spatial_forward_with_edge_attrs(rng_np):
    n = 700
    x, s, r, ea, cfg = setup(rng_np, n=n, edge_dim=6)
    model = SpatialDeeperGCN(cfg)
    params, state = model.init(jax.random.PRNGKey(1))
    shards = shard_graph(s, r, n, N_DEV, edge_attr=ea)
    xs = jnp.asarray(shard_nodes(x, shards))
    mesh = make_mesh(("gp",), devices=jax.devices()[:N_DEV])
    out = np.asarray(spatial_forward(model, mesh)(
        params, state, xs, jax.device_put(shards)))
    want = single_chip_logits(x, s, r, ea, cfg, params, state, n)
    np.testing.assert_allclose(out.reshape(-1, cfg.num_tasks)[:n], want,
                               rtol=2e-4, atol=2e-5)


def test_spatial_train_step_matches_single_chip_grads(rng_np):
    """One spatial SGD step == one single-chip SGD step (exact distributed
    training — no dropped edges, unlike the reference's lossy partitioning)."""
    n = 640
    x, s, r, ea, cfg = setup(rng_np, n=n, tasks=4, num_layers=2)
    model = SpatialDeeperGCN(cfg)
    params, state = model.init(jax.random.PRNGKey(2))
    labels = rng_np.integers(0, 4, n)

    shards = shard_graph(s, r, n, N_DEV)
    xs = jnp.asarray(shard_nodes(x, shards))
    lab_sh = jnp.asarray(shard_nodes(labels[:, None].astype(np.int32), shards)[..., 0])
    mask_sh = jnp.asarray(np.asarray(shards.node_mask))
    mesh = make_mesh(("gp",), devices=jax.devices()[:N_DEV])
    tx = optax.sgd(0.1)
    opt_state = tx.init(params)

    def loss_fn(logits, lab, m):
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, lab[:, None], 1)[:, 0]
        m = m.astype(nll.dtype)
        return jnp.sum(nll * m), jnp.sum(m)

    # single-chip equivalent step (computed FIRST: the spatial step donates params)
    g = build_graph(x, s, r, num_nodes=n)
    single = DeeperGCN(cfg)
    lab_full = jnp.asarray(np.pad(labels, (0, g.num_nodes_padded - n)))
    mask_full = jnp.asarray(g.node_mask)

    def loss_single(p):
        logits, _ = single.apply(p, state, jnp.asarray(np.asarray(g.x)), g,
                                 train=True, rng=jax.random.PRNGKey(3))
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, lab_full[:, None], 1)[:, 0]
        m = mask_full.astype(nll.dtype)
        return jnp.sum(nll * m) / jnp.sum(m)

    l1, grads = jax.value_and_grad(loss_single)(params)
    up, _ = tx.update(grads, tx.init(params), params)
    p_want = optax.apply_updates(params, up)
    p_want = jax.tree_util.tree_map(np.asarray, p_want)

    step = spatial_train_step(model, tx, loss_fn, mesh)
    p2, s2, o2, loss = step(params, state, opt_state, xs, jax.device_put(shards),
                            lab_sh, mask_sh, jax.random.PRNGKey(3))

    np.testing.assert_allclose(float(loss), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p2),
                    jax.tree_util.tree_leaves(p_want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4,
                                   atol=3e-5)


def test_spatial_band_matches_single_chip(rng_np):
    """Spatial × band composition: local partial aggregation through the
    band-dense kernel (interpret mode), halo partial via take+CSR — output
    equals the single-chip model."""
    n = 900
    x, s, r, _, cfg = setup(rng_np, n=n)
    model = SpatialDeeperGCN(cfg, exchange="halo", band_interpret=True)
    params, state = model.init(jax.random.PRNGKey(7))
    shards = shard_graph(s, r, n, N_DEV, band="auto")
    assert shards.loc_band is not None
    xs = jnp.asarray(shard_nodes(x, shards))
    mesh = make_mesh(("gp",), devices=jax.devices()[:N_DEV])
    out = np.asarray(spatial_forward(model, mesh)(
        params, state, xs, jax.device_put(shards)))
    want = single_chip_logits(x, s, r, None, cfg, params, state, n)
    np.testing.assert_allclose(out.reshape(-1, cfg.num_tasks)[:n], want,
                               rtol=3e-4, atol=3e-5)


def test_spatial_band_train_step_matches_single_chip(rng_np):
    """Gradients through the band branch (incl. stop-grad-weights softmax_sg
    semantics and learn_t) equal the single-chip step."""
    import dataclasses

    n = 640
    x, s, r, _, cfg = setup(rng_np, n=n, tasks=4, num_layers=2)
    for aggr, learn_t in (("softmax_sg", False), ("softmax", True)):
        cfg2 = dataclasses.replace(cfg, aggr=aggr, learn_t=learn_t, t=0.8)
        model = SpatialDeeperGCN(cfg2, exchange="halo", band_interpret=True)
        params, state = model.init(jax.random.PRNGKey(8))
        labels = rng_np.integers(0, 4, n)
        shards = shard_graph(s, r, n, N_DEV, band="auto")
        xs = jnp.asarray(shard_nodes(x, shards))
        lab_sh = jnp.asarray(shard_nodes(labels[:, None].astype(np.int32),
                                         shards)[..., 0])
        mask_sh = jnp.asarray(np.asarray(shards.node_mask))
        mesh = make_mesh(("gp",), devices=jax.devices()[:N_DEV])
        tx = optax.sgd(0.1)
        opt_state = tx.init(params)

        def sum_loss(logits, lab, m):
            logp = jax.nn.log_softmax(logits, -1)
            nll = -jnp.take_along_axis(logp, lab[:, None], 1)[:, 0]
            m = m.astype(nll.dtype)
            return jnp.sum(nll * m), jnp.sum(m)

        # single-chip reference step FIRST (spatial_train_step donates params)
        g = build_graph(x, s, r, num_nodes=n)
        ref_model = DeeperGCN(cfg2)
        lab_full = jnp.asarray(np.pad(labels, (0, g.num_nodes_padded - n)))
        mask_full = jnp.asarray(np.asarray(g.node_mask))

        def lossf(p):
            logits, _ = ref_model.apply(p, state, jnp.asarray(np.asarray(g.x)),
                                        g, train=True, rng=jax.random.PRNGKey(0))
            ls, cnt = sum_loss(logits, lab_full, mask_full)
            return ls / jnp.maximum(cnt, 1.0)

        ref_loss, grads = jax.value_and_grad(lossf)(params)
        upd, _ = tx.update(grads, tx.init(params), params)
        p_ref = optax.apply_updates(params, upd)

        step = spatial_train_step(model, tx, sum_loss, mesh)
        p2, _, _, loss = step(params, state, opt_state, xs,
                              jax.device_put(shards), lab_sh, mask_sh,
                              jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-4)
        for a, b in zip(jax.tree_util.tree_leaves(p2),
                        jax.tree_util.tree_leaves(p_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=4e-3,
                                       atol=4e-5)


def test_spatial_band_sum_family_matches_single_chip(rng_np):
    """Round-3 zoo extension: the spatial × band composition also serves the
    sum-family aggregators (mean/power) — forward equals the single-chip
    model (band local partial + take+CSR halo partial)."""
    import dataclasses

    n = 900
    x, s, r, _, cfg = setup(rng_np, n=n, num_layers=2)
    for aggr, learn_p in (("mean", False), ("power", True), ("sum", False)):
        cfg2 = dataclasses.replace(cfg, aggr=aggr, learn_p=learn_p)
        model = SpatialDeeperGCN(cfg2, exchange="halo", band_interpret=True)
        params, state = model.init(jax.random.PRNGKey(11))
        shards = shard_graph(s, r, n, N_DEV, band="auto")
        xs = jnp.asarray(shard_nodes(x, shards))
        mesh = make_mesh(("gp",), devices=jax.devices()[:N_DEV])
        out = np.asarray(spatial_forward(model, mesh)(
            params, state, xs, jax.device_put(shards)))
        want = single_chip_logits(x, s, r, None, cfg2, params, state, n)
        np.testing.assert_allclose(out.reshape(-1, cfg2.num_tasks)[:n], want,
                                   rtol=3e-4, atol=3e-5, err_msg=aggr)
