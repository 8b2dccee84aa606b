"""Shared spatial (edge-partitioned) full-graph training loop for the
node-classification apps (ogbn-arxiv, ogbn-products): exact multi-device
training — one full-batch step per epoch over an N-device mesh with halo
exchange (parallel/spatial.py) — where the reference trains on lossy random
subgraphs (`examples/ogb/ogbn_products/main.py:87-124`) or a single device
(`examples/ogb/ogbn_arxiv/main.py`)."""

from __future__ import annotations

import os

import numpy as np


def deeper_gcn_config(args, in_dim):
    from deep_gcns_torch_tpu.models import DeeperGCNConfig

    return DeeperGCNConfig(
        in_channels=in_dim, hidden_channels=args.hidden_channels,
        num_tasks=args.num_classes, num_layers=args.num_layers, block=args.block,
        aggr=args.gcn_aggr, t=args.t, learn_t=args.learn_t,
        p=getattr(args, "p", 1.0), learn_p=getattr(args, "learn_p", False),
        y=getattr(args, "y", 0.0), learn_y=getattr(args, "learn_y", False),
        msg_norm=getattr(args, "msg_norm", False),
        learn_msg_scale=getattr(args, "learn_msg_scale", False),
        norm=args.norm, mlp_layers=args.mlp_layers, dropout=args.dropout,
        compute_dtype=args.compute_dtype, remat=args.remat)


def run_spatial(args, exp, logger, scalars, s, r, x_np, labels, splits, in_dim,
                n):
    """Train DeeperGCN on the FULL graph, edge-partitioned over
    `args.spatial` devices; cross-entropy on the train split, accuracy eval
    on full-graph logits every `eval_every` epochs."""
    import jax
    import jax.numpy as jnp

    from common import EpochTimer, make_optimizer
    from deep_gcns_torch_tpu.parallel.mesh import make_mesh
    from deep_gcns_torch_tpu.parallel.spatial import (
        SpatialDeeperGCN, shard_graph, shard_nodes, spatial_forward,
        spatial_train_step)
    from deep_gcns_torch_tpu.utils.ckpt import save_best, save_ckpt
    from deep_gcns_torch_tpu.utils.metrics import accuracy

    D = args.spatial
    devs = jax.devices()
    assert len(devs) >= D, (
        f"--spatial {D} needs {D} devices, found {len(devs)} "
        f"({devs[0].platform}); on CPU use --platform cpu (virtual devices)")
    mesh = make_mesh(("gp",), devices=devs[:D])
    on_tpu = devs[0].platform == "tpu"
    shards = shard_graph(s, r, n, D,
                         band="auto" if getattr(args, "band", "off") != "off"
                         else "off")
    logger.info("spatial: D=%d shard=%d halo_rows/dev/layer=%d", D,
                shards.shard_size, shards.halo_rows_per_device)
    xs = jnp.asarray(shard_nodes(np.asarray(x_np, np.float32), shards))
    lab_np = np.asarray(labels).astype(np.int32)
    lab_sh = jnp.asarray(shard_nodes(lab_np[:, None], shards)[..., 0])
    tmask = np.zeros(n, np.float32)
    tmask[np.asarray(splits["train"])] = 1.0
    m_sh = (jnp.asarray(shard_nodes(tmask[:, None], shards)[..., 0] > 0)
            & jnp.asarray(np.asarray(shards.node_mask)))

    model = SpatialDeeperGCN(deeper_gcn_config(args, in_dim),
                             exchange=getattr(args, "exchange", "auto"),
                             band_interpret=not on_tpu)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(args.seed))
    tx = make_optimizer(args)
    opt_state = tx.init(params)

    def loss_fn(logits, lab, m):
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, lab[:, None].astype(jnp.int32), 1)[:, 0]
        m = m.astype(nll.dtype)
        return jnp.sum(nll * m), jnp.sum(m)

    step = spatial_train_step(model, tx, loss_fn, mesh)
    fwd = spatial_forward(model, mesh)
    sh_dev = jax.device_put(shards)
    timer = EpochTimer()
    key = jax.random.PRNGKey(args.seed + 1)
    best_valid = -1.0
    eval_every = getattr(args, "eval_every", 5)
    for epoch in range(args.epochs):
        key, sub = jax.random.split(key)
        params, state, opt_state, loss = step(params, state, opt_state, xs,
                                              sh_dev, lab_sh, m_sh, sub)
        if epoch % eval_every == 0 or epoch == args.epochs - 1:
            logits = np.asarray(fwd(params, state, xs, sh_dev))
            # contiguous ownership: device d holds global rows [d·S, (d+1)·S)
            pred = logits.reshape(-1, logits.shape[-1])[:n].argmax(-1)
            accs = {k: accuracy(pred[np.asarray(v)], lab_np[np.asarray(v)])
                    for k, v in splits.items()}
            logger.info("epoch %d loss %.4f train %.4f valid %.4f test %.4f "
                        "(%.2fs)", epoch, float(loss), accs["train"],
                        accs["valid"], accs["test"], timer.lap())
            scalars.log(epoch, loss=float(loss),
                        **{f"acc_{k}": v for k, v in accs.items()})
            if accs["valid"] > best_valid:
                best_valid = accs["valid"]
                if getattr(args, "save_ckpt", False):
                    save_ckpt(os.path.join(exp, "ckpt"), params=params,
                              state=state, opt_state=opt_state, epoch=epoch,
                              best_value=best_valid)
                    save_best(os.path.join(exp, "ckpt"), True)
    logger.info("best valid acc %.4f; mean epoch %.2fs", best_valid,
                timer.mean())
    return best_valid


def run_spatial_tp(args, exp, logger, scalars, s, r, x_np, labels, splits,
                   in_dim, n):
    """Train DeeperGCN on the FULL graph over a ("gp", "tp") mesh: nodes
    edge-partitioned over --spatial devices × channels sharded over --tp
    (parallel/spatial_tp.py; --spatial 1 gives pure tensor parallelism).
    The reference has no multi-device training at all."""
    import jax
    import jax.numpy as jnp

    from common import EpochTimer, make_optimizer
    from deep_gcns_torch_tpu.parallel import (SpatialTPDeeperGCN, make_mesh,
                                              shard_deeper_params,
                                              shard_graph, shard_nodes,
                                              spatial_tp_forward,
                                              spatial_tp_train_step)
    from deep_gcns_torch_tpu.models import DeeperGCN
    from deep_gcns_torch_tpu.utils.ckpt import save_best, save_ckpt
    from deep_gcns_torch_tpu.utils.metrics import accuracy

    D, T = args.spatial, args.tp
    devs = jax.devices()
    assert len(devs) >= D * T, (
        f"--spatial {D} --tp {T} needs {D * T} devices, found {len(devs)} "
        f"({devs[0].platform}); on CPU use --platform cpu (virtual devices)")
    mesh = make_mesh(("gp", "tp"), shape=(D, T), devices=devs[:D * T])
    cfg = deeper_gcn_config(args, in_dim)
    shards = shard_graph(s, r, n, D)
    logger.info("2-D mesh: gp=%d tp=%d shard=%d halo_rows/dev/layer=%d "
                "(TP shrinks halo traffic %dx)", D, T, shards.shard_size,
                shards.halo_rows_per_device, T)
    xs = jnp.asarray(shard_nodes(np.asarray(x_np, np.float32), shards))
    lab_np = np.asarray(labels).astype(np.int32)
    lab_sh = jnp.asarray(shard_nodes(lab_np[:, None], shards)[..., 0])
    tmask = np.zeros(n, np.float32)
    tmask[np.asarray(splits["train"])] = 1.0
    m_sh = (jnp.asarray(shard_nodes(tmask[:, None], shards)[..., 0] > 0)
            & jnp.asarray(np.asarray(shards.node_mask)))

    single = DeeperGCN(cfg)
    p0, s0 = jax.jit(single.init)(jax.random.PRNGKey(args.seed))
    p_tp, s_tp = shard_deeper_params(
        jax.tree_util.tree_map(np.asarray, p0),
        jax.tree_util.tree_map(np.asarray, s0), T, cfg)
    params = jax.tree_util.tree_map(jnp.asarray, p_tp)
    state = jax.tree_util.tree_map(jnp.asarray, s_tp)
    model = SpatialTPDeeperGCN(cfg, exchange=getattr(args, "exchange", "auto"))
    tx = make_optimizer(args)
    opt_state = tx.init(params)

    def loss_fn(logits, lab, m):
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, lab[:, None].astype(jnp.int32),
                                   1)[:, 0]
        m = m.astype(nll.dtype)
        return jnp.sum(nll * m), jnp.sum(m)

    step = spatial_tp_train_step(model, tx, loss_fn, mesh)
    fwd = spatial_tp_forward(model, mesh)
    sh_dev = jax.device_put(shards)
    timer = EpochTimer()
    key = jax.random.PRNGKey(args.seed + 1)
    best_valid = -1.0
    eval_every = getattr(args, "eval_every", 5)
    for epoch in range(args.epochs):
        key, sub = jax.random.split(key)
        params, state, opt_state, loss = step(params, state, opt_state, xs,
                                              sh_dev, lab_sh, m_sh, sub)
        if epoch % eval_every == 0 or epoch == args.epochs - 1:
            logits = np.asarray(fwd(params, state, xs, sh_dev))
            pred = logits.reshape(-1, logits.shape[-1])[:n].argmax(-1)
            accs = {k: accuracy(pred[np.asarray(v)], lab_np[np.asarray(v)])
                    for k, v in splits.items()}
            logger.info("epoch %d loss %.4f train %.4f valid %.4f test %.4f "
                        "(%.2fs)", epoch, float(loss), accs["train"],
                        accs["valid"], accs["test"], timer.lap())
            scalars.log(epoch, loss=float(loss),
                        **{f"acc_{k}": v for k, v in accs.items()})
            if accs["valid"] > best_valid:
                best_valid = accs["valid"]
                if getattr(args, "save_ckpt", False):
                    from deep_gcns_torch_tpu.parallel import \
                        unshard_deeper_params

                    pu, su = unshard_deeper_params(
                        jax.tree_util.tree_map(np.asarray, params),
                        jax.tree_util.tree_map(np.asarray, state))
                    save_ckpt(os.path.join(exp, "ckpt"), params=pu, state=su,
                              epoch=epoch, best_value=best_valid)
                    save_best(os.path.join(exp, "ckpt"), True)
    logger.info("best valid acc %.4f; mean epoch %.2fs", best_valid,
                timer.mean())
    return best_valid
