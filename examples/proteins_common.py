"""Shared ogbn-proteins training machinery (used by the DeeperGCN app and the
reversible RevGCN app): species one-hot + edge-aggregated node features, per-epoch
random partition cluster training, multi-partition averaged evaluation with ROC-AUC
(`examples/ogb/ogbn_proteins/main.py`, `examples/ogb_eff/ogbn_proteins/main.py`)."""

from __future__ import annotations

import os

import numpy as np


def load_proteins(args, rng):
    """Returns dict with senders, receivers, edge_attr [E,8], species [N,8],
    node_feats [N,8], labels [N,112], splits."""
    if args.synthetic:
        n = args.synthetic_nodes
        deg = getattr(args, "synthetic_degree", 30)
        e = n * deg
        senders = rng.integers(0, n, e)
        receivers = rng.integers(0, n, e)
        edge_attr = rng.random((e, 8)).astype(np.float32)
        species = np.eye(8, dtype=np.float32)[rng.integers(0, 8, n)]
        # learnable signal: labels correlate with aggregated edge features
        from deep_gcns_torch_tpu.data.ogb import extract_node_features_from_edges

        node_feats = extract_node_features_from_edges(senders, receivers, edge_attr, n)
        w = rng.standard_normal((8, 112)).astype(np.float32)
        logits = (node_feats - node_feats.mean(0)) @ w
        labels = (logits > 0).astype(np.float32)
        perm = rng.permutation(n)
        splits = {"train": perm[: int(0.65 * n)],
                  "valid": perm[int(0.65 * n): int(0.8 * n)],
                  "test": perm[int(0.8 * n):]}
    else:
        from deep_gcns_torch_tpu.data.ogb import (extract_node_features_from_edges,
                                                  load_ogb_node)

        ds = load_ogb_node("ogbn-proteins", args.data_root)
        senders, receivers, edge_attr = ds.senders, ds.receivers, ds.edge_attr
        n = ds.labels.shape[0]
        species = ds.x  # one-hot species (`dataset.py:53-66`)
        node_feats = extract_node_features_from_edges(senders, receivers,
                                                      edge_attr, n)
        labels = ds.labels.astype(np.float32)
        splits = ds.splits
    return dict(senders=senders, receivers=receivers, edge_attr=edge_attr,
                species=species, node_feats=node_feats, labels=labels,
                splits=splits, num_nodes=len(species))


def run_proteins(args, model_builder, name: str):
    """Generic partition-train / multi-eval loop.

    model_builder(in_args, data) -> (model, init_fn_extra_kwargs) where the model
    follows the framework Module protocol and takes (x=species, node_feats=...,
    g) inputs."""
    import jax

    from common import select_platform, EpochTimer, setup_experiment, make_optimizer

    select_platform(args)
    import jax.numpy as jnp
    import optax
    from deep_gcns_torch_tpu.data.partition import (generate_sub_graphs,
                                                    locality_partition_graph,
                                                    random_partition_graph,
                                                    scatter_predictions)
    from deep_gcns_torch_tpu.utils.loss import bce_with_logits
    from deep_gcns_torch_tpu.utils.metrics import roc_auc

    exp, logger, scalars = setup_experiment(args, name)
    rng = np.random.default_rng(args.seed)
    data = load_proteins(args, rng)
    n = data["num_nodes"]
    labels = data["labels"]

    if getattr(args, "spatial", 1) > 1:
        return run_proteins_spatial(args, model_builder, data, exp, logger,
                                    scalars)

    model = model_builder(args, data)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(args.seed))
    tx = optax.chain(optax.clip_by_global_norm(1.0), make_optimizer(args))
    opt_state = tx.init(params)

    # fixed padded bucket across clusters/epochs → one compiled program
    # (sized for the COARSEST partition used: eval may use fewer, larger clusters)
    min_parts = min(args.cluster_number, args.eval_parts)
    node_pad = ((n // min_parts + 1023) // 256 + 1) * 256
    edge_pad = None  # computed on first partition, then reused

    @jax.jit
    def train_step(params, state, opt_state, g, species, nf, lab, lmask, key):
        def loss_fn(p):
            logits, s2 = model.apply(p, state, species, g, node_feats=nf,
                                     train=True, rng=key)
            return bce_with_logits(logits, lab, mask=lmask), s2

        (loss, s2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), s2, opt2, loss

    @jax.jit
    def predict(params, state, g, species, nf):
        logits, _ = model.apply(params, state, species, g, node_feats=nf,
                                train=False)
        return logits

    train_mask_full = np.zeros(n, bool)
    train_mask_full[data["splits"]["train"]] = True

    def make_clusters(parts, ncl):
        nonlocal edge_pad
        # sticky growing edge bucket: stable compiled shapes, rare regrowth
        counts = np.bincount(parts[data["senders"]][
            parts[data["senders"]] == parts[data["receivers"]]], minlength=ncl)
        needed = int(counts.max()) if counts.size else 1
        if edge_pad is None or needed > edge_pad:
            edge_pad = ((int(needed * 1.2) + 511) // 512) * 512
        graphs, node_lists, feats = generate_sub_graphs(
            data["senders"], data["receivers"], parts, ncl,
            edge_attr=data["edge_attr"],
            node_feats=[data["species"], data["node_feats"], labels,
                        train_mask_full.astype(np.float32)[:, None]],
            node_pad=node_pad, edge_pad=edge_pad)
        return graphs, node_lists, feats

    def evaluate(params, state, num_parts, num_evals):
        """Averaged multi-partition eval (`ogb_eff/ogbn_proteins/main.py:158-173`)."""
        pred_sum = np.zeros((n, labels.shape[1]), np.float32)
        for e in range(num_evals):
            parts = random_partition_graph(np.random.default_rng(1000 + e), n,
                                           num_parts)
            graphs, node_lists, feats = make_clusters(parts, num_parts)
            preds = []
            for g, f in zip(graphs, feats):
                sp, nf = jnp.asarray(f[0]), jnp.asarray(f[1])
                preds.append(np.asarray(predict(params, state,
                                                jax.device_put(g), sp, nf)))
            pred_sum += scatter_predictions(preds, node_lists, n)
        pred = pred_sum / num_evals
        return {k: roc_auc(pred[idx], labels[idx])
                for k, idx in data["splits"].items()}

    timer = EpochTimer()
    key = jax.random.PRNGKey(args.seed + 1)
    best_valid = -1.0
    results = {}
    ckpt = None
    if getattr(args, "save_ckpt", False):
        # async (orbax) checkpointing: serialization overlaps the next epoch's
        # train steps — the right default for multi-hour 1001-layer runs
        from deep_gcns_torch_tpu.utils.ckpt_async import AsyncCheckpointer
        ckpt = AsyncCheckpointer(os.path.join(exp, "ckpt"), max_to_keep=2)
    part_fn = random_partition_graph
    if getattr(args, "partition", "random") == "locality":
        # locality-aware clusters keep far more edges per epoch than the
        # reference's uniform-random partition (`utils/data_util.py:43-45`):
        # ~(k-1)/k of edges are dropped under random, a few % under locality
        def part_fn(r_, n_, k_):
            return locality_partition_graph(r_, data["senders"],
                                            data["receivers"], n_, k_)
    for epoch in range(args.epochs):
        parts = part_fn(rng, n, args.cluster_number)
        graphs, node_lists, feats = make_clusters(parts, args.cluster_number)
        order = rng.permutation(args.cluster_number)
        ep_loss = 0.0
        for ci in order:
            g, f = graphs[ci], feats[ci]
            sp, nf = jnp.asarray(f[0]), jnp.asarray(f[1])
            lab = jnp.asarray(f[2])
            lmask = jnp.asarray(f[3][:, 0] > 0) & g.node_mask
            key, sub = jax.random.split(key)
            params, state, opt_state, loss = train_step(
                params, state, opt_state, jax.device_put(g), sp, nf, lab, lmask, sub)
            ep_loss += float(loss)
        if epoch % args.eval_every == 0 or epoch == args.epochs - 1:
            results = evaluate(params, state, args.eval_parts, args.num_evals)
            if results["valid"] > best_valid:
                from deep_gcns_torch_tpu.utils.ckpt import save_ckpt
                save_ckpt(os.path.join(exp, "ckpt_best"), params=params,
                          state=state, epoch=epoch,
                          best_value=float(results["valid"]))
            logger.info("epoch %d loss %.4f train %.4f valid %.4f test %.4f (%.1fs)",
                        epoch, ep_loss / args.cluster_number, results["train"],
                        results["valid"], results["test"], timer.lap())
            scalars.log(epoch, loss=ep_loss / args.cluster_number,
                        **{f"auc_{k}": v for k, v in results.items()})
            best_valid = max(best_valid, results["valid"])
            if ckpt is not None:
                ckpt.save(epoch, params=params, state=state, opt_state=opt_state,
                          metrics={"valid": results["valid"]},
                          meta={"epoch": epoch, "best_valid": best_valid})
    if ckpt is not None:
        ckpt.wait()
    logger.info("best valid ROC-AUC %.4f; mean eval-epoch %.1fs", best_valid,
                timer.mean())
    return best_valid, results


def run_proteins_spatial(args, model_builder, data, exp, logger, scalars):
    """Full-graph spatial training (--spatial N): the graph's edges partition
    over an N-device mesh with halo exchange (parallel/spatial.py) — EXACT
    full-batch training and eval, where the reference (and the cluster loop
    above) train on lossy random subgraphs and average noisy partition evals
    (`examples/ogb_eff/ogbn_proteins/main.py:158-173`).  Works for both the
    DeeperGCN (DyResGEN) and reversible (RevGCN) proteins models; one 'epoch'
    is one full-graph step."""
    import jax
    import jax.numpy as jnp
    import optax

    from common import EpochTimer, make_optimizer
    from deep_gcns_torch_tpu.models.rev_gcn import RevGCN
    from deep_gcns_torch_tpu.parallel.mesh import make_mesh
    from deep_gcns_torch_tpu.parallel.spatial import (
        SpatialDeeperGCN, shard_graph, shard_nodes, spatial_forward,
        spatial_train_step)
    from deep_gcns_torch_tpu.parallel.spatial_rev import (
        SpatialRevGCN, spatial_rev_forward, spatial_rev_train_step)
    from deep_gcns_torch_tpu.utils.ckpt import save_best, save_ckpt
    from deep_gcns_torch_tpu.utils.metrics import roc_auc

    n = data["num_nodes"]
    labels = data["labels"]
    num_tasks = labels.shape[1]
    D = args.spatial
    devs = jax.devices()
    assert len(devs) >= D, (
        f"--spatial {D} needs {D} devices, found {len(devs)} "
        f"({devs[0].platform}); on CPU use --platform cpu (virtual devices)")
    mesh = make_mesh(("gp",), devices=devs[:D])
    exchange = getattr(args, "exchange", "auto")

    inner = model_builder(args, data)
    rev = isinstance(inner, RevGCN)
    model = (SpatialRevGCN(inner.cfg, exchange=exchange) if rev
             else SpatialDeeperGCN(inner.cfg, exchange=exchange))

    shards = shard_graph(data["senders"], data["receivers"], n, D,
                         edge_attr=data["edge_attr"])
    logger.info("spatial: D=%d shard=%d halo_rows/dev/layer=%d model=%s", D,
                shards.shard_size, shards.halo_rows_per_device,
                "RevGCN" if rev else "DeeperGCN")
    xs = jnp.asarray(shard_nodes(data["species"], shards))
    nfs = jnp.asarray(shard_nodes(data["node_feats"], shards))
    lab_sh = jnp.asarray(shard_nodes(labels, shards))
    tmask = np.zeros(n, np.float32)
    tmask[np.asarray(data["splits"]["train"])] = 1.0
    m_sh = (jnp.asarray(shard_nodes(tmask[:, None], shards)[..., 0] > 0)
            & jnp.asarray(np.asarray(shards.node_mask)))

    params, state = jax.jit(model.init)(jax.random.PRNGKey(args.seed))
    tx = optax.chain(optax.clip_by_global_norm(1.0), make_optimizer(args))
    opt_state = tx.init(params)

    def loss_fn(logits, lab, m):
        # masked multi-task BCE, (sum, count) so the cross-shard mean is exact
        mf = m.astype(jnp.float32)
        per = optax.sigmoid_binary_cross_entropy(logits, lab)
        return jnp.sum(per * mf[:, None]), jnp.sum(mf) * num_tasks

    if rev:
        step = spatial_rev_train_step(model, tx, loss_fn, mesh)
        fwd = spatial_rev_forward(model, mesh)
    else:
        step = spatial_train_step(model, tx, loss_fn, mesh,
                                  with_node_feats=True)
        fwd = spatial_forward(model, mesh, with_node_feats=True)
    sh_dev = jax.device_put(shards)

    timer = EpochTimer()
    key = jax.random.PRNGKey(args.seed + 1)
    best_valid, results = -1.0, {}
    for epoch in range(args.epochs):
        key, sub = jax.random.split(key)
        if rev:
            params, opt_state, loss = step(params, opt_state, xs, nfs, sh_dev,
                                           lab_sh, m_sh, sub)
        else:
            params, state, opt_state, loss = step(params, state, opt_state, xs,
                                                  nfs, sh_dev, lab_sh, m_sh,
                                                  sub)
        if epoch % args.eval_every == 0 or epoch == args.epochs - 1:
            if rev:
                logits = np.asarray(fwd(params, xs, nfs, sh_dev))
            else:
                logits = np.asarray(fwd(params, state, xs, nfs, sh_dev))
            # contiguous ownership: device d holds global rows [d·S, (d+1)·S)
            pred = logits.reshape(-1, num_tasks)[:n]
            results = {k: roc_auc(pred[idx], labels[idx])
                       for k, idx in data["splits"].items()}
            logger.info("epoch %d loss %.4f train %.4f valid %.4f test %.4f "
                        "(%.1fs)", epoch, float(loss), results["train"],
                        results["valid"], results["test"], timer.lap())
            scalars.log(epoch, loss=float(loss),
                        **{f"auc_{k}": v for k, v in results.items()})
            if results["valid"] > best_valid:
                best_valid = results["valid"]
                save_ckpt(os.path.join(exp, "ckpt_best"), params=params,
                          state=state, epoch=epoch, best_value=best_valid)
                save_best(os.path.join(exp, "ckpt_best"), True)
    logger.info("best valid ROC-AUC %.4f; mean eval-epoch %.1fs", best_valid,
                timer.mean())
    return best_valid, results
