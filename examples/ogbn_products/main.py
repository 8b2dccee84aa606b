"""DeeperGCN on ogbn-products — partitioned training, full-graph eval.

Rebuild of `examples/ogb/ogbn_products/main.py` (ResGEN-14 softmax_sg t=0.1 →
0.8098 ± 0.0020 acc, `examples/ogb/README.md:32`): random-partition cluster training
(`main.py:87-124`); the reference evaluates full-batch on CPU (`main.py:19-23`) —
here a partitioned eval with prediction reassembly replaces that workaround.
Run: python examples/ogbn_products/main.py --synthetic --epochs 10
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import (select_platform, EpochTimer, add_deeper_gcn_flags,  # noqa: E402
                    add_spatial_flags, apply_spatial_env, base_parser,
                    make_optimizer, setup_experiment)


def get_args(argv=None):
    p = base_parser("DeeperGCN on ogbn-products (TPU)")
    add_deeper_gcn_flags(p, num_layers=14, hidden=128, norm="batch", t=0.1,
                         aggr="softmax_sg")
    p.add_argument("--num_classes", type=int, default=47)
    p.add_argument("--cluster_number", type=int, default=10)
    p.add_argument("--eval_cluster_number", type=int, default=5)
    p.add_argument("--eval_every", type=int, default=5)
    add_spatial_flags(p)
    p.set_defaults(epochs=500, lr=0.001, dropout=0.5)
    return apply_spatial_env(p.parse_args(argv))


def load_data(args, rng):
    """(x, senders, receivers, labels, splits, in_dim, n)."""
    import numpy as np

    if args.synthetic:
        from deep_gcns_torch_tpu.data.synthetic import sbm_arxiv_like

        n = args.synthetic_nodes
        g_full, labels = sbm_arxiv_like(rng, n=n, num_classes=args.num_classes,
                                        c=100, avg_degree=10)
        em = np.asarray(g_full.edge_mask)
        senders = np.asarray(g_full.senders)[em]
        receivers = np.asarray(g_full.receivers)[em]
        x = np.asarray(g_full.x)[:n]
        perm = rng.permutation(n)
        splits = {"train": perm[: int(0.1 * n)],
                  "valid": perm[int(0.1 * n): int(0.2 * n)],
                  "test": perm[int(0.2 * n):]}
        return x, senders, receivers, np.asarray(labels), splits, 100, n
    from deep_gcns_torch_tpu.data.ogb import load_ogb_node

    ds = load_ogb_node("ogbn-products", args.data_root)
    return (ds.x, ds.senders, ds.receivers, ds.labels, ds.splits,
            ds.x.shape[1], len(ds.x))


def build_model(args, in_dim):
    from deep_gcns_torch_tpu.models import DeeperGCN, DeeperGCNConfig

    return DeeperGCN(DeeperGCNConfig(
        in_channels=in_dim, hidden_channels=args.hidden_channels,
        num_tasks=args.num_classes, num_layers=args.num_layers, block=args.block,
        aggr=args.gcn_aggr, t=args.t, learn_t=args.learn_t, norm=args.norm,
        mlp_layers=args.mlp_layers, dropout=args.dropout))


def eval_partitioned(args, predict, params, state, x, senders, receivers, n,
                     lab_onecol, train_mask_full, seed=777):
    """Fixed-partition eval: per-cluster forward + prediction reassembly
    (replaces the reference's full-batch-on-CPU eval, `main.py:19-23`)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deep_gcns_torch_tpu.data.partition import (generate_sub_graphs,
                                                    random_partition_graph,
                                                    scatter_predictions)

    ncl = args.eval_cluster_number
    node_pad = ((n // ncl + 1023) // 256 + 1) * 256
    parts = random_partition_graph(np.random.default_rng(seed), n, ncl)
    graphs, node_lists, feats = generate_sub_graphs(
        senders, receivers, parts, ncl,
        node_feats=[x, lab_onecol, train_mask_full.astype(np.float32)[:, None]],
        node_pad=node_pad)
    preds = [np.asarray(predict(params, state, jax.device_put(g),
                                jnp.asarray(f[0])))
             for g, f in zip(graphs, feats)]
    return scatter_predictions(preds, node_lists, n)


def main():
    args = get_args()
    import jax

    select_platform(args)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from deep_gcns_torch_tpu.data.partition import (generate_sub_graphs,
                                                    random_partition_graph)
    from deep_gcns_torch_tpu.utils.ckpt import save_ckpt
    from deep_gcns_torch_tpu.utils.loss import cross_entropy
    from deep_gcns_torch_tpu.utils.metrics import accuracy

    exp, logger, scalars = setup_experiment(args, "ogbn_products")
    rng = np.random.default_rng(args.seed)
    x, senders, receivers, labels, splits, in_dim, n = load_data(args, rng)

    if args.spatial > 1:
        # full-graph exact spatial training replaces the lossy cluster loop
        from spatial_common import run_spatial
        return run_spatial(args, exp, logger, scalars, senders, receivers, x,
                           labels, splits, in_dim, n)

    model = build_model(args, in_dim)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(args.seed))
    tx = make_optimizer(args)
    opt_state = tx.init(params)

    train_mask_full = np.zeros(n, bool)
    train_mask_full[splits["train"]] = True
    lab_onecol = np.asarray(labels).astype(np.int32)[:, None].astype(np.float32)
    node_pad = ((n // args.eval_cluster_number + 1023) // 256 + 1) * 256
    edge_pad = [None]

    def clusters(parts, ncl):
        same = parts[senders] == parts[receivers]
        counts = np.bincount(parts[senders][same], minlength=ncl)
        needed = int(counts.max()) if counts.size else 1
        if edge_pad[0] is None or needed > edge_pad[0]:
            edge_pad[0] = ((int(needed * 1.2) + 511) // 512) * 512
        return generate_sub_graphs(
            senders, receivers, parts, ncl,
            node_feats=[x, lab_onecol, train_mask_full.astype(np.float32)[:, None]],
            node_pad=node_pad, edge_pad=edge_pad[0])

    @jax.jit
    def train_step(params, state, opt_state, g, xx, lab, lmask, key):
        def loss_fn(p):
            logits, s2 = model.apply(p, state, xx, g, train=True, rng=key)
            return cross_entropy(logits, lab, mask=lmask), s2

        (loss, s2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), s2, opt2, loss

    @jax.jit
    def predict(params, state, g, xx):
        logits, _ = model.apply(params, state, xx, g, train=False)
        return logits

    timer = EpochTimer()
    key = jax.random.PRNGKey(args.seed + 1)
    best_valid = 0.0
    for epoch in range(args.epochs):
        parts = random_partition_graph(rng, n, args.cluster_number)
        graphs, node_lists, feats = clusters(parts, args.cluster_number)
        losses = []
        for ci in rng.permutation(args.cluster_number):
            g, f = graphs[ci], feats[ci]
            key, sub = jax.random.split(key)
            params, state, opt_state, loss = train_step(
                params, state, opt_state, jax.device_put(g), jnp.asarray(f[0]),
                jnp.asarray(f[1][:, 0].astype(np.int32)),
                jnp.asarray(f[2][:, 0] > 0) & g.node_mask, sub)
            losses.append(float(loss))
        if epoch % args.eval_every == 0 or epoch == args.epochs - 1:
            full = eval_partitioned(args, predict, params, state, x, senders,
                                    receivers, n, lab_onecol,
                                    train_mask_full).argmax(-1)
            accs = {k: accuracy(full[idx], np.asarray(labels)[idx])
                    for k, idx in splits.items()}
            if accs["valid"] > best_valid:
                best_valid = accs["valid"]
                save_ckpt(os.path.join(exp, "ckpt_best"), params=params,
                          state=state, epoch=epoch, best_value=best_valid)
            logger.info("epoch %d loss %.4f train %.4f valid %.4f test %.4f (%.1fs)",
                        epoch, float(np.mean(losses)), accs["train"],
                        accs["valid"], accs["test"], timer.lap())
            scalars.log(epoch, loss=float(np.mean(losses)),
                        **{f"acc_{k}": v for k, v in accs.items()})
    logger.info("best valid acc %.4f", best_valid)
    return best_valid


if __name__ == "__main__":
    main()
