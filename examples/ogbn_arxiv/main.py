"""DeeperGCN on ogbn-arxiv — full-batch node classification.

TPU-native rebuild of `examples/ogb/ogbn_arxiv/main.py` (headline: ResGEN-28, res+,
softmax_sg t=0.1, self-loops → 0.7192 ± 0.0016 acc, `examples/ogb/README.md:34`).
Run: python examples/ogbn_arxiv/main.py --synthetic --epochs 50
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from spatial_common import run_spatial, run_spatial_tp  # noqa: E402
from common import (  # noqa: E402
    EpochTimer, add_deeper_gcn_flags, add_spatial_flags, apply_spatial_env,
    base_parser, make_optimizer, select_platform, setup_experiment)


def get_args():
    p = base_parser("DeeperGCN on ogbn-arxiv (TPU)")
    add_deeper_gcn_flags(p, num_layers=28, hidden=128, norm="batch", t=0.1,
                         aggr="softmax_sg")
    p.add_argument("--self_loop", action="store_true", default=True)
    p.add_argument("--num_classes", type=int, default=40)
    p.add_argument("--reorder", type=str, default="none",
                   choices=["none", "rcm", "cluster"],
                   help="host locality reordering (data/reorder.py) before "
                        "building the graph — enables the gather-free band "
                        "aggregation (3.2x step at bench shape, ROOFLINE.md)")
    p.add_argument("--band", type=str, default="off",
                   choices=["off", "auto"],
                   help="attach the band-dense adjacency (ops/band.py); "
                        "combine with --reorder cluster on real graphs")
    add_spatial_flags(p)
    p.set_defaults(epochs=500, lr=0.01, dropout=0.5)
    return apply_spatial_env(p.parse_args())


def _reorder(args, rng, s, r, n, x_np, labels, splits):
    """Apply the selected locality pass; node-indexed arrays and split index
    sets are relabeled consistently (metrics are permutation-invariant)."""
    import numpy as np

    if args.reorder == "none":
        return s, r, x_np, labels, splits
    from deep_gcns_torch_tpu.data.reorder import (cluster_order,
                                                  invert_permutation,
                                                  permute_graph, rcm_order)

    if args.reorder == "rcm":
        perm = rcm_order(s, r, n)
    else:
        perm = cluster_order(s, r, n, cluster_size=4096)
    s, r, x_np, labels = permute_graph(perm, s, r, x_np, np.asarray(labels))
    inv = invert_permutation(np.asarray(perm))
    splits = {k: inv[np.asarray(v)] for k, v in splits.items()}
    return s, r, x_np, labels, splits


def _maybe_band(args, g):
    if args.band == "off":
        return g
    from deep_gcns_torch_tpu.graph import attach_band

    g = attach_band(g)
    import logging

    logging.getLogger("deep_gcns_torch_tpu").info(
        "band attached: window=%d coverage=%.3f (bwd %.3f)",
        g.band.fwd.window, g.band.fwd.coverage, g.band.bwd.coverage)
    return g


def main():
    args = get_args()
    import jax

    select_platform(args)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from deep_gcns_torch_tpu.graph import add_self_loops, build_graph, to_undirected
    from deep_gcns_torch_tpu.models import DeeperGCN
    from deep_gcns_torch_tpu.utils.ckpt import load_ckpt, save_best, save_ckpt
    from deep_gcns_torch_tpu.utils.loss import cross_entropy
    from deep_gcns_torch_tpu.utils.metrics import accuracy

    exp, logger, scalars = setup_experiment(args, "ogbn_arxiv")
    rng = np.random.default_rng(args.seed)

    if args.synthetic:
        from deep_gcns_torch_tpu.data.synthetic import sbm_arxiv_like

        n = args.synthetic_nodes
        g, labels = sbm_arxiv_like(rng, n=n, num_classes=args.num_classes, c=128,
                                   avg_degree=12)
        perm = rng.permutation(n)
        splits = {"train": perm[: int(0.6 * n)],
                  "valid": perm[int(0.6 * n): int(0.8 * n)],
                  "test": perm[int(0.8 * n):]}
        in_dim = 128
        if (args.reorder != "none" or args.band != "off"
                or args.spatial > 1 or args.tp > 1):
            # rebuild through the same reorder/band pipeline as real data
            n_edge = int(g.n_edge)
            s = np.asarray(g.senders)[:n_edge]
            r = np.asarray(g.receivers)[:n_edge]
            x_np = np.asarray(g.x)[:n]
            s, r, x_np, labels, splits = _reorder(args, rng, s, r, n, x_np,
                                                  labels, splits)
            if args.tp > 1:
                return run_spatial_tp(args, exp, logger, scalars, s, r, x_np,
                                      labels, splits, in_dim, n)
            if args.spatial > 1:
                return run_spatial(args, exp, logger, scalars, s, r, x_np,
                                   labels, splits, in_dim, n)
            g = build_graph(x_np, s, r, num_nodes=n)
            g = _maybe_band(args, g)
    else:
        from deep_gcns_torch_tpu.data.ogb import load_ogb_node

        ds = load_ogb_node("ogbn-arxiv", args.data_root)
        s, r = to_undirected(ds.senders, ds.receivers)  # main.py:61-75
        if args.self_loop:
            s, r = add_self_loops(s, r, ds.x.shape[0])
        n0 = ds.x.shape[0]
        labels, splits = ds.labels, ds.splits
        x_np = ds.x
        s, r, x_np, labels, splits = _reorder(args, rng, s, r, n0, x_np,
                                              labels, splits)
        in_dim = ds.x.shape[1]
        if args.tp > 1:
            return run_spatial_tp(args, exp, logger, scalars, s, r, x_np,
                                  labels, splits, in_dim, n0)
        if args.spatial > 1:
            return run_spatial(args, exp, logger, scalars, s, r, x_np, labels,
                               splits, in_dim, n0)
        g = build_graph(x_np, s, r, num_nodes=n0)
        g = _maybe_band(args, g)

    n = int(g.n_node)
    band = g.band
    g = jax.device_put(g.replace(band=None))
    band = jax.device_put(band) if band is not None else None
    lab = jnp.asarray(np.pad(np.asarray(labels), (0, g.num_nodes_padded - n)))

    def split_mask(idx):
        m = np.zeros(g.num_nodes_padded, bool)
        m[idx] = True
        return jnp.asarray(m)

    masks = {k: split_mask(v) for k, v in splits.items()}

    from spatial_common import deeper_gcn_config
    model = DeeperGCN(deeper_gcn_config(args, in_dim))
    params, state = jax.jit(model.init)(jax.random.PRNGKey(args.seed))
    tx = make_optimizer(args)
    opt_state = tx.init(params)
    start_epoch, best_valid = 0, -1.0

    ckpt_path = os.path.join(exp, "ckpt")
    if args.pretrained_model:
        params, state, opt_state, meta = load_ckpt(
            args.pretrained_model, params_like=params, state_like=state,
            opt_like=opt_state)
        start_epoch = meta.get("epoch", 0)
        best_valid = meta.get("best_value", -1.0)
        logger.info("resumed from %s at epoch %d", args.pretrained_model, start_epoch)

    # the graph is closed over (jit constants: ~4x faster gathers, see
    # ROOFLINE.md) except the band adjacency, which is too large to embed in a
    # remote-compile request and layout-neutral as an argument.
    @jax.jit
    def train_step(params, state, opt_state, band, key):
        gg = g.replace(band=band)

        def loss_fn(p):
            logits, s2 = model.apply(p, state, gg.x, gg, train=True, rng=key)
            return cross_entropy(logits, lab, mask=masks["train"]), s2

        (loss, s2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), s2, opt2, loss

    @jax.jit
    def predict(params, state, band):
        gg = g.replace(band=band)
        logits, _ = model.apply(params, state, gg.x, gg, train=False)
        return jnp.argmax(logits, -1)

    timer = EpochTimer()
    key = jax.random.PRNGKey(args.seed + 1)
    for epoch in range(start_epoch, args.epochs):
        key, sub = jax.random.split(key)
        params, state, opt_state, loss = train_step(params, state, opt_state,
                                                    band, sub)
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            pred = np.asarray(predict(params, state, band))
            accs = {k: accuracy(pred[np.asarray(splits[k])],
                                np.asarray(labels)[np.asarray(splits[k])])
                    for k in splits}
            logger.info("epoch %d loss %.4f train %.4f valid %.4f test %.4f (%.2fs)",
                        epoch, float(loss), accs["train"], accs["valid"],
                        accs["test"], timer.lap())
            scalars.log(epoch, loss=float(loss), **{f"acc_{k}": v
                                                    for k, v in accs.items()})
            if accs["valid"] > best_valid:
                best_valid = accs["valid"]
                if args.save_ckpt:
                    save_ckpt(ckpt_path, params=params, state=state,
                              opt_state=opt_state, epoch=epoch,
                              best_value=best_valid)
                    save_best(ckpt_path, True)
    logger.info("best valid acc %.4f; mean epoch %.2fs", best_valid, timer.mean())
    return best_valid


if __name__ == "__main__":
    main()
