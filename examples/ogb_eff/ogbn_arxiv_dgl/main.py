"""RevGAT on ogbn-arxiv — label reuse, iterative label refinement, self-KD.

Rebuild of `examples/ogb_eff/ogbn_arxiv_dgl/main.py` (teacher 0.7402 ± 0.0018,
student+KD 0.7426 ± 0.0017 acc): label-reuse input features (`main.py:136-161`),
n_label_iters refinement, RMSprop + linear lr warmup ≤50 epochs (`:119-122, 231`),
teacher→student self-knowledge-distillation (`:164-173`, `loss.py:20-26`).
Run: python examples/ogb_eff/ogbn_arxiv_dgl/main.py --synthetic --epochs 20
     (then --mode student --teacher_ckpt <exp>/ckpt to distill)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from common import select_platform, EpochTimer, base_parser, setup_experiment  # noqa: E402


def get_args():
    p = base_parser("RevGAT on ogbn-arxiv with label reuse + self-KD (TPU)")
    p.add_argument("--n_layers", type=int, default=5)
    p.add_argument("--n_hidden", type=int, default=256)
    p.add_argument("--n_heads", type=int, default=3)
    p.add_argument("--group", type=int, default=2)
    p.add_argument("--input_drop", type=float, default=0.25)
    p.add_argument("--edge_drop", type=float, default=0.3)
    p.add_argument("--use_attn_dst", action="store_true", default=False)
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="bfloat16 halves the fused attention kernels' HBM traffic")
    p.add_argument("--gat_stabilizer", type=str, default="auto",
                   choices=["auto", "per_receiver"],
                   help="softmax stabilizer for the band GAT route: "
                        "'per_receiver' is exact on wide score spreads "
                        "(sym-norm depth on extreme hubs) at ~1.8x step "
                        "time — see convs/dgl_gat.SymGATConv.stabilizer")
    p.add_argument("--no_norm_adj", action="store_true",
                   help="disable symmetric norm")
    p.add_argument("--use_labels", action="store_true", default=True)
    p.add_argument("--n_label_iters", type=int, default=1)
    p.add_argument("--mask_rate", type=float, default=0.5)
    p.add_argument("--num_classes", type=int, default=40)
    p.add_argument("--warmup_epochs", type=int, default=50)
    p.add_argument("--mode", type=str, default="teacher",
                   choices=["teacher", "student"])
    p.add_argument("--teacher_ckpt", type=str, default="")
    p.add_argument("--reorder", type=str, default="none",
                   choices=["none", "rcm", "cluster"],
                   help="locality pass (data/reorder.py) before --band")
    p.add_argument("--band", type=str, default="off", choices=["off", "auto"],
                   help="attach the band-dense adjacency: gather-free GAT "
                        "attention (sender-only scores are node-factored; "
                        "edge-drop rides the hash DropSpec)")
    p.add_argument("--band_hubs", type=str, default="auto",
                   choices=["auto", "off"],
                   help="hub extraction for the band; 'off' builds a hub-free "
                        "band — required for the dense in-window route that "
                        "serves --use_attn_dst scores")
    p.add_argument("--alpha", type=float, default=0.95)
    p.add_argument("--temp", type=float, default=0.7)
    p.set_defaults(epochs=2000, lr=0.002, dropout=0.75)
    return p.parse_args()


def main():
    args = get_args()
    import jax

    select_platform(args)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from deep_gcns_torch_tpu.graph import add_self_loops, build_graph, to_undirected
    from deep_gcns_torch_tpu.models.rev_gat import RevGAT, RevGATConfig
    from deep_gcns_torch_tpu.utils.ckpt import load_ckpt, save_ckpt
    from deep_gcns_torch_tpu.utils.loss import cross_entropy, kd_loss
    from deep_gcns_torch_tpu.utils.metrics import accuracy

    exp, logger, scalars = setup_experiment(args, f"revgat_{args.mode}")
    rng = np.random.default_rng(args.seed)

    if args.synthetic:
        from deep_gcns_torch_tpu.data.synthetic import sbm_arxiv_like

        n = args.synthetic_nodes
        g, labels = sbm_arxiv_like(rng, n=n, num_classes=args.num_classes, c=128,
                                   avg_degree=12)
        in_feats = 128
        perm = rng.permutation(n)
        splits = {"train": perm[: int(0.6 * n)],
                  "valid": perm[int(0.6 * n): int(0.8 * n)],
                  "test": perm[int(0.8 * n):]}
    else:
        from deep_gcns_torch_tpu.data.ogb import load_ogb_node

        ds = load_ogb_node("ogbn-arxiv", args.data_root)
        s, r = to_undirected(ds.senders, ds.receivers)
        s, r = add_self_loops(s, r, ds.x.shape[0])
        g = build_graph(ds.x, s, r)
        labels, splits, in_feats = ds.labels, ds.splits, ds.x.shape[1]
        n = ds.x.shape[0]

    from common import reorder_and_band

    g, labels, splits = reorder_and_band(args, g, labels, splits, rng)

    K = args.num_classes
    g = jax.device_put(g)
    n_pad = g.num_nodes_padded
    lab_full = jnp.asarray(np.pad(np.asarray(labels), (0, n_pad - n)))
    x_base = jnp.asarray(np.asarray(g.x))
    onehot = jax.nn.one_hot(lab_full, K)

    cfg = RevGATConfig(
        in_feats=in_feats + (K if args.use_labels else 0), n_classes=K,
        n_hidden=args.n_hidden, n_layers=args.n_layers, n_heads=args.n_heads,
        group=args.group, dropout=args.dropout, input_drop=args.input_drop,
        edge_drop=args.edge_drop, use_attn_dst=args.use_attn_dst,
        use_symmetric_norm=not args.no_norm_adj,
        compute_dtype=getattr(args, "compute_dtype", "float32"),
        stabilizer=getattr(args, "gat_stabilizer", "auto"))
    model = RevGAT(cfg)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(args.seed))

    teacher_params = None
    if args.mode == "student":
        assert args.teacher_ckpt, "--teacher_ckpt required in student mode"
        teacher_params, _, _, _ = load_ckpt(args.teacher_ckpt, params_like=params)

    # torch-exact RMSprop (alpha=0.99, eps outside sqrt — utils/optim.py) +
    # linear warmup (`main.py:119-122, 231`)
    from deep_gcns_torch_tpu.utils.optim import rmsprop

    sched = optax.linear_schedule(args.lr / 50, args.lr, args.warmup_epochs)
    tx = rmsprop(sched)
    opt_state = tx.init(params)

    def make_feat(label_mask):
        if not args.use_labels:
            return x_base
        lab_feat = jnp.where(label_mask[:, None], onehot, 0.0)
        return jnp.concatenate([x_base, lab_feat], axis=1)

    @jax.jit
    def train_step(params, state, opt_state, label_mask, sup_mask, key,
                   teacher_logits):
        feat = make_feat(label_mask)

        def loss_fn(p):
            logits, s2 = model.apply(p, state, feat, g, train=True, rng=key)
            loss = cross_entropy(logits, lab_full, mask=sup_mask)
            if teacher_logits is not None:
                loss = (args.alpha * kd_loss(logits, teacher_logits, args.temp,
                                             mask=sup_mask)
                        + (1 - args.alpha) * loss)
            return loss, s2

        (loss, s2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), s2, opt2, loss

    @jax.jit
    def predict(params, state, label_mask):
        logits, _ = model.apply(params, state, make_feat(label_mask), g,
                                train=False)
        # n_label_iters refinement (`main.py:151-161`): feed argmax predictions of
        # unlabeled nodes back into the label channel
        if args.use_labels:
            for _ in range(args.n_label_iters):
                soft = jax.nn.one_hot(jnp.argmax(logits, -1), K)
                lab_feat = jnp.where(label_mask[:, None], onehot, soft)
                feat = jnp.concatenate([x_base, lab_feat], axis=1)
                logits, _ = model.apply(params, state, feat, g, train=False)
        return logits

    train_idx = np.asarray(splits["train"])
    train_mask_np = np.zeros(n_pad, bool)
    train_mask_np[train_idx] = True
    eval_label_mask = jnp.asarray(train_mask_np)

    teacher_logits_eval = None
    if teacher_params is not None:
        teacher_logits_eval = predict(teacher_params, state, eval_label_mask)

    timer = EpochTimer()
    key = jax.random.PRNGKey(args.seed + 1)
    best_valid = best_test = 0.0
    for epoch in range(args.epochs):
        # per-epoch label/supervision split (`main.py:136-143` mask_rate)
        sel = rng.random(len(train_idx)) < args.mask_rate
        label_nodes = train_idx[sel]
        sup_nodes = train_idx[~sel]
        lm = np.zeros(n_pad, bool)
        lm[label_nodes] = True
        sm = np.zeros(n_pad, bool)
        sm[sup_nodes] = True
        key, sub = jax.random.split(key)
        params, state, opt_state, loss = train_step(
            params, state, opt_state, jnp.asarray(lm), jnp.asarray(sm), sub,
            teacher_logits_eval)
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            pred = np.asarray(jnp.argmax(predict(params, state, eval_label_mask),
                                         -1))
            accs = {k: accuracy(pred[np.asarray(v)], np.asarray(labels)[np.asarray(v)])
                    for k, v in splits.items()}
            if accs["valid"] > best_valid:
                best_valid, best_test = accs["valid"], accs["test"]
                if args.save_ckpt or args.mode == "teacher":
                    save_ckpt(os.path.join(exp, "ckpt"), params=params,
                              epoch=epoch, best_value=best_valid)
            logger.info("epoch %d loss %.4f valid %.4f test %.4f (%.1fs)", epoch,
                        float(loss), accs["valid"], accs["test"], timer.lap())
            scalars.log(epoch, loss=float(loss), **{f"acc_{k}": v
                                                    for k, v in accs.items()})
    logger.info("best valid %.4f (test %.4f); ckpt in %s", best_valid, best_test,
                exp)
    return best_valid


if __name__ == "__main__":
    main()
