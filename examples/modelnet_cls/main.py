"""DeepGCN classifier on ModelNet40.

Rebuild of `examples/modelnet_cls/main.py` (ResEdgeConv-14, SGD+cosine, smooth-CE,
OA + balanced-acc protocol; paper OA ≈ 93.6, `examples/modelnet_cls/README.md`).
Run: python examples/modelnet_cls/main.py --synthetic --epochs 5
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import select_platform, EpochTimer, base_parser, setup_experiment  # noqa: E402


def get_args(argv=None):
    p = base_parser("DeepGCN ModelNet40 classification (TPU)")
    p.add_argument("--phase", type=str, default="train",
                   choices=["train", "test"],
                   help="test = evaluate --pretrained_model once "
                        "(`examples/modelnet_cls/main.py:172-182`)")
    p.add_argument("--k", type=int, default=9)
    p.add_argument("--knn_method", type=str, default="exact",
                   choices=["exact", "approx"],
                   help="approx = TPU PartialReduce dilated kNN (ops/knn.py)")
    p.add_argument("--compute_dtype", type=str, default="",
                   help="e.g. bfloat16: bf16 conv compute, f32 accumulation")
    p.add_argument("--block", type=str, default="res")
    p.add_argument("--conv", type=str, default="edge")
    p.add_argument("--act", type=str, default="relu")
    p.add_argument("--norm", type=str, default="batch")
    p.add_argument("--n_blocks", type=int, default=14)
    p.add_argument("--n_filters", type=int, default=64)
    p.add_argument("--in_channels", type=int, default=3)
    p.add_argument("--n_classes", type=int, default=40)
    p.add_argument("--emb_dims", type=int, default=1024)
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--use_dilation", action="store_true", default=True)
    p.add_argument("--use_stochastic", action="store_true", default=True)
    p.add_argument("--epsilon", type=float, default=0.2)
    p.set_defaults(epochs=400, lr=0.1, dropout=0.5)
    return p.parse_args(argv)


def build_model(args):
    from deep_gcns_torch_tpu.models import DeepGCNCls, DeepGCNConfig

    return DeepGCNCls(DeepGCNConfig(
        in_channels=args.in_channels, n_classes=args.n_classes,
        n_filters=args.n_filters, n_blocks=args.n_blocks, conv=args.conv,
        act=args.act, norm=args.norm, block=args.block, dropout=args.dropout,
        k=args.k, knn_method=args.knn_method,
        compute_dtype=(args.compute_dtype or None),
        use_dilation=args.use_dilation, stochastic=args.use_stochastic,
        epsilon=args.epsilon, emb_dims=args.emb_dims))


def load_split(args, rng, split):
    from deep_gcns_torch_tpu.data import pointcloud as pc

    if args.synthetic:
        n = 256 if split == "train" else 64
        return pc.synthetic_modelnet(rng, n, args.num_points, args.n_classes)
    return pc.load_modelnet40(args.data_root, split, args.num_points)


def main(argv=None):
    args = get_args(argv)
    import jax

    select_platform(args)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from deep_gcns_torch_tpu.data import pointcloud as pc
    from deep_gcns_torch_tpu.utils.ckpt import load_ckpt, save_ckpt
    from deep_gcns_torch_tpu.utils.loss import smooth_cross_entropy
    from deep_gcns_torch_tpu.utils.metrics import accuracy, balanced_accuracy

    exp, logger, scalars = setup_experiment(args, "modelnet_cls")
    rng = np.random.default_rng(args.seed)

    if args.phase == "train":
        tr_x, tr_y = load_split(args, rng, "train")
    te_x, te_y = load_split(args, rng, "test")

    model = build_model(args)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(args.seed))
    start_epoch = 0
    # resume / pretrained load (`examples/modelnet_cls/main.py:172-174` via
    # `utils/ckpt_util.py:27-83`)
    if args.pretrained_model:
        params, state, _, meta = load_ckpt(args.pretrained_model,
                                           params_like=params, state_like=state)
        start_epoch = int(meta.get("epoch", -1)) + 1
        logger.info("loaded %s (epoch %s, best %.4f)", args.pretrained_model,
                    meta.get("epoch"), meta.get("best_value", float("nan")))

    if args.phase == "test":
        # checkpoint-eval phase (`examples/modelnet_cls/main.py:177-182`)
        @jax.jit
        def predict_t(params, state, x):
            logits, _ = model.apply(params, state, x, train=False)
            return jnp.argmax(logits, -1)

        preds, ys = [], []
        for x, y in pc.batch_iter(rng, te_x, te_y, args.batch_size,
                                  shuffle=False):
            preds.append(np.asarray(predict_t(params, state, jnp.asarray(x))))
            ys.append(y)
        pred, yy = np.concatenate(preds), np.concatenate(ys)
        oa, ba = accuracy(pred, yy), balanced_accuracy(pred, yy)
        logger.info("Test Overall Acc %.4f, Its test avg acc %.4f.", oa, ba)
        return oa
    steps_per_epoch = max(len(tr_x) // args.batch_size, 1)
    # SGD + cosine (`examples/modelnet_cls/main.py:21-27`)
    sched = optax.cosine_decay_schedule(args.lr, args.epochs * steps_per_epoch,
                                        alpha=0.001 / args.lr)
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(sched, momentum=0.9))
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, state, opt_state, x, y, key):
        def loss_fn(p):
            logits, s2 = model.apply(p, state, x, train=True, rng=key)
            return smooth_cross_entropy(logits, y, 0.2), s2

        (loss, s2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), s2, opt2, loss

    @jax.jit
    def predict(params, state, x):
        logits, _ = model.apply(params, state, x, train=False)
        return jnp.argmax(logits, -1)

    timer = EpochTimer()
    key = jax.random.PRNGKey(args.seed + 1)
    best_oa = 0.0
    for epoch in range(start_epoch, args.epochs):
        losses = []
        for x, y in pc.batch_iter(rng, tr_x, tr_y, args.batch_size, augment=True):
            key, sub = jax.random.split(key)
            params, state, opt_state, loss = train_step(
                params, state, opt_state, jnp.asarray(x), jnp.asarray(y), sub)
            losses.append(float(loss))
        preds, ys = [], []
        for x, y in pc.batch_iter(rng, te_x, te_y, args.batch_size, shuffle=False):
            preds.append(np.asarray(predict(params, state, jnp.asarray(x))))
            ys.append(y)
        pred = np.concatenate(preds)
        yy = np.concatenate(ys)
        oa, ba = accuracy(pred, yy), balanced_accuracy(pred, yy)
        if oa > best_oa:
            best_oa = oa
            save_ckpt(os.path.join(exp, "ckpt_best"), params=params, state=state,
                      epoch=epoch, best_value=best_oa)
        logger.info("epoch %d loss %.4f OA %.4f balanced %.4f (%.1fs)", epoch,
                    float(np.mean(losses)), oa, ba, timer.lap())
        scalars.log(epoch, loss=float(np.mean(losses)), oa=oa, balanced=ba)
    logger.info("best OA %.4f", best_oa)
    return best_oa


if __name__ == "__main__":
    main()
