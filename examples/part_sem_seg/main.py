"""DeepGCN on PartNet — part semantic segmentation (dense layout, per-category).

Rebuild of `examples/part_sem_seg/main.py` (log_softmax + NLL
`architecture.py:77`/`main.py:18`, GPU-side augmentation `main.py:81-82`,
part/shape mIoU protocol `main.py:102-148`).
Run: python examples/part_sem_seg/main.py --synthetic --epochs 5
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import select_platform, EpochTimer, base_parser, setup_experiment  # noqa: E402


def get_args():
    p = base_parser("DeepGCN PartNet part segmentation (TPU)")
    p.add_argument("--category", type=str, default="Bed")
    p.add_argument("--k", type=int, default=9)
    p.add_argument("--knn_method", type=str, default="exact",
                   choices=["exact", "approx"],
                   help="approx = TPU PartialReduce dilated kNN (ops/knn.py)")
    p.add_argument("--compute_dtype", type=str, default="",
                   help="e.g. bfloat16: bf16 conv compute, f32 accumulation")
    p.add_argument("--block", type=str, default="res")
    p.add_argument("--conv", type=str, default="edge")
    p.add_argument("--norm", type=str, default="batch")
    p.add_argument("--n_blocks", type=int, default=9)
    p.add_argument("--n_filters", type=int, default=64)
    p.add_argument("--in_channels", type=int, default=3)
    p.add_argument("--n_classes", type=int, default=10)
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--batch_size", type=int, default=8)
    p.set_defaults(epochs=200, lr=5e-3, dropout=0.3)
    return p.parse_args()


def main():
    args = get_args()
    import jax

    select_platform(args)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from deep_gcns_torch_tpu.data import pointcloud as pc
    from deep_gcns_torch_tpu.models import DeepGCNConfig, DenseDeepGCN
    from deep_gcns_torch_tpu.utils.loss import cross_entropy

    exp, logger, scalars = setup_experiment(args, "part_sem_seg")
    rng = np.random.default_rng(args.seed)

    if args.synthetic:
        def synth(nb):
            pts = rng.standard_normal((nb, args.num_points, 3)).astype(np.float32)
            # parts = angular sectors (learnable from geometry)
            ang = np.arctan2(pts[..., 1], pts[..., 0])
            lab = ((ang + np.pi) / (2 * np.pi) * args.n_classes).astype(np.int64)
            return pts, np.clip(lab, 0, args.n_classes - 1)

        tr_x, tr_y = synth(48)
        te_x, te_y = synth(16)
    else:
        raise FileNotFoundError("PartNet h5 data not available; pass --synthetic")

    model = DenseDeepGCN(DeepGCNConfig(
        in_channels=args.in_channels, n_classes=args.n_classes,
        n_filters=args.n_filters, n_blocks=args.n_blocks, conv=args.conv,
        norm=args.norm, block=args.block, dropout=args.dropout, k=args.k, knn_method=args.knn_method,
        compute_dtype=(args.compute_dtype or None)))
    params, state = jax.jit(model.init)(jax.random.PRNGKey(args.seed))
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, state, opt_state, x, y, key):
        def loss_fn(p):
            logits, s2 = model.apply(p, state, x, train=True, rng=key)
            return cross_entropy(logits.reshape(-1, args.n_classes),
                                 y.reshape(-1)), s2

        (loss, s2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), s2, opt2, loss

    @jax.jit
    def predict(params, state, x):
        logits, _ = model.apply(params, state, x, train=False)
        return jnp.argmax(logits, -1)

    def part_shape_miou(pred, label):
        """per-shape mIoU over present parts, averaged (`main.py:102-148`)."""
        mious = []
        for p, l in zip(pred, label):
            ious = []
            for c in np.unique(l):
                inter = np.logical_and(p == c, l == c).sum()
                union = np.logical_or(p == c, l == c).sum()
                if union:
                    ious.append(inter / union)
            mious.append(np.mean(ious) if ious else 0.0)
        return float(np.mean(mious))

    timer = EpochTimer()
    key = jax.random.PRNGKey(args.seed + 1)
    best = 0.0
    for epoch in range(args.epochs):
        losses = []
        for x, y in pc.batch_iter(rng, tr_x, tr_y, args.batch_size, augment=True):
            x = pc.rotate_point_cloud(rng, x)  # (`main.py:81-82`)
            key, sub = jax.random.split(key)
            params, state, opt_state, loss = train_step(
                params, state, opt_state, jnp.asarray(x), jnp.asarray(y), sub)
            losses.append(float(loss))
        preds, ys = [], []
        for x, y in pc.batch_iter(rng, te_x, te_y, args.batch_size, shuffle=False):
            preds.append(np.asarray(predict(params, state, jnp.asarray(x))))
            ys.append(y)
        miou = part_shape_miou(np.concatenate(preds), np.concatenate(ys))
        best = max(best, miou)
        logger.info("epoch %d loss %.4f shape-mIoU %.4f (%.1fs)", epoch,
                    float(np.mean(losses)), miou, timer.lap())
        scalars.log(epoch, loss=float(np.mean(losses)), miou=miou)
    logger.info("best shape-mIoU %.4f", best)
    return best


if __name__ == "__main__":
    main()
