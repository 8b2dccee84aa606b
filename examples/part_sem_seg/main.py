"""DeepGCN on PartNet — part semantic segmentation (dense layout, per-category).

Rebuild of `examples/part_sem_seg/main.py` (log_softmax + NLL
`architecture.py:77`/`main.py:18`, GPU-side augmentation `main.py:81-82`,
part/shape mIoU protocol `main.py:102-148`, best-ckpt on mean part IoU
`main.py:58-76`).
Run: python examples/part_sem_seg/main.py --synthetic --epochs 5
     python examples/part_sem_seg/main.py --data_dir /path/to/partnet --category Bed
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import select_platform, EpochTimer, base_parser, make_optimizer, setup_experiment  # noqa: E402


def get_args(argv=None):
    p = base_parser("DeepGCN PartNet part segmentation (TPU)")
    p.add_argument("--data_dir", type=str, default="",
                   help="PartNet root containing sem_seg_h5/{category}-{level}/")
    p.add_argument("--category", type=str, default="Bed")
    p.add_argument("--level", type=int, default=3)
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
    # eval-only flags (eval.py shares this surface, `eval.py` rebuild)
    p.add_argument("--res_dir", type=str, default="",
                   help="eval.py: directory for qualitative .obj exports")
    p.add_argument("--max_export", type=int, default=8,
                   help="eval.py: max objects to export as colored .obj")
    p.set_defaults(epochs=200, lr=5e-3, dropout=0.3)
    return p.parse_args(argv)


def build_model(args):
    from deep_gcns_torch_tpu.models import DeepGCNConfig, DenseDeepGCN

    return DenseDeepGCN(DeepGCNConfig(
        in_channels=args.in_channels, n_classes=args.n_classes,
        n_filters=args.n_filters, n_blocks=args.n_blocks, conv=args.conv,
        norm=args.norm, block=args.block, dropout=args.dropout, k=args.k,
        knn_method=args.knn_method,
        compute_dtype=(args.compute_dtype or None)))


def load_phase(args, rng, phase):
    """(points, labels) for a phase; synthetic stand-in when no data_dir."""
    import numpy as np
    from deep_gcns_torch_tpu.data import pointcloud as pc

    if args.synthetic or not args.data_dir:
        if not args.synthetic:
            raise FileNotFoundError(
                "PartNet h5 data needs --data_dir (download requires "
                "application); pass --synthetic for a stand-in")
        n = {"train": 48, "val": 16, "test": 16}[phase]
        return pc.synthetic_partnet(rng, n, args.num_points, args.n_classes)
    pts, lab = pc.load_partnet(args.data_dir, args.category, args.level, phase)
    # subsample/pad each shape to num_points (reference pre_transform uses
    # fixed-size sampling; PartNet sem_seg_h5 ships 10k points per shape)
    if pts.shape[1] != args.num_points:
        idx = rng.choice(pts.shape[1], args.num_points,
                         replace=pts.shape[1] < args.num_points)
        pts, lab = pts[:, idx], lab[:, idx]
    n_cls = int(lab.max()) + 1
    if n_cls > args.n_classes:
        raise ValueError(f"data has {n_cls} part classes; pass --n_classes {n_cls}")
    return pts.astype(np.float32), lab.astype(np.int64)


def main():
    args = get_args()
    import jax

    select_platform(args)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from deep_gcns_torch_tpu.data import pointcloud as pc
    from deep_gcns_torch_tpu.utils.ckpt import save_ckpt
    from deep_gcns_torch_tpu.utils.loss import cross_entropy
    from deep_gcns_torch_tpu.utils.metrics import part_seg_miou

    exp, logger, scalars = setup_experiment(args, "part_sem_seg")
    rng = np.random.default_rng(args.seed)

    tr_x, tr_y = load_phase(args, rng, "train")
    va_x, va_y = load_phase(args, rng, "val")

    model = build_model(args)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(args.seed))
    tx = make_optimizer(args)
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
        for x, y in pc.batch_iter(rng, va_x, va_y, args.batch_size, shuffle=False):
            preds.append(np.asarray(predict(params, state, jnp.asarray(x))))
            ys.append(y)
        part_iou, shape_miou = part_seg_miou(np.concatenate(preds),
                                             np.concatenate(ys), args.n_classes)
        if part_iou > best:
            best = part_iou
            save_ckpt(os.path.join(exp, "ckpt_best"), params=params, state=state,
                      epoch=epoch, best_value=best)
        logger.info("epoch %d loss %.4f part-IoU %.4f shape-mIoU %.4f (%.1fs)",
                    epoch, float(np.mean(losses)), part_iou, shape_miou,
                    timer.lap())
        scalars.log(epoch, loss=float(np.mean(losses)), part_iou=part_iou,
                    shape_miou=shape_miou)
    save_ckpt(os.path.join(exp, "ckpt_last"), params=params, state=state,
              epoch=args.epochs - 1, best_value=best)
    logger.info("best part-IoU %.4f", best)
    return best


if __name__ == "__main__":
    main()
