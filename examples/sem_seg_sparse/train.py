"""SparseDeepGCN on S3DIS — flat N×C layout with dynamic dilated kNN.

Rebuild of `examples/sem_seg_sparse/train.py` (same topology as the dense app but
PyG-style flat node layout + per-graph scatter-max fusion,
`examples/sem_seg_sparse/architecture.py:60-70`).
Run: python examples/sem_seg_sparse/train.py --synthetic --epochs 5
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import select_platform, EpochTimer, base_parser, setup_experiment  # noqa: E402


def get_args(argv=None):
    p = base_parser("SparseDeepGCN S3DIS (TPU)")
    p.add_argument("--k", type=int, default=16)
    p.add_argument("--knn_method", type=str, default="exact",
                   choices=["exact", "approx"],
                   help="approx = TPU PartialReduce dilated kNN (ops/knn.py)")
    p.add_argument("--compute_dtype", type=str, default="",
                   help="e.g. bfloat16: bf16 edge path, f32 accumulation")
    p.add_argument("--block", type=str, default="res")
    p.add_argument("--conv", type=str, default="edge")
    p.add_argument("--norm", type=str, default="batch")
    p.add_argument("--n_blocks", type=int, default=28)
    p.add_argument("--n_filters", type=int, default=64)
    p.add_argument("--in_channels", type=int, default=9)
    p.add_argument("--n_classes", type=int, default=13)
    p.add_argument("--num_points", type=int, default=4096)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--test_area", type=int, default=5)
    p.add_argument("--stochastic", action="store_true", default=False)
    p.add_argument("--epsilon", type=float, default=0.2)
    p.set_defaults(epochs=100, lr=1e-3, dropout=0.3)
    return p.parse_args(argv)


def build_model(args):
    from deep_gcns_torch_tpu.models import DeepGCNConfig, SparseDeepGCN

    return SparseDeepGCN(DeepGCNConfig(
        in_channels=args.in_channels, n_classes=args.n_classes,
        n_filters=args.n_filters, n_blocks=args.n_blocks, conv=args.conv,
        norm=args.norm, block=args.block, dropout=args.dropout, k=args.k,
        knn_method=args.knn_method,
        compute_dtype=(args.compute_dtype or None),
        stochastic=args.stochastic, epsilon=args.epsilon,
        num_points=args.num_points))


def load_split(args, rng, split):
    from deep_gcns_torch_tpu.data import pointcloud as pc

    if args.synthetic:
        n = 48 if split == "train" else 16
        return pc.synthetic_s3dis(rng, n, args.num_points, args.n_classes)
    return pc.load_s3dis(args.data_root, args.test_area, split)


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
    from deep_gcns_torch_tpu.utils.metrics import IoUAccumulator

    exp, logger, scalars = setup_experiment(args, "sem_seg_sparse")
    rng = np.random.default_rng(args.seed)
    tr_x, tr_y = load_split(args, rng, "train")
    te_x, te_y = load_split(args, rng, "test")

    model = build_model(args)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(args.seed))
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, state, opt_state, x, y, key):
        def loss_fn(p):
            logits, s2 = model.apply(p, state, x, None, train=True, rng=key)
            return cross_entropy(logits, y), s2

        (loss, s2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), s2, opt2, loss

    @jax.jit
    def predict(params, state, x):
        logits, _ = model.apply(params, state, x, None, train=False)
        return jnp.argmax(logits, -1)

    timer = EpochTimer()
    key = jax.random.PRNGKey(args.seed + 1)
    best = 0.0
    for epoch in range(args.epochs):
        losses = []
        for x, y in pc.batch_iter(rng, tr_x, tr_y, args.batch_size):
            xf = jnp.asarray(x.reshape(-1, x.shape[-1]))
            yf = jnp.asarray(y.reshape(-1))
            key, sub = jax.random.split(key)
            params, state, opt_state, loss = train_step(params, state, opt_state,
                                                        xf, yf, sub)
            losses.append(float(loss))
        iou = IoUAccumulator(args.n_classes)
        for x, y in pc.batch_iter(rng, te_x, te_y, args.batch_size, shuffle=False):
            pred = np.asarray(predict(params, state,
                                      jnp.asarray(x.reshape(-1, x.shape[-1]))))
            iou.update(pred, y.reshape(-1))
        miou = iou.miou()
        if miou > best:
            best = miou
            save_ckpt(os.path.join(exp, "ckpt_best"), params=params, state=state,
                      epoch=epoch, best_value=best)
        logger.info("epoch %d loss %.4f mIoU %.4f (%.1fs)", epoch,
                    float(np.mean(losses)), miou, timer.lap())
        scalars.log(epoch, loss=float(np.mean(losses)), miou=miou)
    logger.info("best mIoU %.4f", best)
    return best


if __name__ == "__main__":
    main()
