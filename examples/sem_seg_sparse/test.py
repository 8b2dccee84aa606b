"""Whole-area evaluation for a trained SparseDeepGCN S3DIS checkpoint.

Rebuild of `examples/sem_seg_sparse/test.py:33-57`: load checkpoint, run every
block of the held-out area, accumulate per-class intersection/union over ALL
blocks, set empty classes' IoU to 1 (`ious[np.isnan(ious)] = 1`, test.py:54),
print per-class IoUs and the mIoU.
Run: python examples/sem_seg_sparse/test.py --synthetic --pretrained_model <exp>/ckpt_best
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import select_platform  # noqa: E402
from train import build_model, get_args, load_split  # noqa: E402


def main(argv=None):
    args = get_args(argv)
    assert args.pretrained_model, "--pretrained_model required"
    import jax

    select_platform(args)
    import jax.numpy as jnp
    import numpy as np

    from deep_gcns_torch_tpu.utils.ckpt import load_ckpt

    rng = np.random.default_rng(args.seed)
    te_x, te_y = load_split(args, rng, "test")

    model = build_model(args)
    p0, s0 = jax.jit(model.init)(jax.random.PRNGKey(0))
    params, state, _, meta = load_ckpt(args.pretrained_model, params_like=p0,
                                       state_like=s0)
    print(f"loaded checkpoint (epoch {meta.get('epoch')}, "
          f"best {meta.get('best_value', float('nan')):.4f})")

    @jax.jit
    def predict(params, state, x):
        logits, _ = model.apply(params, state, x, None, train=False)
        return jnp.argmax(logits, -1)

    inter = np.zeros(args.n_classes, np.float64)
    union = np.zeros(args.n_classes, np.float64)
    bs = min(args.batch_size, len(te_x))
    n_blocks = len(te_x)
    pad = (-n_blocks) % bs  # cover the trailing partial batch; trim after
    tx_pad = np.concatenate([te_x, te_x[-1:].repeat(pad, 0)]) if pad else te_x
    for lo in range(0, len(tx_pad), bs):
        xb = tx_pad[lo:lo + bs]
        pred = np.asarray(predict(params, state,
                                  jnp.asarray(xb.reshape(-1, xb.shape[-1]))))
        pred = pred.reshape(xb.shape[0], -1)
        hi = min(lo + bs, n_blocks)
        if hi <= lo:
            break
        pred = pred[: hi - lo]
        gt = te_y[lo:hi]
        for cl in range(args.n_classes):
            pm = pred == cl
            gm = gt == cl
            inter[cl] += np.logical_and(pm, gm).sum()
            union[cl] += np.logical_or(pm, gm).sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        ious = inter / union
    ious[np.isnan(ious)] = 1.0  # (`test.py:54`)
    for cl in range(args.n_classes):
        print(f"IoU class {cl}: {ious[cl]:.4f}")
    print(f"area mIoU over {n_blocks} blocks: {float(np.mean(ious)):.4f}")
    return float(np.mean(ious))


if __name__ == "__main__":
    main()
