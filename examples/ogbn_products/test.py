"""Inference/evaluation for a trained DeeperGCN products checkpoint.

Rebuild of `examples/ogb/ogbn_products/test.py`: load checkpoint, evaluate the
full graph (here: partitioned forward + prediction reassembly instead of the
reference's full-batch-on-CPU workaround, `main.py:19-23`), report accuracy per
split.
Run: python examples/ogbn_products/test.py --synthetic --pretrained_model <exp>/ckpt_best
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import select_platform  # noqa: E402
from main import build_model, eval_partitioned, get_args, load_data  # noqa: E402


def main():
    args = get_args()
    assert args.pretrained_model, "--pretrained_model required"
    import jax

    select_platform(args)
    import numpy as np

    from deep_gcns_torch_tpu.utils.ckpt import load_ckpt
    from deep_gcns_torch_tpu.utils.metrics import accuracy

    rng = np.random.default_rng(args.seed)
    x, senders, receivers, labels, splits, in_dim, n = load_data(args, rng)

    model = build_model(args, in_dim)
    p0, s0 = jax.jit(model.init)(jax.random.PRNGKey(0))
    params, state, _, meta = load_ckpt(args.pretrained_model, params_like=p0,
                                       state_like=s0)
    print(f"loaded checkpoint (epoch {meta.get('epoch')}, "
          f"best {meta.get('best_value', float('nan')):.4f})")

    @jax.jit
    def predict(params, state, g, xx):
        logits, _ = model.apply(params, state, xx, g, train=False)
        return logits

    train_mask_full = np.zeros(n, bool)
    train_mask_full[splits["train"]] = True
    lab_onecol = np.asarray(labels).astype(np.int32)[:, None].astype(np.float32)
    full = eval_partitioned(args, predict, params, state, x, senders, receivers,
                            n, lab_onecol, train_mask_full).argmax(-1)
    for k, idx in splits.items():
        print(f"{k} acc: {accuracy(full[idx], np.asarray(labels)[idx]):.4f}")


if __name__ == "__main__":
    main()
