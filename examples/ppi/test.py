"""Inference/evaluation for a trained DeepGCN PPI checkpoint.

Evaluation-script analog for PPI (the reference ships no ppi test.py; protocol
follows `examples/ppi/main.py:80-82`): load checkpoint, report micro-F1 on the
valid and test graph sets.
Run: python examples/ppi/test.py --synthetic --pretrained_model <exp>/ckpt_best
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import select_platform  # noqa: E402
from main import build_model, get_args, load_ppi, make_batcher  # noqa: E402


def main():
    args = get_args()
    assert args.pretrained_model, "--pretrained_model required"
    import jax

    select_platform(args)
    import numpy as np

    from deep_gcns_torch_tpu.utils.ckpt import load_ckpt
    from deep_gcns_torch_tpu.utils.metrics import micro_f1

    rng = np.random.default_rng(args.seed)
    train_gs, valid_gs, test_gs = load_ppi(args, rng)
    to_batch = make_batcher(args, train_gs + valid_gs + test_gs)

    model = build_model(args)
    p0, s0 = jax.jit(model.init)(jax.random.PRNGKey(0))
    params, state, _, meta = load_ckpt(args.pretrained_model, params_like=p0,
                                       state_like=s0)
    print(f"loaded checkpoint (epoch {meta.get('epoch')}, "
          f"best {meta.get('best_value', float('nan')):.4f})")

    @jax.jit
    def predict(params, state, g):
        logits, _ = model.apply(params, state, g.x, g, train=False)
        return logits

    for name, gs in (("valid", valid_gs), ("test", test_gs)):
        preds, ys = [], []
        for g in gs:
            gr, y = to_batch(g)
            n = g["x"].shape[0]
            preds.append(np.asarray(predict(params, state,
                                            jax.device_put(gr)))[:n])
            ys.append(g["y"])
        f1 = micro_f1(np.concatenate(preds), np.concatenate(ys))
        print(f"{name} micro-F1: {f1:.4f} ({len(gs)} graphs)")


if __name__ == "__main__":
    main()
