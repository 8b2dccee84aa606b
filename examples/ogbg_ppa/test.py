"""Inference/evaluation for a trained DeeperGCN ogbg-ppa checkpoint.

Rebuild of `examples/ogb/ogbg_ppa/test.py`: load checkpoint, score the test
split, report classification accuracy.
Run: python examples/ogbg_ppa/test.py --synthetic --pretrained_model <exp>/ckpt_best
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import select_platform  # noqa: E402
from main import build_model, get_args, load_ppa, make_batcher  # noqa: E402


def main():
    args = get_args()
    assert args.pretrained_model, "--pretrained_model required"
    import jax

    select_platform(args)
    import jax.numpy as jnp
    import numpy as np

    from deep_gcns_torch_tpu.utils.ckpt import load_ckpt
    from deep_gcns_torch_tpu.utils.metrics import accuracy

    rng = np.random.default_rng(args.seed)
    train_gs, test_gs = load_ppa(args, rng)
    make_batch = make_batcher(args, train_gs + test_gs)

    model = build_model(args)
    p0, s0 = jax.jit(model.init)(jax.random.PRNGKey(0))
    params, state, _, meta = load_ckpt(args.pretrained_model, params_like=p0,
                                       state_like=s0)
    print(f"loaded checkpoint (epoch {meta.get('epoch')}, "
          f"best {meta.get('best_value', float('nan')):.4f})")

    @jax.jit
    def predict(params, state, g):
        logits, _ = model.apply(params, state, g.x, g, train=False)
        return jnp.argmax(logits, -1)

    B = args.batch_size
    n_true = len(test_gs)
    padded = test_gs + [test_gs[-1]] * ((-n_true) % B)  # trim after predict
    preds, ys = [], []
    for i in range(0, len(padded), B):
        gr, y = make_batch(padded[i: i + B])
        preds.append(np.asarray(predict(params, state, jax.device_put(gr))))
        ys.append(np.asarray(y))
    acc = accuracy(np.concatenate(preds)[:n_true], np.concatenate(ys)[:n_true])
    print(f"test acc: {acc:.4f} ({n_true} graphs)")


if __name__ == "__main__":
    main()
