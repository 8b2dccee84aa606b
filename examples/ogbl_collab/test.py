"""Inference/evaluation for a trained DeeperGCN+LinkPredictor collab checkpoint.

Rebuild of `examples/ogb/ogbl_collab/test.py`: load checkpoint, score held-out
positive edges against random negatives, report Hits@K (`main.py:57-75`).
Run: python examples/ogbl_collab/test.py --synthetic --pretrained_model <exp>/ckpt_best
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import select_platform  # noqa: E402
from main import build_models, get_args, load_data  # noqa: E402


def main():
    args = get_args()
    assert args.pretrained_model, "--pretrained_model required"
    import jax

    select_platform(args)
    import jax.numpy as jnp
    import numpy as np

    from deep_gcns_torch_tpu.utils.ckpt import load_ckpt
    from deep_gcns_torch_tpu.utils.metrics import hits_at_k

    rng = np.random.default_rng(args.seed)
    g, train_pos, val_pos, n, in_dim = load_data(args, rng)
    model, predictor = build_models(args, in_dim)
    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    p_enc, enc_state = jax.jit(model.init)(k0)
    lp_params, lp_state = predictor.init(k1)
    template = {"enc": p_enc, "lp": lp_params}
    all_params, full_state, _, meta = load_ckpt(
        args.pretrained_model, params_like=template,
        state_like={"enc": enc_state, "lp": lp_state})
    state, lp_state = full_state["enc"], full_state["lp"]
    print(f"loaded checkpoint (epoch {meta.get('epoch')}, "
          f"best {meta.get('best_value', float('nan')):.4f})")
    g = jax.device_put(g)

    @jax.jit
    def score(all_params, state, es, er):
        h, _ = model.apply(all_params["enc"], state, g.x, g, train=False)
        sc, _ = predictor.apply(all_params["lp"], lp_state, h[es], h[er],
                                train=False)
        return sc[:, 0]

    pos_sc = np.asarray(score(all_params, state, jnp.asarray(val_pos[0]),
                              jnp.asarray(val_pos[1])))
    nneg = len(val_pos[0])
    neg_sc = np.asarray(score(all_params, state,
                              jnp.asarray(rng.integers(0, n, nneg)),
                              jnp.asarray(rng.integers(0, n, nneg))))
    hits = hits_at_k(pos_sc, neg_sc, args.hits_k)
    print(f"valid Hits@{args.hits_k}: {hits:.4f} ({nneg} positive edges)")


if __name__ == "__main__":
    main()
