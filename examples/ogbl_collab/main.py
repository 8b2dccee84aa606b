"""DeeperGCN + LinkPredictor on ogbl-collab — link prediction with Hits@K.

Rebuild of `examples/ogb/ogbl_collab/main.py`: pos/neg log-loss with random
negatives (`main.py:94-106`), grad-norm clip 1.0 (`:112-113`), Hits@K eval (`:57-75`).
Run: python examples/ogbl_collab/main.py --synthetic --epochs 10
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import select_platform, EpochTimer, add_deeper_gcn_flags, base_parser, make_optimizer, setup_experiment  # noqa: E402


def get_args(argv=None):
    p = base_parser("DeeperGCN on ogbl-collab (TPU)")
    add_deeper_gcn_flags(p, num_layers=3, hidden=64, norm="batch", t=1.0,
                         aggr="softmax")
    p.add_argument("--lp_num_layers", type=int, default=3)
    p.add_argument("--lp_norm", type=str, default="none")
    p.add_argument("--num_tasks", type=int, default=1)
    p.add_argument("--hits_k", type=int, default=50)
    p.add_argument("--batch_edges", type=int, default=8192)
    p.set_defaults(epochs=400, lr=0.001, dropout=0.0)
    return p.parse_args(argv)


def load_data(args, rng):
    """(graph, train_pos, val_pos, n, in_dim): message-passing graph + held-out
    positive edges (`ogbl_collab/main.py` splits)."""
    import numpy as np

    from deep_gcns_torch_tpu.data.synthetic import sbm_arxiv_like

    if not args.synthetic:
        raise FileNotFoundError("ogbl-collab needs a local cache; pass --synthetic")
    n = args.synthetic_nodes
    g, _ = sbm_arxiv_like(rng, n=n, num_classes=8, c=64, avg_degree=8)
    em = np.asarray(g.edge_mask)
    s_all = np.asarray(g.senders)[em]
    r_all = np.asarray(g.receivers)[em]
    perm = rng.permutation(len(s_all))
    n_val = len(perm) // 10
    val_pos = (s_all[perm[:n_val]], r_all[perm[:n_val]])
    train_pos = (s_all[perm[n_val:]], r_all[perm[n_val:]])
    return g, train_pos, val_pos, n, 64


def build_models(args, in_dim):
    from deep_gcns_torch_tpu.models import DeeperGCN, DeeperGCNConfig
    from deep_gcns_torch_tpu.models.link_predictor import LinkPredictor

    model = DeeperGCN(DeeperGCNConfig(
        in_channels=in_dim, hidden_channels=args.hidden_channels,
        num_tasks=args.hidden_channels,  # encoder returns h (`model.py:76-125`)
        num_layers=args.num_layers, block=args.block, aggr=args.gcn_aggr,
        t=args.t, learn_t=args.learn_t, norm=args.norm,
        mlp_layers=args.mlp_layers, dropout=args.dropout))
    predictor = LinkPredictor(args.hidden_channels, args.hidden_channels, 1,
                              args.lp_num_layers, args.lp_norm, args.dropout)
    return model, predictor


def main():
    args = get_args()
    import jax

    select_platform(args)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from deep_gcns_torch_tpu.utils.ckpt import save_ckpt
    from deep_gcns_torch_tpu.utils.metrics import hits_at_k

    exp, logger, scalars = setup_experiment(args, "ogbl_collab")
    rng = np.random.default_rng(args.seed)
    g, train_pos, val_pos, n, in_dim = load_data(args, rng)
    model, predictor = build_models(args, in_dim)
    k0, k1 = jax.random.split(jax.random.PRNGKey(args.seed))
    params, state = jax.jit(model.init)(k0)
    lp_params, lp_state = predictor.init(k1)
    all_params = {"enc": params, "lp": lp_params}
    tx = optax.chain(optax.clip_by_global_norm(1.0), make_optimizer(args))
    opt_state = tx.init(all_params)
    g = jax.device_put(g)

    @jax.jit
    def train_step(all_params, state, opt_state, pos_s, pos_r, neg_s, neg_r, key):
        def loss_fn(ap):
            h, s2 = model.apply(ap["enc"], state, g.x, g, train=True, rng=key)
            pos, _ = predictor.apply(ap["lp"], lp_state, h[pos_s], h[pos_r],
                                     train=True, rng=key)
            neg, _ = predictor.apply(ap["lp"], lp_state, h[neg_s], h[neg_r],
                                     train=True, rng=key)
            # pos/neg log loss (`ogbl_collab/main.py:94-106`)
            loss = (-jnp.log(pos + 1e-15).mean()
                    - jnp.log(1 - neg + 1e-15).mean())
            return loss, s2

        (loss, s2), grads = jax.value_and_grad(loss_fn, has_aux=True)(all_params)
        updates, opt2 = tx.update(grads, opt_state, all_params)
        return optax.apply_updates(all_params, updates), s2, opt2, loss

    @jax.jit
    def score(all_params, state, es, er):
        h, _ = model.apply(all_params["enc"], state, g.x, g, train=False)
        sc, _ = predictor.apply(all_params["lp"], lp_state, h[es], h[er],
                                train=False)
        return sc[:, 0]

    timer = EpochTimer()
    key = jax.random.PRNGKey(args.seed + 1)
    best = 0.0
    BE = min(args.batch_edges, len(train_pos[0]))
    for epoch in range(args.epochs):
        sel = rng.integers(0, len(train_pos[0]), BE)
        neg_s = rng.integers(0, n, BE)
        neg_r = rng.integers(0, n, BE)
        key, sub = jax.random.split(key)
        all_params, state, opt_state, loss = train_step(
            all_params, state, opt_state,
            jnp.asarray(train_pos[0][sel]), jnp.asarray(train_pos[1][sel]),
            jnp.asarray(neg_s), jnp.asarray(neg_r), sub)
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            pos_sc = np.asarray(score(all_params, state,
                                      jnp.asarray(val_pos[0]),
                                      jnp.asarray(val_pos[1])))
            nneg = len(val_pos[0])
            neg_sc = np.asarray(score(all_params, state,
                                      jnp.asarray(rng.integers(0, n, nneg)),
                                      jnp.asarray(rng.integers(0, n, nneg))))
            hits = hits_at_k(pos_sc, neg_sc, args.hits_k)
            if hits > best:
                best = hits
                save_ckpt(os.path.join(exp, "ckpt_best"), params=all_params,
                          state={"enc": state, "lp": lp_state}, epoch=epoch,
                          best_value=best)
            logger.info("epoch %d loss %.4f Hits@%d %.4f (%.1fs)", epoch,
                        float(loss), args.hits_k, hits, timer.lap())
            scalars.log(epoch, loss=float(loss), hits=hits)
    logger.info("best Hits@%d %.4f", args.hits_k, best)
    return best


if __name__ == "__main__":
    main()
