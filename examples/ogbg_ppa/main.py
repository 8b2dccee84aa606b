"""DeeperGCN on ogbg-ppa — graph classification (37 classes).

Rebuild of `examples/ogb/ogbg_ppa/main.py` (ResGEN-28 softmax_sg t=0.01 → 0.7712
acc, `examples/ogb/README.md:37`): node features initialized from edge-feature
scatter (`main.py:70-78`), Linear(7, hidden) encoders (`model.py:67-69`), CE loss.
Run: python examples/ogbg_ppa/main.py --synthetic --epochs 5
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import select_platform, EpochTimer, add_deeper_gcn_flags, base_parser, make_optimizer, setup_experiment  # noqa: E402


def get_args(argv=None):
    p = base_parser("DeeperGCN on ogbg-ppa (TPU)")
    add_deeper_gcn_flags(p, num_layers=28, hidden=128, norm="batch", t=0.01,
                         aggr="softmax_sg")
    p.add_argument("--num_classes", type=int, default=37)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--graph_pooling", type=str, default="mean")
    p.set_defaults(epochs=200, lr=0.01, dropout=0.5)
    return p.parse_args(argv)


def load_ppa(args, rng):
    """Synthetic graph list (7-dim edge features; node feats = edge scatter,
    `ogbg_ppa/main.py:70-78`) split 80/20."""
    import numpy as np

    if not args.synthetic:
        raise FileNotFoundError("ogbg-ppa needs a local cache; pass --synthetic")
    gs = []
    W = rng.standard_normal((7, args.num_classes)).astype(np.float32)
    for _ in range(160):
        n = int(rng.integers(20, 50))
        e = n * 4
        s = rng.integers(0, n, e)
        r = rng.integers(0, n, e)
        ea = rng.random((e, 7)).astype(np.float32)
        y = int(np.argmax(ea.mean(0) @ W))
        x = np.zeros((n, 7), np.float32)
        np.add.at(x, r, ea)
        gs.append(dict(x=x, senders=s, receivers=r, edge_attr=ea, y=y))
    n_tr = int(0.8 * len(gs))
    return gs[:n_tr], gs[n_tr:]


def build_model(args):
    from deep_gcns_torch_tpu.models import DeeperGCN, DeeperGCNConfig

    return DeeperGCN(DeeperGCNConfig(
        in_channels=7, hidden_channels=args.hidden_channels,
        num_tasks=args.num_classes, num_layers=args.num_layers, block=args.block,
        aggr=args.gcn_aggr, t=args.t, learn_t=args.learn_t, norm=args.norm,
        mlp_layers=args.mlp_layers, dropout=args.dropout,
        edge_mode="one_time", edge_feat_dim=7,
        graph_pooling=args.graph_pooling, final_relu=False))


def make_batcher(args, all_gs):
    import jax.numpy as jnp
    import numpy as np

    from deep_gcns_torch_tpu.graph import batch_graphs

    B = args.batch_size
    node_pad = ((max(g["x"].shape[0] for g in all_gs) * B + 255) // 256) * 256
    edge_pad = ((max(len(g["senders"]) for g in all_gs) * B + 511) // 512) * 512

    def make_batch(batch):
        gr = batch_graphs([dict(x=g["x"], senders=g["senders"],
                                receivers=g["receivers"], edge_attr=g["edge_attr"])
                           for g in batch], node_pad=node_pad, edge_pad=edge_pad)
        return gr, jnp.asarray(np.array([g["y"] for g in batch]))

    return make_batch


def main():
    args = get_args()
    import jax

    select_platform(args)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from deep_gcns_torch_tpu.utils.ckpt import save_ckpt
    from deep_gcns_torch_tpu.utils.loss import cross_entropy
    from deep_gcns_torch_tpu.utils.metrics import accuracy

    exp, logger, scalars = setup_experiment(args, "ogbg_ppa")
    rng = np.random.default_rng(args.seed)
    train_gs, test_gs = load_ppa(args, rng)
    B = args.batch_size
    make_batch = make_batcher(args, train_gs + test_gs)
    model = build_model(args)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(args.seed))
    tx = make_optimizer(args)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, state, opt_state, g, y, key):
        def loss_fn(p):
            logits, s2 = model.apply(p, state, g.x, g, train=True, rng=key)
            return cross_entropy(logits, y), s2

        (loss, s2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), s2, opt2, loss

    @jax.jit
    def predict(params, state, g):
        logits, _ = model.apply(params, state, g.x, g, train=False)
        return jnp.argmax(logits, -1)

    timer = EpochTimer()
    key = jax.random.PRNGKey(args.seed + 1)
    best = 0.0
    for epoch in range(args.epochs):
        order = rng.permutation(len(train_gs))
        losses = []
        for i in range(0, len(order) - B + 1, B):
            gr, y = make_batch([train_gs[j] for j in order[i: i + B]])
            key, sub = jax.random.split(key)
            params, state, opt_state, loss = train_step(
                params, state, opt_state, jax.device_put(gr), y, sub)
            losses.append(float(loss))
        preds, ys = [], []
        for i in range(0, len(test_gs) - B + 1, B):
            gr, y = make_batch(test_gs[i: i + B])
            preds.append(np.asarray(predict(params, state, jax.device_put(gr))))
            ys.append(np.asarray(y))
        acc = accuracy(np.concatenate(preds), np.concatenate(ys))
        if acc > best:
            best = acc
            save_ckpt(os.path.join(exp, "ckpt_best"), params=params, state=state,
                      epoch=epoch, best_value=best)
        logger.info("epoch %d loss %.4f acc %.4f (%.1fs)", epoch,
                    float(np.mean(losses)), acc, timer.lap())
        scalars.log(epoch, loss=float(np.mean(losses)), acc=acc)
    logger.info("best acc %.4f", best)
    return best


if __name__ == "__main__":
    main()
