"""DeeperGCN on ogbg-mol* — graph property prediction (molhiv / molpcba).

Rebuild of `examples/ogb/ogbg_mol/main.py` (DyResGEN-7 softmax learn_t →
molhiv 0.7858 ROC-AUC; ResGEN-14 + virtual node → molpcba 0.2745 AP,
`examples/ogb/README.md:35-36`): AtomEncoder node features, Bond edge features,
NaN-masked BCE (`main.py:26-30`), mean/sum/max graph pooling, optional virtual node.
Run: python examples/ogbg_mol/main.py --synthetic --epochs 5
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import select_platform, EpochTimer, add_deeper_gcn_flags, base_parser, make_optimizer, setup_experiment  # noqa: E402


def get_args(argv=None):
    p = base_parser("DeeperGCN on ogbg-mol (TPU)")
    add_deeper_gcn_flags(p, num_layers=7, hidden=256, norm="batch", t=1.0,
                         aggr="softmax")
    p.add_argument("--dataset", type=str, default="ogbg-molhiv")
    p.add_argument("--num_tasks", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--graph_pooling", type=str, default="mean")
    p.add_argument("--add_virtual_node", action="store_true")
    p.add_argument("--conv_encode_edge", action="store_true", default=True)
    p.add_argument("--grad_clip", type=float, default=0.0)
    p.set_defaults(epochs=300, lr=0.01, dropout=0.5)
    return p.parse_args(argv)


def load_mol(args, rng):
    """Graph list: each dict(x int [n,9], senders, receivers, edge_attr int [e,3],
    y float [num_tasks] possibly NaN)."""
    import numpy as np

    from deep_gcns_torch_tpu.data.ogb_features import (ATOM_FEATURE_DIMS,
                                                       BOND_FEATURE_DIMS)

    if args.synthetic:
        gs, scores = [], []
        w = rng.standard_normal((len(ATOM_FEATURE_DIMS),)).astype(np.float32)
        for _ in range(200):
            n = int(rng.integers(10, 30))
            e = n * 3
            x = np.stack([rng.integers(0, d, n) for d in ATOM_FEATURE_DIMS], 1)
            s = rng.integers(0, n, e)
            r = rng.integers(0, n, e)
            ea = np.stack([rng.integers(0, d, e) for d in BOND_FEATURE_DIMS], 1)
            scores.append(float((x @ w).mean()))
            gs.append(dict(x=x.astype(np.int32), senders=s, receivers=r,
                           edge_attr=ea.astype(np.int32)))
        med = float(np.median(scores))
        for g, sc in zip(gs, scores):
            y = np.array([sc > med], np.float32)
            if args.num_tasks > 1:
                y = np.repeat(y, args.num_tasks)
                y[rng.random(args.num_tasks) < 0.2] = np.nan  # is_labeled mask
            g["y"] = y
        n_tr = int(0.8 * len(gs))
        return gs[:n_tr], gs[n_tr:]
    raise FileNotFoundError("ogbg-mol requires a local cache; pass --synthetic")


def build_model(args):
    from deep_gcns_torch_tpu.data.ogb_features import (ATOM_FEATURE_DIMS,
                                                       BOND_FEATURE_DIMS)
    from deep_gcns_torch_tpu.models import DeeperGCN, DeeperGCNConfig

    return DeeperGCN(DeeperGCNConfig(
        in_channels=0, hidden_channels=args.hidden_channels,
        num_tasks=args.num_tasks, num_layers=args.num_layers, block=args.block,
        aggr=args.gcn_aggr, t=args.t, learn_t=args.learn_t, p=args.p,
        learn_p=args.learn_p, msg_norm=args.msg_norm,
        learn_msg_scale=args.learn_msg_scale, norm=args.norm,
        mlp_layers=args.mlp_layers, dropout=args.dropout,
        node_encoder="atom", atom_feature_dims=ATOM_FEATURE_DIMS,
        edge_mode="bond" if args.conv_encode_edge else "one_time_bond",
        bond_feature_dims=BOND_FEATURE_DIMS,
        graph_pooling=args.graph_pooling,
        add_virtual_node=args.add_virtual_node, final_relu=False))


def make_batcher(args, all_gs):
    """Fixed-bucket block-diagonal batcher over a graph list."""
    import jax.numpy as jnp
    import numpy as np

    from deep_gcns_torch_tpu.graph import batch_graphs

    B = args.batch_size
    node_pad = ((max(g["x"].shape[0] for g in all_gs) * B + 255) // 256) * 256
    edge_pad = ((max(len(g["senders"]) for g in all_gs) * B + 511) // 512) * 512

    def make_batch(gs):
        gr = batch_graphs([dict(x=g["x"], senders=g["senders"],
                                receivers=g["receivers"], edge_attr=g["edge_attr"])
                           for g in gs], node_pad=node_pad, edge_pad=edge_pad)
        y = np.stack([g["y"] for g in gs])
        return gr, jnp.asarray(y)

    return make_batch


def main():
    args = get_args()
    import jax

    select_platform(args)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from deep_gcns_torch_tpu.utils.ckpt import save_ckpt
    from deep_gcns_torch_tpu.utils.loss import bce_with_logits
    from deep_gcns_torch_tpu.utils.metrics import average_precision, roc_auc

    exp, logger, scalars = setup_experiment(args, "ogbg_mol")
    rng = np.random.default_rng(args.seed)
    train_gs, test_gs = load_mol(args, rng)
    B = args.batch_size
    make_batch = make_batcher(args, train_gs + test_gs)
    model = build_model(args)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(args.seed))
    tx = make_optimizer(args)
    if args.grad_clip:
        tx = optax.chain(optax.clip(args.grad_clip), tx)  # value clip (`main.py:34-37`)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, state, opt_state, g, y, key):
        def loss_fn(p):
            logits, s2 = model.apply(p, state, g.x, g, train=True, rng=key)
            mask = ~jnp.isnan(y)  # is_labeled (`main.py:26-30`)
            return bce_with_logits(logits, y, mask=mask), s2

        (loss, s2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), s2, opt2, loss

    @jax.jit
    def predict(params, state, g):
        logits, _ = model.apply(params, state, g.x, g, train=False)
        return logits

    metric = roc_auc if args.num_tasks == 1 else average_precision
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
        m = metric(np.concatenate(preds), np.concatenate(ys))
        if m > best:
            best = m
            save_ckpt(os.path.join(exp, "ckpt_best"), params=params, state=state,
                      epoch=epoch, best_value=best)
        logger.info("epoch %d loss %.4f metric %.4f (%.1fs)", epoch,
                    float(np.mean(losses)), m, timer.lap())
        scalars.log(epoch, loss=float(np.mean(losses)), metric=m)
    logger.info("best metric %.4f", best)
    return best


if __name__ == "__main__":
    main()
