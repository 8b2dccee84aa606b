"""DeepGCN on PPI — static-graph multi-label node classification.

Rebuild of `examples/ppi/main.py` (ResMRGCN-14: BCEWithLogits + micro-F1,
ReduceLROnPlateau; paper F1 ≈ 0.994, `examples/ppi/README.md`).
Run: python examples/ppi/main.py --synthetic --epochs 20
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import select_platform, EpochTimer, base_parser, setup_experiment  # noqa: E402


def get_args(argv=None):
    p = base_parser("DeepGCN on PPI (TPU)")
    p.add_argument("--block", type=str, default="res")
    p.add_argument("--conv", type=str, default="mr")
    p.add_argument("--compute_dtype", type=str, default="",
                   help="e.g. bfloat16: bf16 edge path, f32 accumulation")
    p.add_argument("--norm", type=str, default="batch")
    p.add_argument("--act", type=str, default="relu")
    p.add_argument("--n_blocks", type=int, default=14)
    p.add_argument("--n_filters", type=int, default=64)
    p.add_argument("--n_heads", type=int, default=1)
    p.add_argument("--in_channels", type=int, default=50)
    p.add_argument("--n_classes", type=int, default=121)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--lr_patience", type=int, default=10)
    p.set_defaults(epochs=2000, lr=0.002, dropout=0.2)
    return p.parse_args(argv)


def load_ppi(args, rng):
    """PPI from local npz caches (train/valid/test graph lists) or synthetic."""
    import numpy as np

    if args.synthetic:
        def make(n_graphs):
            gs = []
            for _ in range(n_graphs):
                n = int(rng.integers(200, 400))
                e = n * 12
                s = rng.integers(0, n, e)
                r = rng.integers(0, n, e)
                x = rng.standard_normal((n, args.in_channels)).astype(np.float32)
                # learnable labels: sign of aggregated neighbor features
                agg = np.zeros_like(x)
                np.add.at(agg, r, x[s])
                w = make.w
                y = ((agg @ w) > 0).astype(np.float32)
                gs.append(dict(x=x, senders=s, receivers=r, y=y))
            return gs

        make.w = rng.standard_normal((args.in_channels, args.n_classes)).astype(
            np.float32)
        return make(8), make(2), make(2)
    path = os.path.join(args.data_root, "ppi.npz")
    if not os.path.exists(path):
        # raw GraphSAGE layout present? convert it in place (the reference
        # reads it via PyG's PPI dataset, `examples/ppi/main.py:5,120-142`)
        raw = os.path.join(args.data_root, "ppi_raw")
        if os.path.exists(os.path.join(raw, "train_graph.json")):
            from deep_gcns_torch_tpu.data.ppi import convert_ppi_raw

            convert_ppi_raw(raw, path)
        else:
            raise FileNotFoundError(
                f"no PPI cache at {path}; convert a raw download with "
                "`python -m deep_gcns_torch_tpu.data.ppi <raw_dir> "
                f"{path}` or pass --synthetic")
    z = np.load(path, allow_pickle=True)
    return list(z["train"]), list(z["valid"]), list(z["test"])


def build_model(args):
    from deep_gcns_torch_tpu.models import DeepGCNConfig, DeepGCNStatic

    return DeepGCNStatic(DeepGCNConfig(
        in_channels=args.in_channels, n_classes=args.n_classes,
        n_filters=args.n_filters, n_blocks=args.n_blocks, conv=args.conv,
        compute_dtype=(args.compute_dtype or None),
        act=args.act, norm=args.norm, heads=args.n_heads, block=args.block,
        dropout=args.dropout))


def make_batcher(args, all_gs):
    """Fixed node/edge buckets across all graphs (one compiled program)."""
    import jax.numpy as jnp
    import numpy as np

    from deep_gcns_torch_tpu.graph import batch_graphs

    max_n = max(g["x"].shape[0] for g in all_gs)
    max_e = max(len(g["senders"]) for g in all_gs)
    node_pad = ((max_n + 255) // 256) * 256
    edge_pad = ((max_e + 511) // 512) * 512

    def to_batch(g):
        gr = batch_graphs([dict(x=g["x"], senders=g["senders"],
                                receivers=g["receivers"])],
                          node_pad=node_pad, edge_pad=edge_pad)
        y = np.zeros((node_pad, args.n_classes), np.float32)
        y[: len(g["y"])] = g["y"]
        return gr, jnp.asarray(y)

    return to_batch


def main():
    args = get_args()
    import jax

    select_platform(args)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from deep_gcns_torch_tpu.utils.ckpt import save_ckpt
    from deep_gcns_torch_tpu.utils.loss import bce_with_logits
    from deep_gcns_torch_tpu.utils.metrics import micro_f1
    from deep_gcns_torch_tpu.utils.optim import ReduceLROnPlateau

    exp, logger, scalars = setup_experiment(args, "ppi")
    rng = np.random.default_rng(args.seed)
    train_gs, valid_gs, test_gs = load_ppi(args, rng)

    to_batch = make_batcher(args, train_gs + valid_gs + test_gs)
    model = build_model(args)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(args.seed))
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=args.lr)
    opt_state = tx.init(params)
    plateau = ReduceLROnPlateau(patience=args.lr_patience, mode="max")

    @jax.jit
    def train_step(params, state, opt_state, g, y, key):
        def loss_fn(p):
            logits, s2 = model.apply(p, state, g.x, g, train=True, rng=key)
            return bce_with_logits(logits, y, mask=g.node_mask), s2

        (loss, s2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), s2, opt2, loss

    @jax.jit
    def predict(params, state, g):
        logits, _ = model.apply(params, state, g.x, g, train=False)
        return logits

    def evaluate(gs):
        preds, ys = [], []
        for g in gs:
            gr, y = to_batch(g)
            n = g["x"].shape[0]
            preds.append(np.asarray(predict(params, state, jax.device_put(gr)))[:n])
            ys.append(g["y"])
        return micro_f1(np.concatenate(preds), np.concatenate(ys))

    timer = EpochTimer()
    key = jax.random.PRNGKey(args.seed + 1)
    best_valid = best_test = 0.0
    for epoch in range(args.epochs):
        losses = []
        for gi in rng.permutation(len(train_gs)):
            gr, y = to_batch(train_gs[gi])
            key, sub = jax.random.split(key)
            params, state, opt_state, loss = train_step(
                params, state, opt_state, jax.device_put(gr), y, sub)
            losses.append(float(loss))
        f1_v = evaluate(valid_gs)
        f1_t = evaluate(test_gs)
        scale = plateau.step(f1_v)
        opt_state.hyperparams["learning_rate"] = args.lr * scale
        if f1_v > best_valid:
            best_valid = f1_v
            save_ckpt(os.path.join(exp, "ckpt_best"), params=params, state=state,
                      epoch=epoch, best_value=best_valid)
        best_test = max(best_test, f1_t)
        logger.info("epoch %d loss %.4f valid-F1 %.4f test-F1 %.4f lr %.5f (%.1fs)",
                    epoch, float(np.mean(losses)), f1_v, f1_t, args.lr * scale,
                    timer.lap())
        scalars.log(epoch, loss=float(np.mean(losses)), f1_valid=f1_v, f1_test=f1_t)
    logger.info("best valid F1 %.4f best test F1 %.4f", best_valid, best_test)
    return best_valid


if __name__ == "__main__":
    main()
