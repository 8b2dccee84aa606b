"""Inference/evaluation for a trained DeeperGCN arxiv checkpoint.

Rebuild of `examples/ogb/ogbn_arxiv/test.py:9-77`: load checkpoint, run full-graph
inference, report accuracy per split.
Run: python examples/ogbn_arxiv/test.py --synthetic --pretrained_model <exp>/ckpt
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import select_platform  # noqa: E402
from main import get_args  # noqa: E402  (same flag surface)


def main():
    args = get_args()
    assert args.pretrained_model, "--pretrained_model required"
    import jax

    select_platform(args)
    import jax.numpy as jnp
    import numpy as np

    from deep_gcns_torch_tpu.models import DeeperGCN, DeeperGCNConfig
    from deep_gcns_torch_tpu.utils.ckpt import load_ckpt
    from deep_gcns_torch_tpu.utils.metrics import accuracy
    from deep_gcns_torch_tpu.utils.profiling import device_memory_stats

    rng = np.random.default_rng(args.seed)
    if args.synthetic:
        from deep_gcns_torch_tpu.data.synthetic import sbm_arxiv_like

        n = args.synthetic_nodes
        g, labels = sbm_arxiv_like(rng, n=n, num_classes=args.num_classes, c=128,
                                   avg_degree=12)
        perm = rng.permutation(n)
        splits = {"train": perm[: int(0.6 * n)],
                  "valid": perm[int(0.6 * n): int(0.8 * n)],
                  "test": perm[int(0.8 * n):]}
        in_dim = 128
    else:
        from deep_gcns_torch_tpu.data.ogb import load_ogb_node
        from deep_gcns_torch_tpu.graph import (add_self_loops, build_graph,
                                               to_undirected)

        ds = load_ogb_node("ogbn-arxiv", args.data_root)
        s, r = to_undirected(ds.senders, ds.receivers)
        s, r = add_self_loops(s, r, ds.x.shape[0])
        g = build_graph(ds.x, s, r)
        labels, splits, in_dim = ds.labels, ds.splits, ds.x.shape[1]
        n = ds.x.shape[0]

    model = DeeperGCN(DeeperGCNConfig(
        in_channels=in_dim, hidden_channels=args.hidden_channels,
        num_tasks=args.num_classes, num_layers=args.num_layers, block=args.block,
        aggr=args.gcn_aggr, t=args.t, learn_t=args.learn_t, norm=args.norm,
        mlp_layers=args.mlp_layers, dropout=args.dropout))
    p0, s0 = jax.jit(model.init)(jax.random.PRNGKey(0))
    params, state, _, meta = load_ckpt(args.pretrained_model, params_like=p0,
                                       state_like=s0)
    print(f"loaded checkpoint (epoch {meta.get('epoch')}, "
          f"best {meta.get('best_value'):.4f})")

    g = jax.device_put(g)

    @jax.jit
    def predict(params, state):
        logits, _ = model.apply(params, state, g.x, g, train=False)
        return jnp.argmax(logits, -1)

    pred = np.asarray(predict(params, state))
    for k, idx in splits.items():
        print(f"{k} acc: "
              f"{accuracy(pred[np.asarray(idx)], np.asarray(labels)[np.asarray(idx)]):.4f}")
    mem = device_memory_stats()
    if mem["peak_bytes_in_use"]:
        print(f"peak device memory: {mem['peak_bytes_in_use'] / 2**20:.1f} MiB")


if __name__ == "__main__":
    main()
