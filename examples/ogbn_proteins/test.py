"""Multi-view inference for a trained DeeperGCN proteins checkpoint.

Rebuild of `examples/ogb/ogbn_proteins/test.py`: load checkpoint,
evaluate with multiple independent random partitions, average predictions, report
ROC-AUC per split and peak device memory.
Run: python examples/ogbn_proteins/test.py --synthetic \
        --pretrained_model <exp>/ckpt --num_evals 3 --eval_parts 5
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import select_platform  # noqa: E402
from main import build_model, get_args  # noqa: E402
from proteins_common import load_proteins  # noqa: E402


def main():
    args = get_args()
    assert args.pretrained_model, "--pretrained_model required"
    import jax

    select_platform(args)
    import jax.numpy as jnp
    import numpy as np

    from deep_gcns_torch_tpu.data.partition import (generate_sub_graphs,
                                                    random_partition_graph,
                                                    scatter_predictions)
    from deep_gcns_torch_tpu.utils.ckpt import load_ckpt
    from deep_gcns_torch_tpu.utils.metrics import roc_auc
    from deep_gcns_torch_tpu.utils.profiling import device_memory_stats

    rng = np.random.default_rng(args.seed)
    data = load_proteins(args, rng)
    n = data["num_nodes"]
    labels = data["labels"]

    model = build_model(args, data)
    p0, s0 = jax.jit(model.init)(jax.random.PRNGKey(0))
    params, state, _, meta = load_ckpt(args.pretrained_model, params_like=p0,
                                       state_like=s0)
    print(f"loaded checkpoint (epoch {meta.get('epoch')})")

    @jax.jit
    def predict(params, state, g, species, nf):
        logits, _ = model.apply(params, state, species, g, node_feats=nf,
                                train=False)
        return logits

    node_pad = ((n // args.eval_parts + 1023) // 256 + 1) * 256
    pred_sum = np.zeros((n, labels.shape[1]), np.float32)
    for e in range(args.num_evals):
        parts = random_partition_graph(np.random.default_rng(1000 + e), n,
                                       args.eval_parts)
        graphs, node_lists, feats = generate_sub_graphs(
            data["senders"], data["receivers"], parts, args.eval_parts,
            edge_attr=data["edge_attr"],
            node_feats=[data["species"], data["node_feats"]], node_pad=node_pad)
        preds = [np.asarray(predict(params, state, jax.device_put(g),
                                    jnp.asarray(f[0]), jnp.asarray(f[1])))
                 for g, f in zip(graphs, feats)]
        pred_sum += scatter_predictions(preds, node_lists, n)
        print(f"eval view {e + 1}/{args.num_evals} done")
    pred = pred_sum / args.num_evals
    for k, idx in data["splits"].items():
        print(f"{k} ROC-AUC: {roc_auc(pred[idx], labels[idx]):.4f}")
    mem = device_memory_stats()
    if mem["peak_bytes_in_use"]:
        print(f"peak device memory: {mem['peak_bytes_in_use'] / 2**20:.1f} MiB")


if __name__ == "__main__":
    main()
