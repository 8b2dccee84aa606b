"""RevGCN (GNN-1000) on ogbn-proteins — O(1)-memory reversible training.

Rebuild of `examples/ogb_eff/ogbn_proteins/main.py` + `model_rev.py`
(RevGNN-Deep: 1001 layers × 80 ch, group 2 → 87.74 ± 0.13 ROC-AUC;
RevGNN-Wide: 448 × 224 → 88.24 ± 0.15; `examples/ogb_eff/ogbn_proteins/README.md`).
Run: python examples/ogb_eff/ogbn_proteins/main.py --synthetic --num_layers 28 --epochs 5
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from common import (add_deeper_gcn_flags, add_spatial_flags,  # noqa: E402
                    apply_spatial_env, base_parser)
from proteins_common import run_proteins  # noqa: E402


def get_args():
    p = base_parser("RevGCN on ogbn-proteins (TPU)")
    add_deeper_gcn_flags(p, num_layers=1001, hidden=80, norm="layer", t=1.0,
                         aggr="softmax")
    p.add_argument("--backbone", type=str, default="rev")
    p.add_argument("--group", type=int, default=2)
    p.add_argument("--num_tasks", type=int, default=112)
    p.add_argument("--cluster_number", type=int, default=10)
    p.add_argument("--partition", type=str, default="random",
                   choices=["random", "locality"],
                   help="random = reference semantics (`utils/data_util.py:43-45`); locality = greedy-cluster partition keeping far more intra-cluster edges per epoch")
    p.add_argument("--eval_parts", type=int, default=5)
    p.add_argument("--num_evals", type=int, default=1)
    p.add_argument("--eval_every", type=int, default=5)
    p.add_argument("--conv_encode_edge", action="store_true", default=True)
    p.add_argument("--use_one_hot_encoding", action="store_true", default=True)
    p.add_argument("--synthetic_degree", type=int, default=30)
    add_spatial_flags(p)
    p.set_defaults(epochs=2000, lr=0.001, dropout=0.1)
    return apply_spatial_env(p.parse_args())


def build_model(args, data):
    from deep_gcns_torch_tpu.models import RevGCN, RevGCNConfig

    return RevGCN(RevGCNConfig(
        in_channels=8, node_feat_dim=8, edge_feat_dim=8,
        hidden_channels=args.hidden_channels, num_tasks=args.num_tasks,
        num_layers=args.num_layers, group=args.group, aggr=args.gcn_aggr,
        t=args.t, learn_t=args.learn_t, p=args.p, learn_p=args.learn_p,
        y=args.y, learn_y=args.learn_y, msg_norm=args.msg_norm,
        learn_msg_scale=args.learn_msg_scale, conv_encode_edge=args.conv_encode_edge,
        norm=args.norm, mlp_layers=args.mlp_layers, dropout=args.dropout,
        use_one_hot_encoding=args.use_one_hot_encoding,
        compute_dtype=args.compute_dtype))


if __name__ == "__main__":
    run_proteins(get_args(), build_model, "revgcn_proteins")
