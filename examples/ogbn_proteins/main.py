"""DeeperGCN on ogbn-proteins — cluster-partition training, multi-partition eval.

Rebuild of `examples/ogb/ogbn_proteins/main.py` (headline DyResGEN-112: res+,
softmax, learn_t, dropout 0.1 → 0.8580 ± 0.0017 ROC-AUC, `examples/ogb/README.md:33`).
Run: python examples/ogbn_proteins/main.py --synthetic --epochs 10
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from common import (add_deeper_gcn_flags, add_spatial_flags,  # noqa: E402
                    apply_spatial_env, base_parser)
from proteins_common import run_proteins  # noqa: E402


def get_args():
    p = base_parser("DeeperGCN on ogbn-proteins (TPU)")
    add_deeper_gcn_flags(p, num_layers=112, hidden=64, norm="layer", t=1.0,
                         aggr="softmax")
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
    p.set_defaults(epochs=1000, lr=0.01, dropout=0.1)
    return apply_spatial_env(p.parse_args())


def build_model(args, data):
    from deep_gcns_torch_tpu.models import DeeperGCN, DeeperGCNConfig

    return DeeperGCN(DeeperGCNConfig(
        in_channels=8, hidden_channels=args.hidden_channels,
        num_tasks=args.num_tasks, num_layers=args.num_layers, block=args.block,
        aggr=args.gcn_aggr, t=args.t, learn_t=args.learn_t, p=args.p,
        learn_p=args.learn_p, y=args.y, learn_y=args.learn_y,
        msg_norm=args.msg_norm, learn_msg_scale=args.learn_msg_scale,
        norm=args.norm, mlp_layers=args.mlp_layers, dropout=args.dropout,
        edge_mode="per_layer" if args.conv_encode_edge else "one_time",
        edge_feat_dim=8, use_one_hot_encoding=args.use_one_hot_encoding,
        node_feat_dim=8, final_dropout=False, compute_dtype=args.compute_dtype,
        remat=getattr(args, "remat", False)))


if __name__ == "__main__":
    run_proteins(get_args(), build_model, "ogbn_proteins")
