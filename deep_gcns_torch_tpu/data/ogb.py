"""OGB dataset loading, gated on availability.

This image has no network egress, so the `ogb` package / dataset downloads are not
available; loaders accept either (a) a local preprocessed `.npz` cache, or (b) fall
back with a clear error telling the caller to pass --synthetic.  The npz schema is
what `scripts/preprocess_ogb.py` would produce from a machine with the datasets.

Reference entry points being mirrored: `PygNodePropPredDataset` use at
`examples/ogb/ogbn_arxiv/main.py:61-75`, proteins species/edge handling at
`examples/ogb/ogbn_proteins/dataset.py:17-109`.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np


@dataclass
class NodeDataset:
    name: str
    x: Optional[np.ndarray]          # node features
    labels: np.ndarray               # [N] int or [N, T] float
    senders: np.ndarray
    receivers: np.ndarray
    edge_attr: Optional[np.ndarray]
    splits: Dict[str, np.ndarray]    # train/valid/test node index arrays
    num_tasks: int


def load_ogb_node(name: str, root: str = "data/") -> NodeDataset:
    """Load `{root}/{name}.npz` (preprocessed cache) or try the ogb package."""
    path = os.path.join(root, name.replace("-", "_") + ".npz")
    if os.path.exists(path):
        z = np.load(path, allow_pickle=True)
        return NodeDataset(
            name=name,
            x=z["x"] if "x" in z else None,
            labels=z["labels"],
            senders=z["senders"],
            receivers=z["receivers"],
            edge_attr=z["edge_attr"] if "edge_attr" in z else None,
            splits={k: z[f"split_{k}"] for k in ("train", "valid", "test")},
            num_tasks=int(z["num_tasks"]),
        )
    try:  # pragma: no cover - ogb not installed in this image
        from ogb.nodeproppred import NodePropPredDataset

        ds = NodePropPredDataset(name=name, root=root)
        graph, labels = ds[0]
        split = ds.get_idx_split()
        return NodeDataset(
            name=name,
            x=graph.get("node_feat"),
            labels=np.asarray(labels).squeeze(),
            senders=graph["edge_index"][0],
            receivers=graph["edge_index"][1],
            edge_attr=graph.get("edge_feat"),
            splits={k: np.asarray(v) for k, v in split.items()},
            num_tasks=int(getattr(ds, "num_tasks", 1) or 1),
        )
    except ImportError as e:
        raise FileNotFoundError(
            f"No local cache at {path} and the `ogb` package is unavailable "
            f"(no network egress). Run with --synthetic, or place a preprocessed "
            f"npz cache at {path}.") from e


def extract_node_features_from_edges(senders, receivers, edge_attr, num_nodes,
                                     aggr: str = "add") -> np.ndarray:
    """Proteins: node features = scatter(edge features → receiver)
    (`examples/ogb/ogbn_proteins/dataset.py:68-85`)."""
    out = np.zeros((num_nodes, edge_attr.shape[1]), np.float32)
    np.add.at(out, receivers, edge_attr)
    if aggr == "mean":
        cnt = np.bincount(receivers, minlength=num_nodes).reshape(-1, 1)
        out = out / np.maximum(cnt, 1)
    return out
