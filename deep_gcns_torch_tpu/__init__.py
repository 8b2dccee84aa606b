"""deep_gcns_torch_tpu — a TPU-native GNN framework with the capabilities of
lightaime/deep_gcns_torch (DeepGCN / DeeperGCN / RevGNN), rebuilt from scratch on
JAX/XLA/Pallas.

Layout (mirrors SURVEY.md §7 build plan):
  graph        — padded, statically-shaped Graph container (COO sorted by receiver + CSR)
  ops          — segment reductions / softmax, SpMM Pallas kernels, kNN construction
  nn           — functional module core: Linear/MLP/norm/act factories, encoders
  convs        — sparse (N×C) and dense (B×N×C) graph conv zoo + blocks
  rev          — grouped reversible coupling + O(1)-memory custom_vjp engine
  models       — DeeperGCN, DeepGCN (ppi/cls/seg), DenseDeepGCN, RevGCN, RevGAT
  parallel     — mesh helpers, data-parallel and edge-partition (halo) training
  utils        — optimizers, losses, metrics, checkpointing, logging, configs
  data         — synthetic graphs + dataset pipelines (OGB / point clouds)
"""

__version__ = "0.1.0"

from . import graph
from .graph import Graph

__all__ = ["Graph", "graph", "__version__"]
