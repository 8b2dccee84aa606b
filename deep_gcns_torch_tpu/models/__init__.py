from .deeper_gcn import DeeperGCN, DeeperGCNConfig
from .rev_gcn import RevGCN, RevGCNConfig
from .deepgcn import (DeepGCNCls, DeepGCNConfig, DeepGCNStatic, DenseDeepGCN,
                      SparseDeepGCN)

__all__ = ["DeeperGCN", "DeeperGCNConfig", "RevGCN", "RevGCNConfig",
           "DeepGCNCls", "DeepGCNConfig", "DeepGCNStatic", "DenseDeepGCN",
           "SparseDeepGCN"]
