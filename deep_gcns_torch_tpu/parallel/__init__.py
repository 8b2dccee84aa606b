from .mesh import make_mesh
from .data_parallel import cluster_dp_train_step
from .spatial import (SpatialDeeperGCN, shard_graph, shard_nodes,
                      spatial_forward, spatial_train_step)
from .spatial_rev import (SpatialRevGCN, spatial_rev_forward,
                          spatial_rev_train_step)
from .tensor import (TPDeeperGCN, shard_deeper_params, tp_forward,
                     tp_train_step, unshard_deeper_params)
from .spatial_tp import (SpatialTPDeeperGCN, spatial_tp_forward,
                         spatial_tp_train_step)
from .tensor_rev import (TPRevGCN, make_tp_mask, shard_rev_params,
                         tp_rev_forward, tp_rev_train_step,
                         unshard_rev_params)

__all__ = ["make_mesh", "cluster_dp_train_step", "SpatialDeeperGCN",
           "shard_graph", "shard_nodes", "spatial_forward",
           "spatial_train_step", "SpatialRevGCN", "spatial_rev_forward",
           "spatial_rev_train_step", "TPDeeperGCN", "shard_deeper_params",
           "tp_forward", "tp_train_step", "unshard_deeper_params",
           "SpatialTPDeeperGCN", "spatial_tp_forward",
           "spatial_tp_train_step", "TPRevGCN", "make_tp_mask",
           "shard_rev_params", "tp_rev_forward", "tp_rev_train_step",
           "unshard_rev_params"]
