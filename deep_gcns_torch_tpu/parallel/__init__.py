from .mesh import make_mesh
from .data_parallel import cluster_dp_train_step

__all__ = ["make_mesh", "cluster_dp_train_step"]
