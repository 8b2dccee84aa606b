"""Device-mesh helpers.

The reference's only parallelism is single-host `nn.DataParallel`
(`examples/sem_seg_dense/train.py:28`, `examples/ppi/main.py:130`). Here the TPU-native
replacement is a `jax.sharding.Mesh` + `shard_map`: data/cluster parallelism over the
'dp' axis, with graph-spatial (halo) parallelism over 'gp' (see graph_partition.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axes: Tuple[str, ...] = ("dp",), shape: Optional[Tuple[int, ...]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axes)
