"""Cluster / data parallel training over a device mesh.

TPU-native replacement for the reference's two scale mechanisms:
  * `nn.DataParallel` scatter/replicate/gather (`examples/sem_seg_dense/train.py:28`)
    → `shard_map` over the batch axis with gradient `psum` over ICI.
  * proteins' *sequential* random-partition cluster training
    (`examples/ogb/ogbn_proteins/main.py:183-187`: 10 clusters, one at a time)
    → N clusters training *simultaneously*, one per chip, gradients all-reduced —
    same SGD semantics as accumulating the 10 cluster losses, N× the throughput.

BatchNorm statistics are all-reduced across replicas via `axis_name` (the reference's
DataParallel kept per-GPU stats; cross-replica is strictly better and matches
SyncBatchNorm).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..graph import Graph


def cluster_dp_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_fn: Callable,
    mesh: Mesh,
    axis: str = "dp",
    donate: bool = True,
):
    """Build a jitted data-parallel train step.

    Args:
      model: a Module with `apply(params, state, x, g, train, rng, axis_name)`.
      tx: optax optimizer (applied to replicated params).
      loss_fn: (logits, labels, node_mask) -> scalar loss on one shard.
      mesh: 1-D device mesh with named axis `axis`.

    The returned step takes (params, state, opt_state, graphs, labels, rng) where
    `graphs`/`labels` have a leading device axis of size mesh.shape[axis]; it returns
    (params, state, opt_state, mean_loss).
    """

    def _shard_step(params, state, opt_state, g: Graph, labels, rng):
        # shard_map passes each device its [1, ...] slice; drop the leading axis.
        g = jax.tree_util.tree_map(lambda x: x[0], g)
        labels = labels[0]
        my = jax.lax.axis_index(axis)
        dev_rng = jax.random.fold_in(rng, my)

        def lossf(p):
            logits, new_state = model.apply(p, state, g.x, g, train=True,
                                            rng=dev_rng, axis_name=axis)
            return loss_fn(logits, labels, g.node_mask), new_state

        (loss, new_state), grads = jax.value_and_grad(lossf, has_aux=True)(params)
        # NB: grads of REPLICATED params inside shard_map come out ALREADY
        # psum'd across devices (the transpose of the implicit pbroadcast) —
        # lax.pmean on them is an identity on identical values, NOT a mean, so
        # the old `pmean(grads)` silently trained with D×-scaled gradients.
        # The cross-cluster mean is a plain divide; no collective needed.
        # tests/test_rev_multichip.py pins this against a sequential
        # mean-of-cluster-losses step.
        n_rep = mesh.shape[axis]
        grads = jax.tree_util.tree_map(lambda g_: g_ / n_rep, grads)
        loss = jax.lax.pmean(loss, axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss

    sharded = shard_map(
        _shard_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P()),
        out_specs=(P(), P(), P(), P()),
    )
    return jax.jit(sharded, donate_argnums=(0, 2) if donate else ())


def stack_shards(items):
    """Stack a list of host pytrees (e.g. per-cluster Graphs) along a new leading
    device axis for shard_map consumption."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *items)
