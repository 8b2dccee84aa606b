"""Optimizers & schedules built on optax, mirroring `utils/optim.py` + example apps.

* radam — rectified Adam (`utils/optim.py:6-103`): optax.radam implements the same
  rectification (Liu et al. 2020).
* adamw_warmup — AdamW with linear warmup (`utils/optim.py:106-207`).
* adam / sgd+cosine / step decay / plateau — per-example setups
  (`examples/modelnet_cls/main.py:21-27`, `examples/sem_seg_dense/train.py`,
  `examples/ppi/main.py:25`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def adam(lr: float, weight_decay: float = 0.0) -> optax.GradientTransformation:
    if weight_decay:
        return optax.adamw(lr, weight_decay=weight_decay)
    return optax.adam(lr)


def radam(lr: float, weight_decay: float = 0.0) -> optax.GradientTransformation:
    return optax.radam(lr) if not weight_decay else optax.chain(
        optax.radam(lr), optax.add_decayed_weights(weight_decay),
        optax.scale(1.0))


def adamw_warmup(lr: float, warmup_steps: int, total_steps: int,
                 weight_decay: float = 0.01) -> optax.GradientTransformation:
    sched = optax.linear_schedule(0.0, lr, max(warmup_steps, 1))
    return optax.adamw(sched, weight_decay=weight_decay)


def sgd_cosine(lr: float, total_steps: int, momentum: float = 0.9,
               weight_decay: float = 1e-4, min_lr: float = 0.0):
    sched = optax.cosine_decay_schedule(lr, max(total_steps, 1), alpha=min_lr / lr if lr else 0.0)
    return optax.chain(optax.add_decayed_weights(weight_decay),
                       optax.sgd(sched, momentum=momentum))


def sgd_step(lr: float, step_size: int, gamma: float = 0.5, momentum: float = 0.9,
             weight_decay: float = 1e-4):
    sched = optax.exponential_decay(lr, step_size, gamma, staircase=True)
    return optax.chain(optax.add_decayed_weights(weight_decay),
                       optax.sgd(sched, momentum=momentum))


def rmsprop(lr: float, weight_decay: float = 0.0):
    """RevGAT uses RMSprop (`examples/ogb_eff/ogbn_arxiv_dgl/main.py:231`)."""
    tx = optax.rmsprop(lr)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def clip_by_global_norm(tx: optax.GradientTransformation,
                        max_norm: Optional[float]) -> optax.GradientTransformation:
    """grad-norm clip 1.0 used by collab/proteins-rev (`ogbl_collab/main.py:112-113`)."""
    if not max_norm:
        return tx
    return optax.chain(optax.clip_by_global_norm(max_norm), tx)


class ReduceLROnPlateau:
    """Host-side plateau LR control (PPI: `examples/ppi/main.py:25`).

    Usage: wrap base lr in an optax.inject_hyperparams optimizer and call
    `step(metric)` each epoch; multiply opt_state hyperparams by the returned scale.
    """

    def __init__(self, factor: float = 0.5, patience: int = 10, mode: str = "max",
                 min_lr: float = 0.0):
        self.factor, self.patience, self.mode, self.min_lr = factor, patience, mode, min_lr
        self.best = None
        self.bad = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        better = (self.best is None or
                  (metric > self.best if self.mode == "max" else metric < self.best))
        if better:
            self.best = metric
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.scale = max(self.scale * self.factor, self.min_lr)
                self.bad = 0
        return self.scale
