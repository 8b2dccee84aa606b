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


def _scale_by_radam_ref(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """Reference-exact RAdam direction (`utils/optim.py:106-142` update rule).

    Matches the reference implementation bit-for-bit in f32 (up to associativity):
      N_sma >= 5: step = lr·√((1−β2ᵗ)(N−4)/(Nmax−4)·(N−2)/N·Nmax/(Nmax−2))/(1−β1ᵗ)
                  update = step · m / (√v + eps)        [eps OUTSIDE bias correction]
      else:       update = lr/(1−β1ᵗ) · m               [un-rectified momentum]
    optax.radam differs in eps placement (eps is added to the bias-corrected √v̂),
    a ~√(1−β2ᵗ)-factor perturbation of eps; we keep the reference's exact form.
    """

    def init_fn(params):
        return {
            "step": jnp.zeros([], jnp.int32),
            "m": jax.tree.map(jnp.zeros_like, params),
            "v": jax.tree.map(jnp.zeros_like, params),
        }

    def update_fn(updates, state, params=None):
        del params
        t = state["step"] + 1
        tf = t.astype(jnp.float32)
        m = jax.tree.map(lambda mm, g: b1 * mm + (1 - b1) * g, state["m"], updates)
        v = jax.tree.map(lambda vv, g: b2 * vv + (1 - b2) * g * g, state["v"], updates)
        beta2_t = b2 ** tf
        n_sma_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * tf * beta2_t / (1.0 - beta2_t)
        bias1 = 1.0 - b1 ** tf
        safe_n = jnp.maximum(n_sma, 5.0)  # rect only used when n_sma >= 5
        rect = jnp.sqrt((1.0 - beta2_t) * (safe_n - 4.0) / (n_sma_max - 4.0)
                        * (safe_n - 2.0) / safe_n * n_sma_max / (n_sma_max - 2.0))

        def upd(mm, vv):
            rectified = rect / bias1 * mm / (jnp.sqrt(vv) + eps)
            plain = mm / bias1
            return jnp.where(n_sma >= 5.0, rectified, plain)

        new_updates = jax.tree.map(upd, m, v)
        return new_updates, {"step": t, "m": m, "v": v}

    return optax.GradientTransformation(init_fn, update_fn)


def radam(lr: float, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Reference RAdam (`utils/optim.py:76-144`): weight decay is decoupled AND
    lr-scaled — `p ← p − wd·lr·p` before the step (`utils/optim.py:129-130`) — so
    the decay term must ride inside the final −lr scaling, not be chained after it.
    """
    parts = [_scale_by_radam_ref()]
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_learning_rate(lr))  # scale(-lr)
    return optax.chain(*parts)


def adamw_warmup(lr: float, warmup_steps: int, total_steps: Optional[int] = None,
                 weight_decay: float = 0.01) -> optax.GradientTransformation:
    """AdamW with linear lr warmup; if `total_steps` is given the lr then decays
    linearly to 0 over [warmup_steps, total_steps] (standard warmup+decay ramp).
    For the reference's exact (quirky) rule see `adamw_ref`.
    """
    if total_steps is not None and total_steps > warmup_steps:
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, lr, max(warmup_steps, 1)),
             optax.linear_schedule(lr, 0.0, total_steps - warmup_steps)],
            [max(warmup_steps, 1)])
    else:
        sched = optax.linear_schedule(0.0, lr, max(warmup_steps, 1))
    return optax.adamw(sched, weight_decay=weight_decay)


def adamw_ref(lr: float, warmup: int = 0, weight_decay: float = 0.0,
              b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """Reference-exact AdamW (`utils/optim.py:146-205`). Quirk preserved: the
    warmup schedule scales ONLY the weight-decay term (`:193-202` — `step_size`
    uses the raw lr; `scheduled_lr` multiplies the decay), i.e.
      p ← p − wd·sched(t)·p − lr·√(1−β2ᵗ)/(1−β1ᵗ) · m/(√v+eps).
    """

    def init_fn(params):
        return {
            "step": jnp.zeros([], jnp.int32),
            "m": jax.tree.map(jnp.zeros_like, params),
            "v": jax.tree.map(jnp.zeros_like, params),
        }

    def update_fn(updates, state, params=None):
        t = state["step"] + 1
        tf = t.astype(jnp.float32)
        m = jax.tree.map(lambda mm, g: b1 * mm + (1 - b1) * g, state["m"], updates)
        v = jax.tree.map(lambda vv, g: b2 * vv + (1 - b2) * g * g, state["v"], updates)
        bias1 = 1.0 - b1 ** tf
        bias2 = 1.0 - b2 ** tf
        step_size = lr * jnp.sqrt(bias2) / bias1
        sched_lr = jnp.where(tf <= warmup, 1e-8 + tf * lr / max(warmup, 1), lr) \
            if warmup > 0 else jnp.asarray(lr, jnp.float32)

        def upd(mm, vv, p):
            decay = (weight_decay * sched_lr * p) if (weight_decay and p is not None) else 0.0
            return -(step_size * mm / (jnp.sqrt(vv) + eps) + decay)

        if weight_decay:
            new_updates = jax.tree.map(upd, m, v, params)
        else:
            new_updates = jax.tree.map(lambda mm, vv: upd(mm, vv, None), m, v)
        return new_updates, {"step": t, "m": m, "v": v}

    return optax.GradientTransformation(init_fn, update_fn)


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
    """torch-exact RMSprop (RevGAT, `examples/ogb_eff/ogbn_arxiv_dgl/main.py:231`):
    torch defaults alpha=0.99 and denom = sqrt(avg) + eps (eps OUTSIDE the
    sqrt), vs optax defaults decay=0.9 / eps inside; weight decay is coupled
    (added to the grad before the square-average), which the chain order
    reproduces."""
    tx = optax.rmsprop(lr, decay=0.99, eps_in_sqrt=False)
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
