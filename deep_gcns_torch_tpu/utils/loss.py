"""Losses mirroring the reference's set.

* smooth_cross_entropy — `utils/loss.py:5-24` (label smoothing eps=0.2,
  ModelNet40 classification `examples/modelnet_cls/main.py:21`).
* nll / cross entropy on logits — arxiv/ppa (`examples/ogb/ogbn_arxiv/main.py:44`).
* bce_with_logits (+ NaN-masking `is_labeled`) — proteins / molpcba
  (`examples/ogb_eff/ogbn_proteins/main.py:49`, `examples/ogb/ogbg_mol/main.py:26-30`).
* kd_loss — RevGAT self-knowledge-distillation
  (`examples/ogb_eff/ogbn_arxiv_dgl/loss.py:20-26`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def cross_entropy(logits: Array, labels: Array, mask: Optional[Array] = None) -> Array:
    """Mean CE over (masked) rows; labels are int classes. Equals NLL(log_softmax)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if mask is None:
        return jnp.mean(nll)
    m = mask.astype(nll.dtype)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def smooth_cross_entropy(logits: Array, labels: Array, smoothing: float = 0.2,
                         mask: Optional[Array] = None) -> Array:
    """SmoothCrossEntropy (`utils/loss.py:5-24`): one-hot*(1-eps) + eps/K."""
    k = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    one_hot = jax.nn.one_hot(labels, k, dtype=logp.dtype)
    target = one_hot * (1.0 - smoothing) + smoothing / k
    loss = -jnp.sum(target * logp, axis=-1)
    if mask is None:
        return jnp.mean(loss)
    m = mask.astype(loss.dtype)
    return jnp.sum(loss * m) / jnp.maximum(jnp.sum(m), 1.0)


def bce_with_logits(logits: Array, targets: Array,
                    mask: Optional[Array] = None) -> Array:
    """Mean binary cross entropy on logits. `mask` covers rows AND/OR individual
    labels (NaN-labeled entries à la ogbg-mol `is_labeled`)."""
    targets = jnp.nan_to_num(targets)
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if mask is None:
        return jnp.mean(per)
    m = jnp.broadcast_to(mask.astype(per.dtype).reshape(mask.shape + (1,) * (per.ndim - mask.ndim)), per.shape)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


def kd_loss(student_logits: Array, teacher_logits: Array, temperature: float = 0.7,
            mask: Optional[Array] = None) -> Array:
    """KL(student ‖ teacher) at temperature T·(T²) — RevGAT self-KD
    (`examples/ogb_eff/ogbn_arxiv_dgl/loss.py`)."""
    t = temperature
    sp = jax.nn.log_softmax(student_logits / t, axis=-1)
    tp = jax.nn.softmax(teacher_logits / t, axis=-1)
    per = jnp.sum(tp * (jnp.log(jnp.maximum(tp, 1e-12)) - sp), axis=-1) * (t * t)
    if mask is None:
        return jnp.mean(per)
    m = mask.astype(per.dtype)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)
