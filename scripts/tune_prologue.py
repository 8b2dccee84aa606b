"""Measure the res+ prologue options on the real chip (best-of-burst timing).

Variants: checkpointed prologue (default), un-checkpointed (residuals stored,
no BN-stats/RNG recompute in the backward). Both ER and banded workloads.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deep_gcns_torch_tpu.data.synthetic import random_node_graph
from deep_gcns_torch_tpu.graph import attach_band, build_graph
from deep_gcns_torch_tpu.models import DeeperGCN, DeeperGCNConfig
from deep_gcns_torch_tpu.utils.loss import cross_entropy

N, DEG, C, L, K = 169_343, 14, 128, 28, 40
rng = np.random.default_rng(0)
g_er, labels_er = random_node_graph(rng, N, DEG, C, num_classes=K,
                                    self_loops=True)

s = rng.integers(0, N, N * (DEG + 1))
r = np.clip(s + rng.integers(-256, 257, N * (DEG + 1)), 0, N - 1)
x = rng.standard_normal((N, C)).astype(np.float32)
g_band = attach_band(build_graph(x, s, r, num_nodes=N))
labels_band = rng.integers(0, K, N)


def measure(name, g, labels, ckpt):
    band = g.band
    g_const = jax.device_put(g.replace(band=None))
    band = jax.device_put(band) if band is not None else None
    lab = jnp.asarray(np.pad(labels, (0, g.num_nodes_padded - N)))
    model = DeeperGCN(DeeperGCNConfig(
        in_channels=C, hidden_channels=C, num_tasks=K, num_layers=L,
        block="res+", aggr="softmax_sg", t=0.1, norm="batch", mlp_layers=1,
        dropout=0.5, compute_dtype="bfloat16", checkpoint_prologue=ckpt))
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state, band, rng_):
        gg = g_const.replace(band=band)

        def lossf(p):
            logits, s2 = model.apply(p, state, gg.x, gg, train=True, rng=rng_)
            return cross_entropy(logits, lab, mask=gg.node_mask), s2

        (loss, s2), grads = jax.value_and_grad(lossf, has_aux=True)(params)
        upd, o2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), s2, o2, loss

    k = jax.random.PRNGKey(0)
    params, state, opt_state, loss = step(params, state, opt_state, band, k)
    float(loss)
    best = float("inf")
    for b in range(4):
        t0 = time.time()
        for i in range(5):
            k, sub = jax.random.split(k)
            params, state, opt_state, loss = step(params, state, opt_state,
                                                  band, sub)
        lv = float(loss)
        best = min(best, (time.time() - t0) / 5)
    print(f"{name:40s} {best * 1e3:8.1f} ms  (loss {lv:.4f})", flush=True)
    return best


measure("ER ckpt-prologue (current)", g_er, labels_er, True)
measure("ER no-ckpt", g_er, labels_er, False)
measure("band ckpt-prologue (current)", g_band, labels_band, True)
measure("band no-ckpt", g_band, labels_band, False)
