"""Ablation timing of the bench workload: where do the 660ms go?

Runs the DeeperGCN-28 arxiv-sized train step under config variations and
prints deltas. Use on the real chip.
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
from deep_gcns_torch_tpu.models import DeeperGCN, DeeperGCNConfig
from deep_gcns_torch_tpu.utils.loss import cross_entropy

N, DEG, C, L, K = 169_343, 14, 128, 28, 40
rng = np.random.default_rng(0)
g, labels = random_node_graph(rng, N, DEG, C, num_classes=K, self_loops=True)
g = jax.device_put(g)
labels = jnp.asarray(np.pad(labels, (0, g.num_nodes_padded - N)))


def time_step(name, cfg, iters=10, train=True):
    model = DeeperGCN(cfg)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    if train:
        @jax.jit
        def step(params, state, opt_state, rng):
            def lossf(p):
                logits, s2 = model.apply(p, state, g.x, g, train=True, rng=rng)
                return cross_entropy(logits, labels, mask=g.node_mask), s2

            (loss, s2), grads = jax.value_and_grad(lossf, has_aux=True)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), s2, opt_state2, loss

        k = jax.random.PRNGKey(0)
        out = step(params, state, opt_state, k)
        jax.block_until_ready(out[-1])
        t0 = time.time()
        for i in range(iters):
            k, sub = jax.random.split(k)
            params, state, opt_state, loss = step(params, state, opt_state, sub)
        jax.block_until_ready(loss)
    else:
        @jax.jit
        def fwd(params, state):
            logits, _ = model.apply(params, state, g.x, g, train=False)
            return logits

        out = fwd(params, state)
        jax.block_until_ready(out)
        t0 = time.time()
        for i in range(iters):
            out = fwd(params, state)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:48s} {dt:8.1f} ms")
    return dt


base = dict(in_channels=C, hidden_channels=C, num_tasks=K, num_layers=L,
            block="res+", aggr="softmax_sg", t=0.1, norm="batch", mlp_layers=1,
            dropout=0.5, compute_dtype="bfloat16")

time_step("baseline (train)", DeeperGCNConfig(**base))
time_step("eval fwd only", DeeperGCNConfig(**base), train=False)
time_step("dropout=0", DeeperGCNConfig(**{**base, "dropout": 0.0}))
time_step("norm=layer", DeeperGCNConfig(**{**base, "norm": "layer"}))
time_step("aggr=add", DeeperGCNConfig(**{**base, "aggr": "add"}))
time_step("aggr=max", DeeperGCNConfig(**{**base, "aggr": "max"}))
time_step("aggr=mean", DeeperGCNConfig(**{**base, "aggr": "mean"}))
time_step("L=14", DeeperGCNConfig(**{**base, "num_layers": 14}))
time_step("L=7", DeeperGCNConfig(**{**base, "num_layers": 7}))
time_step("f32 compute", DeeperGCNConfig(**{**base, "compute_dtype": "float32"}))
time_step("mlp_layers=2", DeeperGCNConfig(**{**base, "mlp_layers": 2}))
