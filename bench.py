"""Benchmark: DeeperGCN training throughput on the real chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Workload: full train step (fwd+bwd+Adam) of DeeperGCN-28 (GENConv softmax_sg t=0.1,
res+, batch-norm — the ogbn-arxiv headline config, `examples/ogb/README.md:34`) on an
ogbn-arxiv-sized synthetic graph (169,343 nodes / ~2.5M directed edges / 128 ch).

Metric: aggregated edge-messages per second = E_valid × num_layers / step_time —
the SpMM-rate north star from BASELINE.json. vs_baseline compares against
BENCH_BASELINE.json {"value": ...} if present (first recorded round), else 1.0.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from deep_gcns_torch_tpu.data.synthetic import random_node_graph
    from deep_gcns_torch_tpu.models import DeeperGCN, DeeperGCNConfig
    from deep_gcns_torch_tpu.utils.loss import cross_entropy

    N, DEG, C, L, K = 169_343, 14, 128, 28, 40
    rng = np.random.default_rng(0)
    g, labels = random_node_graph(rng, N, DEG, C, num_classes=K, self_loops=True)
    g = jax.device_put(g)
    labels = jnp.asarray(np.pad(labels, (0, g.num_nodes_padded - N)))
    e_valid = int(g.n_edge)

    model = DeeperGCN(DeeperGCNConfig(
        in_channels=C, hidden_channels=C, num_tasks=K, num_layers=L, block="res+",
        aggr="softmax_sg", t=0.1, norm="batch", mlp_layers=1, dropout=0.5,
        compute_dtype="bfloat16"))
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state, rng):
        def lossf(p):
            logits, s2 = model.apply(p, state, g.x, g, train=True, rng=rng)
            return cross_entropy(logits, labels, mask=g.node_mask), s2

        (loss, s2), grads = jax.value_and_grad(lossf, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), s2, opt_state2, loss

    # warmup/compile
    k = jax.random.PRNGKey(0)
    t0 = time.time()
    params, state, opt_state, loss = step(params, state, opt_state, k)
    jax.block_until_ready(loss)
    compile_s = time.time() - t0

    # The tunneled chip shows sustained multi-second noise windows (2-5x): take
    # the best of several short measurement bursts instead of one long mean.
    iters, bursts = 5, 4
    best = float("inf")
    for _ in range(bursts):
        t0 = time.time()
        for i in range(iters):
            k, sub = jax.random.split(k)
            params, state, opt_state, loss = step(params, state, opt_state, sub)
        jax.block_until_ready(loss)
        best = min(best, (time.time() - t0) / iters)
    dt = best

    edges_per_s = e_valid * L / dt
    print(f"[bench] compile={compile_s:.1f}s step={dt*1000:.1f}ms "
          f"loss={float(loss):.4f} E={e_valid} L={L}", file=sys.stderr)

    baseline = None
    if os.path.exists("BENCH_BASELINE.json"):
        try:
            baseline = json.load(open("BENCH_BASELINE.json")).get("value")
        except Exception:
            baseline = None
    vs = edges_per_s / baseline if baseline else 1.0
    print(json.dumps({
        "metric": "deepergcn28_train_edge_messages_per_s",
        "value": round(edges_per_s),
        "unit": "edges/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
