"""Price the bf16 residual-carry option on the ER bench workload (the open
accounting question from round 3: the f32-carry parity choice was declined
qualitatively, never measured).  Runs the exact bench ER step with
residual_dtype float32 vs bfloat16 and prints both.

Usage: python scripts/tune_carry.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    assert jax.devices()[0].platform == "tpu"

    from deep_gcns_torch_tpu.data.synthetic import random_node_graph
    from deep_gcns_torch_tpu.models import DeeperGCN, DeeperGCNConfig
    from deep_gcns_torch_tpu.utils.loss import cross_entropy

    N, DEG, C, L, K = 169_343, 14, 128, 28, 40
    rng = np.random.default_rng(0)
    g, labels = random_node_graph(rng, N, DEG, C, num_classes=K,
                                  self_loops=True)
    g = jax.device_put(g)
    labels = jnp.asarray(np.pad(labels, (0, g.num_nodes_padded - N)))

    for carry in ("float32", "bfloat16"):
        model = DeeperGCN(DeeperGCNConfig(
            in_channels=C, hidden_channels=C, num_tasks=K, num_layers=L,
            block="res+", aggr="softmax_sg", t=0.1, norm="batch",
            mlp_layers=1, dropout=0.5, compute_dtype="bfloat16",
            residual_dtype=carry))
        params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
        tx = optax.adam(1e-2)
        opt = tx.init(params)

        @jax.jit
        def step(params, state, opt, rng_):
            def lossf(p):
                logits, s2 = model.apply(p, state, g.x, g, train=True,
                                         rng=rng_)
                return cross_entropy(logits, labels, mask=g.node_mask), s2
            (loss, s2), grads = jax.value_and_grad(lossf, has_aux=True)(params)
            up, opt2 = tx.update(grads, opt, params)
            return optax.apply_updates(params, up), s2, opt2, loss

        k = jax.random.PRNGKey(0)
        t0 = time.time()
        params, state, opt, loss = step(params, state, opt, k)
        jax.block_until_ready(loss)
        comp = time.time() - t0
        best = 1e9
        for b in range(4):
            t0 = time.time()
            for i in range(5):
                k, sub = jax.random.split(k)
                params, state, opt, loss = step(params, state, opt, sub)
            lv = float(loss)
            best = min(best, (time.time() - t0) / 5)
        print(f"[carry={carry}] compile={comp:.1f}s step={best*1e3:.1f}ms "
              f"loss={lv:.4f}", file=sys.stderr)
    print("OK", file=sys.stderr)


if __name__ == "__main__":
    main()
