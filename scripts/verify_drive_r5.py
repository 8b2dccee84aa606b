"""Round-5 verify drive: train the changed subsystem on the real TPU chip.

Usage: python scripts/verify_drive_r5.py [subsystem]
  revgat_flavor : RevGCN conv="gat" (GATBlock, now add_self_loops=False) —
                  short SBM fit, loss must drop.
  (default runs revgat_flavor)
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

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deep_gcns_torch_tpu.data import sbm_arxiv_like
    from deep_gcns_torch_tpu.models import RevGCN, RevGCNConfig
    from deep_gcns_torch_tpu.utils.loss import cross_entropy

    rng = np.random.default_rng(0)
    g, labels = sbm_arxiv_like(rng, n=2048, num_classes=8, c=32, avg_degree=10)
    g = jax.device_put(g)
    y = jnp.asarray(labels)

    cfg = RevGCNConfig(node_feat_dim=32, hidden_channels=64, num_tasks=8,
                       num_layers=6, group=2, conv="gat", heads=2,
                       norm="layer", dropout=0.1, use_one_hot_encoding=False)
    model = RevGCN(cfg)
    p, s = jax.jit(model.init)(jax.random.PRNGKey(0))
    opt = optax.adam(1e-2)
    ost = opt.init(p)

    def loss_fn(p, s, key):
        logits, s2 = model.apply(p, s, g.x, g, train=True, rng=key)
        return cross_entropy(logits, y), s2

    @jax.jit
    def step(p, s, ost, key):
        (lv, s2), gr = jax.value_and_grad(loss_fn, has_aux=True)(p, s, key)
        up, ost2 = opt.update(gr, ost, p)
        return optax.apply_updates(p, up), s2, ost2, lv

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    losses = []
    for i in range(60):
        key = jax.random.fold_in(key, i)
        p, s, ost, lv = step(p, s, ost, key)
        if i % 10 == 0 or i == 59:
            losses.append(float(lv))
            print(f"step {i:3d} loss {losses[-1]:.4f}  ({time.time()-t0:.1f}s)",
                  flush=True)
    assert losses[0] > 1.5 and losses[-1] < 0.8, losses
    print(f"OK revgat_flavor: loss {losses[0]:.3f} -> {losses[-1]:.3f} "
          f"on {jax.devices()[0].platform}")


if __name__ == "__main__":
    main()
