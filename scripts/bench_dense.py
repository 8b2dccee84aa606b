"""Dense point-cloud path timing on the real chip: DenseDeepGCN (S3DIS
ResEdgeConv-28, B=8 x 4096 pts, k=16) and DeepGCNCls (ModelNet40, B=32 x 1024,
k=9) full train steps."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deep_gcns_torch_tpu.models import DenseDeepGCN, DeepGCNCls, DeepGCNConfig


def bench(name, model, x, labels, steps=8):
    p, s = jax.jit(model.init)(jax.random.PRNGKey(0))
    tx = optax.sgd(1e-3)
    opt = tx.init(p)

    @jax.jit
    def step(p, s, opt, key):
        def lossf(p):
            logits, s2 = model.apply(p, s, x, train=True, rng=key)
            # seg logits [B, N, cls] / cls logits [B, cls]: same masked mean
            return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                logits, labels)), s2
        (l, s2), gr = jax.value_and_grad(lossf, has_aux=True)(p)
        up, opt2 = tx.update(gr, opt, p)
        return optax.apply_updates(p, up), s2, opt2, l

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    out = step(p, s, opt, key)
    jax.block_until_ready(out[3])
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for i in range(steps):
            p, s, opt, l = step(p, s, opt, jax.random.fold_in(key, i))
        jax.block_until_ready(l)
        best = min(best, (time.time() - t0) / steps)
    print(f"{name}: compile {compile_s:.1f}s  step {best*1000:.1f} ms  loss {float(l):.3f}",
          flush=True)


rng = np.random.default_rng(0)
if "--cls-only" not in sys.argv:
    B, N = 8, 4096
    x = jnp.asarray(rng.standard_normal((B, N, 9)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 13, (B, N)))
    for meth, cdt in (("exact", None), ("approx", None), ("approx", "bfloat16")):
        if "--approx-only" in sys.argv and meth == "exact":
            continue
        m = DenseDeepGCN(DeepGCNConfig(in_channels=9, n_classes=13, n_filters=64,
                                       n_blocks=28, conv="edge", k=16, block="res",
                                       knn_method=meth, compute_dtype=cdt))
        bench(f"sem_seg_dense B8xN4096 k16 L28 knn={meth} cd={cdt}", m, x, y)

B, N = 32, 1024
x = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
y = jnp.asarray(rng.integers(0, 40, (B,)))
for meth, cdt in (("exact", None), ("approx", None), ("approx", "bfloat16")):
    m = DeepGCNCls(DeepGCNConfig(in_channels=3, n_classes=40, n_filters=64,
                                 n_blocks=14, conv="edge", k=9, block="res",
                                 knn_method=meth, compute_dtype=cdt))
    bench(f"modelnet_cls B32xN1024 k9 L14 knn={meth} cd={cdt}", m, x, y)
