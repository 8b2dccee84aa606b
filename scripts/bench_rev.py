"""Reversible-model step timings on the real chip.

- RevGCN deep config (101 x 80ch, group 2, proteins-like 13k-node cluster with
  edge attrs) - the RevGNN-Deep building block (BASELINE.md rows 7-10).
- RevGAT-5L at ogbn-arxiv scale (169k nodes / 2.5M edges, 256h x 3 heads).
Both exercise the fused inverse+vjp reversible backward (rev/invertible.py).
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deep_gcns_torch_tpu.data.synthetic import random_node_graph


def bursts(step, args, n=3, reps=2):
    out = step(*args)
    jax.block_until_ready(out[0])  # out[-1] is the pass-through key
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        for i in range(n):
            args = step(*args[:-1], jax.random.fold_in(args[-1], i))[:3] + (args[-1],)
        jax.block_until_ready(args[0])
        best = min(best, (time.time() - t0) / n)
    return best * 1000


def bench_revgcn():
    from deep_gcns_torch_tpu.models import RevGCN, RevGCNConfig

    rng = np.random.default_rng(0)
    g, _ = random_node_graph(rng, 13_000, 60, 8, num_classes=2, self_loops=False)
    ea = jnp.asarray(rng.standard_normal((g.num_edges_padded, 8)), jnp.float32)
    g = dataclasses.replace(g, edge_attr=ea,
                            edge_attr_csc=jnp.take(ea, g.csc_perm, axis=0))
    g = jax.device_put(g)
    labels = jnp.asarray(rng.integers(0, 2, (g.num_nodes_padded, 112)).astype(np.float32))
    sp = jax.nn.one_hot(jnp.asarray(rng.integers(0, 8, g.num_nodes_padded)), 8)
    nf = jnp.asarray(rng.standard_normal((g.num_nodes_padded, 8)), jnp.float32)

    model = RevGCN(RevGCNConfig(
        in_channels=8, node_feat_dim=8, edge_feat_dim=8, hidden_channels=80,
        num_tasks=112, num_layers=101, group=2, aggr="softmax", norm="layer",
        mlp_layers=1, dropout=0.1, conv_encode_edge=True,
        use_one_hot_encoding=True, compute_dtype="bfloat16"))
    p, s = jax.jit(model.init)(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    opt = tx.init(p)

    @jax.jit
    def step(p, s, opt, key):
        def lossf(p):
            logits, s2 = model.apply(p, s, sp, g, node_feats=nf, train=True, rng=key)
            bce = optax.sigmoid_binary_cross_entropy(logits, labels)
            return jnp.sum(bce * g.node_mask[:, None]) / jnp.sum(g.node_mask) / 112, s2
        (l, s2), gr = jax.value_and_grad(lossf, has_aux=True)(p)
        up, opt2 = tx.update(gr, opt, p)
        return optax.apply_updates(p, up), s2, opt2, l

    def stepw(p, s, opt, key):
        p2, s2, o2, l = step(p, s, opt, key)
        return (p2, s2, o2, key)

    ms = bursts(stepw, (p, s, opt, jax.random.PRNGKey(1)))
    print(f"RevGCN-101x80 (13k nodes / 780k edges, edge attrs): {ms:.0f} ms/step")


def bench_revgat():
    from deep_gcns_torch_tpu.models.rev_gat import RevGAT, RevGATConfig

    rng = np.random.default_rng(0)
    g, labels = random_node_graph(rng, 169_343, 14, 128, num_classes=40,
                                  self_loops=True)
    g = jax.device_put(g)
    labels_full = jnp.asarray(np.pad(labels, (0, g.num_nodes_padded - len(labels))))
    cfg = RevGATConfig(in_feats=128 + 40, n_classes=40, n_layers=5, n_hidden=256,
                       n_heads=3, dropout=0.75, input_drop=0.25, edge_drop=0.3,
                       compute_dtype="bfloat16")
    model = RevGAT(cfg)
    p, s = jax.jit(model.init)(jax.random.PRNGKey(0))
    onehot = jax.nn.one_hot(labels_full, 40) * g.node_mask[:, None]
    x_in = jnp.concatenate([g.x, onehot], axis=1)
    tx = optax.adamw(5e-4)
    opt = tx.init(p)

    @jax.jit
    def step(p, s, opt, key):
        def lossf(p):
            logits, s2 = model.apply(p, s, x_in, g, train=True, rng=key)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels_full)
            return jnp.sum(ce * g.node_mask) / jnp.sum(g.node_mask), s2
        (l, s2), gr = jax.value_and_grad(lossf, has_aux=True)(p)
        up, opt2 = tx.update(gr, opt, p)
        return optax.apply_updates(p, up), s2, opt2, l

    def stepw(p, s, opt, key):
        p2, s2, o2, l = step(p, s, opt, key)
        return (p2, s2, o2, key)

    ms = bursts(stepw, (p, s, opt, jax.random.PRNGKey(1)))
    print(f"RevGAT-5L (169k nodes / 2.5M edges, 256h x 3): {ms:.0f} ms/step")


if __name__ == "__main__":
    if "--gat-only" not in sys.argv:
        bench_revgcn()
    if "--gcn-only" not in sys.argv:
        bench_revgat()
