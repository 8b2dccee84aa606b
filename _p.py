"""RevGAT-5L arxiv-scale train step timing (256h x 3 heads, bf16)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np, optax
from deep_gcns_torch_tpu.data.synthetic import random_node_graph
from deep_gcns_torch_tpu.models.rev_gat import RevGAT, RevGATConfig

N, DEG = 169_343, 14
rng = np.random.default_rng(0)
g, labels = random_node_graph(rng, N, DEG, 128, num_classes=40, self_loops=True)
g = jax.device_put(g)
labels_full = jnp.asarray(np.pad(labels, (0, g.num_nodes_padded - N)))

cfg = RevGATConfig(in_feats=128 + 40, n_classes=40, n_layers=5, n_hidden=256,
                   n_heads=3, dropout=0.75, input_drop=0.25, edge_drop=float(sys.argv[1]) if len(sys.argv) > 1 else 0.3,
                   compute_dtype="bfloat16")
model = RevGAT(cfg)
p, s = jax.jit(model.init)(jax.random.PRNGKey(0))
onehot = jax.nn.one_hot(labels_full, 40) * g.node_mask[:, None]
x_in = jnp.concatenate([g.x, onehot], axis=1)
tx = optax.adamw(2e-3); opt = tx.init(p)

@jax.jit
def step(p, s, opt, key):
    def lossf(p):
        logits, s2 = model.apply(p, s, x_in, g, train=True, rng=key)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels_full)
        return jnp.sum(ce * g.node_mask) / jnp.sum(g.node_mask), s2
    (l, s2), gr = jax.value_and_grad(lossf, has_aux=True)(p)
    up, opt2 = tx.update(gr, opt, p)
    return optax.apply_updates(p, up), s2, opt2, l

k = jax.random.PRNGKey(1)
t0 = time.time(); out = step(p, s, opt, k); jax.block_until_ready(out[-1])
print(f"compile {time.time()-t0:.1f}s")

best = 1e9
for _ in range(3):
    t0 = time.time()
    for i in range(5):
        p, s, opt, l = step(p, s, opt, jax.random.fold_in(k, i))
    jax.block_until_ready(l)
    best = min(best, (time.time()-t0)/5)
print(f"RevGAT-5L step {best*1000:.0f} ms  loss {float(l):.3f}")
