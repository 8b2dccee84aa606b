"""Capture an xprof trace of the bench train step and print the per-op breakdown."""
import glob
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

TRACE_DIR = "/tmp/step_trace"

N, DEG, C, L, K = 169_343, 14, 128, 28, 40
rng = np.random.default_rng(0)
g, labels = random_node_graph(rng, N, DEG, C, num_classes=K, self_loops=True)
g = jax.device_put(g)
labels = jnp.asarray(np.pad(labels, (0, g.num_nodes_padded - N)))

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


k = jax.random.PRNGKey(0)
out = step(params, state, opt_state, k)
jax.block_until_ready(out[-1])

os.system(f"rm -rf {TRACE_DIR}")
with jax.profiler.trace(TRACE_DIR):
    for i in range(3):
        k, sub = jax.random.split(k)
        params, state, opt_state, loss = step(params, state, opt_state, sub)
    jax.block_until_ready(loss)

# ---- parse xplane ----------------------------------------------------------
pb = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
print("xplane files:", pb)
from tensorflow.tsl.profiler.protobuf import xplane_pb2

xs = xplane_pb2.XSpace()
with open(pb[0], "rb") as f:
    xs.ParseFromString(f.read())

for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name:
        continue
    print("== plane:", plane.name)
    ev_metadata = plane.event_metadata
    stats = {}
    for line in plane.lines:
        for ev in line.events:
            md = ev_metadata[ev.metadata_id]
            name = md.name
            stats.setdefault(name, [0, 0.0])
            stats[name][0] += 1
            stats[name][1] += ev.duration_ps / 1e9  # ms
    top = sorted(stats.items(), key=lambda kv: -kv[1][1])[:45]
    tot = sum(v[1] for v in stats.values())
    print(f"total event-ms (3 steps, all lines): {tot:.1f}")
    for name, (cnt, ms) in top:
        print(f"{ms:9.2f} ms  x{cnt:5d}  {name[:110]}")
