"""Sweep (BN, CHUNK) for the fused softmax-aggregation kernel pair on the real
chip at bench shapes. Best-of-burst timing to ride out tunnel noise."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from deep_gcns_torch_tpu.data.synthetic import random_node_graph
from deep_gcns_torch_tpu.ops import spmm_pallas as sp

N, DEG, C = 169_343, 14, 128
rng = np.random.default_rng(0)
g, _ = random_node_graph(rng, N, DEG, C, num_classes=40, self_loops=True)
g = jax.device_put(g)
x16 = jnp.asarray(rng.standard_normal((g.num_nodes_padded, C)), jnp.bfloat16)
t = jnp.float32(0.1)


def timeit(fn, *args, iters=10, bursts=3):
    f = jax.jit(fn)
    o = f(*args)
    jax.block_until_ready(o)
    best = float("inf")
    for _ in range(bursts):
        t0 = time.time()
        for _ in range(iters):
            o = f(*args)
        jax.block_until_ready(o)
        best = min(best, (time.time() - t0) / iters * 1000)
    return best


def fused_fwd(x):
    return sp.fused_softmax_gather_agg(
        x, g.senders, g.receivers, g.row_ptr, g.csc_senders, g.csc_receivers,
        g.csc_col_ptr, t)


def fused_loss(x):
    return jnp.sum(fused_fwd(x).astype(jnp.float32))


results = []
for bn in (64, 128, 256):
    for chunk in (512, 1024, 2048):
        if g.num_edges_padded % chunk or g.num_nodes_padded % bn:
            continue
        # CHUNK stays the route-gate alignment; CHUNK_WIDE drives _pick_chunk
        sp.BN, sp.CHUNK_WIDE = bn, chunk
        sp.CHUNK = min(chunk, 512)
        try:
            f = timeit(fused_fwd, x16)
            b = timeit(jax.grad(fused_loss), x16)
            print(f"BN={bn:4d} CHUNK={chunk:5d}  fwd {f:7.2f} ms   fwd+bwd {b:7.2f} ms",
                  flush=True)
            results.append((b, f, bn, chunk))
        except Exception as e:
            print(f"BN={bn:4d} CHUNK={chunk:5d}  FAILED: {str(e)[:120]}", flush=True)

results.sort()
print("\nbest:", results[0])
