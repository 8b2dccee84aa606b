"""Microbenchmark the DeeperGCN hot-loop components on the real chip.

Breaks the 2.46s bench step into its constituent ops to find where the
time goes (gather fwd/bwd, softmax-aggregate fwd/bwd, MLP, norm).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from deep_gcns_torch_tpu.data.synthetic import random_node_graph
from deep_gcns_torch_tpu.ops.gather import gather_src_auto
from deep_gcns_torch_tpu.ops.spmm_pallas import gen_softmax_aggregate_csr, segment_sum_csr

N, DEG, C = 169_343, 14, 128
rng = np.random.default_rng(0)
g, labels = random_node_graph(rng, N, DEG, C, num_classes=40, self_loops=True)
g = jax.device_put(g)
E = int(g.senders.shape[0])
print(f"N_pad={g.num_nodes_padded} E_pad={E}")

x32 = jnp.asarray(rng.standard_normal((g.num_nodes_padded, C)), jnp.float32)
x16 = x32.astype(jnp.bfloat16)
msgs16 = jnp.asarray(rng.standard_normal((E, C)), jnp.bfloat16)
msgs32 = msgs16.astype(jnp.float32)
t = jnp.float32(0.1)


def timeit(name, fn, *args, iters=20):
    f = jax.jit(fn)
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:42s} {dt:8.2f} ms")
    return dt


# forward ops
timeit("gather fwd (take) bf16", lambda x: jnp.take(x, jnp.minimum(g.senders, x.shape[0] - 1), axis=0), x16)
timeit("softmax_agg fwd bf16", lambda m: gen_softmax_aggregate_csr(m, g.receivers, g.row_ptr, t), msgs16)
timeit("softmax_agg fwd f32", lambda m: gen_softmax_aggregate_csr(m, g.receivers, g.row_ptr, t), msgs32)
timeit("segment_sum fwd bf16", lambda m: segment_sum_csr(m, g.receivers, g.row_ptr), msgs16)

# fwd+bwd composites
def agg_loss(m):
    return jnp.sum(gen_softmax_aggregate_csr(m, g.receivers, g.row_ptr, t))
timeit("softmax_agg fwd+bwd bf16", jax.grad(agg_loss), msgs16)

def gather_loss(x):
    return jnp.sum(gather_src_auto(x, g))
timeit("gather_csc fwd+bwd bf16", jax.grad(gather_loss), x16)

def gather_plain_loss(x):
    return jnp.sum(jnp.take(x, jnp.minimum(g.senders, x.shape[0] - 1), axis=0))
timeit("gather_plain fwd+bwd bf16", jax.grad(gather_plain_loss), x16)

# one full GENConv layer fwd+bwd
from deep_gcns_torch_tpu.convs.sparse import GENConv
conv = GENConv(C, C, aggr="softmax_sg", t=0.1, mlp_layers=1, compute_dtype="bfloat16")
p, s = conv.init(jax.random.PRNGKey(0))
def conv_loss(p, x):
    out, _ = conv.apply(p, s, x, g)
    return jnp.sum(out)
timeit("GENConv layer fwd+bwd", jax.grad(conv_loss, argnums=(0, 1)), p, x32)

# MLP-ish matmul for scale
w = jnp.asarray(rng.standard_normal((C, C)), jnp.bfloat16)
timeit("matmul N x C x C bf16", lambda x: x @ w, x16)
