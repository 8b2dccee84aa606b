"""On-chip parity + perf check for the fused softmax gather-aggregate path.

Compares the Pallas fused op (compiled, real TPU) against the XLA reference
chain for forward and gradients, then times fwd and fwd+bwd.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from deep_gcns_torch_tpu.data.synthetic import random_node_graph
from deep_gcns_torch_tpu.ops import segment as seg
from deep_gcns_torch_tpu.ops import spmm_pallas as sp

N, DEG, C = 169_343, 14, 128
rng = np.random.default_rng(0)
g, _ = random_node_graph(rng, N, DEG, C, num_classes=40, self_loops=True)
g = jax.device_put(g)
E = int(g.senders.shape[0])
x32 = jnp.asarray(rng.standard_normal((g.num_nodes_padded, C)), jnp.float32)
t0 = jnp.float32(0.1)

args = (g.senders, g.receivers, g.row_ptr, g.csc_senders, g.csc_receivers,
        g.csc_col_ptr)


def xla_ref(x, t):
    xj = jnp.take(x, jnp.minimum(g.senders, g.num_nodes_padded - 1), axis=0)
    m = jax.nn.relu(xj) + 1e-7
    return seg.generalized_aggregate(m, g.receivers, g.num_nodes_padded,
                                     aggr="softmax", t=t, mask=g.edge_mask,
                                     row_ptr=None, use_pallas=False)


for gw in (False, True):
    def f_fused(x, t):
        return jnp.sum(sp.fused_softmax_gather_agg(x, *args, t, None, None, 1e-7, gw) ** 2)

    def f_xla(x, t):
        out = seg.generalized_aggregate(
            jax.nn.relu(jnp.take(x, jnp.minimum(g.senders, g.num_nodes_padded - 1),
                                 axis=0)) + 1e-7,
            g.receivers, g.num_nodes_padded, aggr="softmax", t=t, learn_t=gw,
            mask=g.edge_mask, use_pallas=False)
        return jnp.sum(out ** 2)

    o1 = jax.jit(lambda x, t: sp.fused_softmax_gather_agg(x, *args, t, None, None, 1e-7, gw))(x32, t0)
    o2 = jax.jit(xla_ref)(x32, t0)
    err = float(jnp.max(jnp.abs(o1 - o2)) / (jnp.max(jnp.abs(o2)) + 1e-9))
    gx1, gt1 = jax.jit(jax.grad(f_fused, argnums=(0, 1)))(x32, t0)
    gx2, gt2 = jax.jit(jax.grad(f_xla, argnums=(0, 1)))(x32, t0)
    gerr = float(jnp.max(jnp.abs(gx1 - gx2)) / (jnp.max(jnp.abs(gx2)) + 1e-9))
    terr = abs(float(gt1) - float(gt2)) / (abs(float(gt2)) + 1e-9)
    print(f"grad_weights={gw}: fwd rel-err {err:.2e}  dx rel-err {gerr:.2e}  "
          f"dt rel-err {terr:.2e}")

# perf: bf16
x16 = x32.astype(jnp.bfloat16)


def timeit(name, fn, *a, iters=20):
    f = jax.jit(fn)
    o = f(*a); jax.block_until_ready(o)
    tt = time.time()
    for _ in range(iters):
        o = f(*a)
    jax.block_until_ready(o)
    print(f"{name:40s} {(time.time()-tt)/iters*1000:8.2f} ms")


timeit("fused fwd bf16", lambda x: sp.fused_softmax_gather_agg(x, *args, t0, None, None, 1e-7, False), x16)
timeit("fused fwd+bwd bf16",
       jax.grad(lambda x: jnp.sum(sp.fused_softmax_gather_agg(x, *args, t0, None, None, 1e-7, False))), x16)

msgs16 = jnp.asarray(rng.standard_normal((E, C)), jnp.bfloat16)
timeit("softmax_agg(msgs) fwd bf16 [pipelined]",
       lambda m: sp.gen_softmax_aggregate_csr(m, g.receivers, g.row_ptr, t0), msgs16)
timeit("segment_sum fwd bf16 [pipelined]",
       lambda m: sp.segment_sum_csr(m, g.receivers, g.row_ptr), msgs16)

from deep_gcns_torch_tpu.convs.sparse import GENConv
conv = GENConv(C, C, aggr="softmax_sg", t=0.1, mlp_layers=1, compute_dtype="bfloat16")
p, s = conv.init(jax.random.PRNGKey(0))
def conv_loss(p, x):
    out, _ = conv.apply(p, s, x, g)
    return jnp.sum(out)
timeit("GENConv layer fwd+bwd [fused]", jax.grad(conv_loss, argnums=(0, 1)), p, x32)
