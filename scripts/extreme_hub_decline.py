"""Prototype: dense masked hub-row/hub-column MAX vs segment-max gather of
the same edges, on-chip at bench scale (VERDICT r4 next #8 stretch).

max/min has no MXU factorization (max-plus semiring is VPU-only), so a dense
hub correction pays rows x N x C compares; the gather path pays deg rows of
take.  Measure both."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from deep_gcns_torch_tpu.data.reorder import cluster_order, permute_graph
from deep_gcns_torch_tpu.data.synthetic import powerlaw_community_edges
from deep_gcns_torch_tpu.graph import build_graph

n, deg, C = 169_343, 15, 128
rng = np.random.default_rng(0)
s, r = powerlaw_community_edges(rng, n, deg)
perm = cluster_order(s, r, n, cluster_size=16384)
s, r = permute_graph(perm, s, r)
g = build_graph(rng.standard_normal((n, C)).astype(np.float32), s, r,
                num_nodes=n)
npd = g.num_nodes_padded

# top in-degree receivers (the hub rows the sum family extracts)
ind = np.bincount(r, minlength=npd)
R = 128
rows = np.argsort(-ind)[:R].astype(np.int32)
row_edges = int(ind[rows].sum())
print(f"[gen] R={R} hub rows own {row_edges} edges "
      f"(max in-deg {ind.max()})", file=sys.stderr)

# dense mask [R, npd] int8 (as a_row would store)
row_of = np.full(npd, -1); row_of[rows] = np.arange(R)
on = row_of[r] >= 0
a_row = np.zeros((R, npd), np.int8)
np.add.at(a_row, (row_of[r[on]], s[on]), 1)

x = jnp.asarray(rng.standard_normal((npd, C)).astype(np.float32))
a_row_d = jnp.asarray(a_row)

# edge list of just those rows (the gather alternative)
es, er_ = s[on], r[on]
order = np.argsort(er_, kind="stable")
es, er_ = es[order], er_[order]
e_pad = -(-len(es) // 512) * 512
es_p = np.full(e_pad, npd - 1, np.int32); es_p[:len(es)] = es
er_p = np.full(e_pad, npd, np.int32); er_p[:len(er_)] = er_
es_d, er_d = jnp.asarray(es_p), jnp.asarray(er_p)


def chain(f, x0, iters=8):
    @jax.jit
    def run(x0):
        def body(x_, _):
            o = f(x_)
            return x_ + 1e-6 * jnp.sum(o).astype(x_.dtype), None
        return jax.lax.scan(body, x0, None, length=iters)[0]
    run(x0).block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        run(x0).block_until_ready()
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


NEG = jnp.float32(-jnp.inf)


def dense_rowmax(x_):
    # blocked over senders: [R, blk, C] compares per chunk
    B = 8192
    nb = npd // B

    def body(carry, i):
        xs = jax.lax.dynamic_slice(x_, (i * B, 0), (B, C))
        ms = jax.lax.dynamic_slice(a_row_d, (0, i * B), (R, B)) > 0
        m = jnp.max(jnp.where(ms[:, :, None], xs[None, :, :], NEG), axis=1)
        return jnp.maximum(carry, m), None

    out, _ = jax.lax.scan(body, jnp.full((R, C), NEG), jnp.arange(nb))
    return out


def gather_segmax(x_):
    vals = jnp.take(x_, jnp.minimum(es_d, npd - 1), axis=0)
    vals = jnp.where((er_d < npd)[:, None], vals, NEG)
    return jax.ops.segment_max(vals, jnp.minimum(er_d, npd - 1), npd,
                               indices_are_sorted=True)


t_dense = chain(dense_rowmax, x)
t_gather = chain(gather_segmax, x)
print(f"dense hub-row masked max (R={R}, N={npd}, C={C}): {t_dense:.2f} ms")
print(f"segment-max gather of the same {row_edges} edges:  {t_gather:.2f} ms")
print(f"ratio dense/gather = {t_dense / t_gather:.2f}x")
