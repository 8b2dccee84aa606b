"""Drive the round-3 band-route extension on the REAL chip: GENConv sum/mean/
power families, GINConv, SemiGCNConv, RSAGEConv through the Mosaic band kernel
(ops/band.py), parity-checked against the take+segment path and timed.

Usage: python scripts/tpu_band_convs_drive.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from deep_gcns_torch_tpu.convs.sparse import (
    GENConv, GINConv, RSAGEConv, SemiGCNConv)
from deep_gcns_torch_tpu.graph import attach_band, build_graph

N, DEG, C = 32768, 12, 128


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    s = rng.integers(0, N, N * DEG)
    r = np.clip(s + rng.integers(-200, 201, N * DEG), 0, N - 1)
    loops = rng.integers(0, N, N // 8)
    s, r = np.concatenate([s, loops]), np.concatenate([r, loops])
    gb = attach_band(build_graph(None, s, r, num_nodes=N), window=512)
    print(f"coverage fwd={gb.band.fwd.coverage:.3f} bwd={gb.band.bwd.coverage:.3f}")
    g0 = gb.replace(band=None)
    x = jnp.asarray(rng.standard_normal((N, C)).astype(np.float32))

    convs = [
        ("GENConv-mean", GENConv(in_dim=C, emb_dim=C, aggr="mean", norm="layer")),
        ("GENConv-power", GENConv(in_dim=C, emb_dim=C, aggr="power", learn_p=True,
                                  norm="layer")),
        ("GIN", GINConv(in_dim=C, out_dim=C)),
        ("SemiGCN", SemiGCNConv(in_dim=C, out_dim=C, act="relu", norm=None)),
        ("RSAGE", RSAGEConv(in_dim=C, out_dim=C, relative=False, norm=None)),
        ("RSAGE-rel", RSAGEConv(in_dim=C, out_dim=C, relative=True, norm=None)),
    ]
    all_ok = True
    for name, conv in convs:
        params, state = jax.jit(conv.init)(jax.random.PRNGKey(0))

        def loss(p, x_, graph):
            out, _ = conv.apply(p, state, x_, graph, train=False)
            return jnp.sum(jnp.cos(out))

        # band=None / band-attached twins; graph closed over (jit constant)
        f_ref = jax.jit(lambda p, x_: jax.value_and_grad(loss)(p, x_, g0))
        f_band = jax.jit(lambda p, x_: jax.value_and_grad(loss)(p, x_, gb))
        (l0, g0v) = f_ref(params, x)
        (l1, g1v) = f_band(params, x)
        jax.block_until_ready((l0, l1))
        rel = abs(float(l1) - float(l0)) / max(abs(float(l0)), 1e-9)
        gerr = max(float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
                   for a, b in zip(jax.tree_util.tree_leaves(g0v),
                                   jax.tree_util.tree_leaves(g1v)))
        # best-of-bursts timing, D2H fetch per burst (tunnel: see verify notes)
        def t(f):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                for _ in range(5):
                    l, _ = f(params, x)
                float(l)
                best = min(best, (time.time() - t0) / 5)
            return best * 1e3
        tr, tb = t(f_ref), t(f_band)
        ok = rel < 2e-4 and gerr < 2e-3
        all_ok &= ok
        print(f"{name:14s} loss_rel={rel:.2e} grad_rel={gerr:.2e} "
              f"ref={tr:7.2f}ms band={tb:7.2f}ms x{tr / tb:4.2f} "
              f"{'OK' if ok else 'FAIL'}")
    return all_ok


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
