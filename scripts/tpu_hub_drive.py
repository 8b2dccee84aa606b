"""Drive the hub-extended band path on the real TPU chip with a REALISTIC graph.

The round-3 band numbers used idealized uniform bands; this script is the
on-chip proof for the realistic shape (VERDICT r3 #1): a hub-heavy power-law
community graph (data/synthetic.powerlaw_community_edges), shuffled ids,
recovered with data/reorder.cluster_order, band attached with hub extraction.

1. Parity at 33k nodes: band_spmm (Mosaic kernel + hub matmuls + leftover CSR)
   fwd + grad vs XLA segment_sum.
2. Arxiv scale (169k nodes / 2.5M edges): coverage report + timing of
   band_softmax_agg fwd and fwd+bwd vs the fused-CSC take path, on the
   cluster-ordered realistic layout.

Usage: python scripts/tpu_hub_drive.py [--big]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def realistic(rng, n, deg):
    from deep_gcns_torch_tpu.data.reorder import cluster_order, permute_graph
    from deep_gcns_torch_tpu.data.synthetic import powerlaw_community_edges

    s, r = powerlaw_community_edges(rng, n, deg)
    t0 = time.time()
    perm = cluster_order(s, r, n, cluster_size=16384)
    s, r = permute_graph(perm, s, r)
    print(f"[gen] n={n} E={len(s)} cluster_order={time.time()-t0:.2f}s",
          file=sys.stderr)
    return s, r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true", help="arxiv-scale timing run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache: reruns skip the slow tunnel compiles
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    print("devices:", jax.devices(), file=sys.stderr)
    assert jax.devices()[0].platform == "tpu"

    from deep_gcns_torch_tpu.ops.band import (
        band_softmax_agg, band_spmm, build_band_pair)
    from deep_gcns_torch_tpu.ops.spmm_pallas import fused_softmax_gather_agg

    rng = np.random.default_rng(0)

    if args.big:   # parity stage already covered by the default mode
        return big(jax, jnp, rng, band_softmax_agg, fused_softmax_gather_agg,
                   build_band_pair)

    # --- 1. parity on the realistic shape -----------------------------------
    n = 33_280
    s, r = realistic(rng, n, 12)
    bp = build_band_pair(s, r, n, "auto", hubs="auto")
    f, b = bp.fwd, bp.bwd
    print(f"[1] fwd: w={f.window} cov={f.coverage:.3f} hubs(col/row)="
          f"{0 if f.hub_ids is None else len(f.hub_ids)}/"
          f"{0 if f.hub_row_ids is None else len(f.hub_row_ids)} "
          f"n_hub={f.n_hub} n_hub_row={f.n_hub_row} n_lo={f.n_lo}",
          file=sys.stderr)
    print(f"[1] bwd: w={b.window} cov={b.coverage:.3f} hubs(col/row)="
          f"{0 if b.hub_ids is None else len(b.hub_ids)}/"
          f"{0 if b.hub_row_ids is None else len(b.hub_row_ids)} "
          f"n_lo={b.n_lo}", file=sys.stderr)
    assert f.n_hub > 0 and b.n_hub_row > 0, "hub structures must engage"

    x = jnp.asarray(rng.standard_normal((n, 128)).astype(np.float32))
    co = jnp.asarray(rng.standard_normal((n, 128)).astype(np.float32))
    bp_d = jax.device_put(bp)
    got, gx = jax.jit(lambda x_: (
        band_spmm(x_, bp_d),
        jax.grad(lambda x__: jnp.sum(band_spmm(x__, bp_d) * co))(x_)))(x)
    want = jax.ops.segment_sum(jnp.take(x, jnp.asarray(s), 0), jnp.asarray(r),
                               n, indices_are_sorted=False)
    gwant = jax.grad(lambda x_: jnp.sum(jax.ops.segment_sum(
        jnp.take(x_, jnp.asarray(s), 0), jnp.asarray(r), n) * co))(x)
    rel = lambda a_, b_: float(jnp.max(jnp.abs(a_ - b_))
                               / (jnp.max(jnp.abs(b_)) + 1e-9))
    print(f"[1] band_spmm rel err fwd={rel(got, want):.2e} "
          f"grad={rel(gx, gwant):.2e}", file=sys.stderr)
    assert rel(got, want) < 3e-4 and rel(gx, gwant) < 3e-4

    print("OK", file=sys.stderr)
    return


def big(jax, jnp, rng, band_softmax_agg, fused_softmax_gather_agg,
        build_band_pair):
    import sys
    import time

    # --- 2. arxiv-scale timing on the realistic layout ----------------------
    from deep_gcns_torch_tpu.graph import build_graph

    nb_, deg_, c_ = 169_343, 15, 128
    sb_, rb_ = realistic(rng, nb_, deg_)
    n_pad = -(-nb_ // 128) * 128
    t0 = time.time()
    bpb = build_band_pair(sb_, rb_, n_pad, "auto", hubs="auto")
    print(f"[2] band build {time.time()-t0:.1f}s", file=sys.stderr)
    for tag, bb in (("fwd", bpb.fwd), ("bwd", bpb.bwd)):
        print(f"[2] {tag}: w={bb.window} cov={bb.coverage:.3f} "
              f"hub_edges={bb.n_hub}+{bb.n_hub_row} n_lo={bb.n_lo}",
              file=sys.stderr)
    gb = build_graph(None, sb_, rb_, num_nodes=nb_, node_pad=n_pad)
    xb_ = jnp.asarray(rng.standard_normal((n_pad, c_)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    bpb_d, gb_d = jax.device_put((bpb, gb))
    t_ = jnp.asarray([0.8], jnp.float32)

    def chain(f, grad, iters=10):
        # the band pair rides as a jit ARGUMENT: closing over its ~500MB of
        # int8 adjacency would serialize it into the remote-compile request
        # (HTTP 413 over the axon tunnel) — same pattern as bench.py
        @jax.jit
        def run(x0, bands):
            def body(x_, _):
                if grad:
                    o = jax.grad(lambda x__: jnp.sum(f(x__, bands).astype(
                        jnp.float32)))(x_)
                else:
                    o = f(x_, bands)
                return x_ + 1e-6 * o.astype(x_.dtype), None
            return jax.lax.scan(body, x0, None, length=iters)[0]
        run(xb_, bpb_d).block_until_ready()
        best = float("inf")
        for _ in range(4):
            t0_ = time.time()
            run(xb_, bpb_d).block_until_ready()
            best = min(best, (time.time() - t0_) / iters)
        return best * 1e3

    fb = lambda x_, bands: band_softmax_agg(x_, bands, t_, 1e-7, False)
    ff = lambda x_, _bands: fused_softmax_gather_agg(
        x_, gb_d.senders, gb_d.receivers, gb_d.row_ptr, gb_d.csc_senders,
        gb_d.csc_receivers, gb_d.csc_col_ptr, t_, None, None, 1e-7, False)
    for grad in (False, True):
        tband = chain(fb, grad)
        tfused = chain(ff, grad)
        lbl = "fwd+bwd" if grad else "fwd"
        print(f"[2] {lbl} ms: band={tband:.2f} fused-CSC={tfused:.2f} "
              f"speedup={tfused/tband:.2f}x", file=sys.stderr)
    print("OK", file=sys.stderr)


if __name__ == "__main__":
    main()
