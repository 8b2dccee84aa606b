"""Edges/s + comm-volume scaling harness for spatial (edge-partitioned) parallelism.

Measures the BASELINE.json scaling metric: aggregated edge-messages/s of a
DeeperGCN train step at 1 device vs N devices on the available mesh, the scaling
efficiency, and — for the halo-exchange path — the per-layer communication volume,
which must grow with the partition BOUNDARY, not with N (SURVEY §7 hard-part 4).

On this environment only one real chip exists, so the multi-device rows run on a
virtual CPU mesh (functional + comm-volume validation; step-time efficiency on a
CPU mesh is not an ICI measurement); on a v5e-16 slice the same script measures
the true host→pod efficiency.

Run: python scripts/scaling_bench.py --platform cpu --devices 8 \
        [--locality 0.95] [--json SCALING.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def community_graph(rng, n, avg_degree, locality, blocks=16, cross_skew=0.0):
    """Edges intra-community w.p. `locality` (contiguous communities — the layout
    a locality-aware partitioner produces), uniform-random otherwise.

    cross_skew > 0 draws the CROSS-community edges' senders from a shuffled
    power law (exponent = cross_skew) instead of uniformly — the realistic
    shape for protein/citation graphs, where hub nodes carry the long-range
    edges.  Uniform cross senders (skew 0) make every node a boundary sender
    to every device pair, which is why the round-3 proteins rehearsal showed
    halo ≈ all-gather volume (SCALING_r03): that was the rehearsal's
    artifact, not a property of the exchange."""
    import numpy as np

    e = n * avg_degree
    bs = n // blocks
    src = rng.integers(0, n, e)
    intra = rng.random(e) < locality
    if cross_skew > 0:
        w = (1.0 / (1.0 + np.arange(n, dtype=np.float64))) ** cross_skew
        rng.shuffle(w)
        n_cross = int((~intra).sum())
        src[~intra] = rng.choice(n, n_cross, p=w / w.sum())
    dst = rng.integers(0, n, e)
    b = src // bs
    off = rng.integers(0, bs, e)
    dst = np.where(intra, np.minimum(b * bs + off, n - 1), dst)
    return src, dst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0, help="0 = all available")
    ap.add_argument("--platform", type=str, default="")
    ap.add_argument("--nodes", type=int, default=16384)
    ap.add_argument("--avg_degree", type=int, default=30)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--layers", type=int, default=14)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--locality", type=float, default=0.95,
                    help="fraction of intra-community edges (0 = ER-random)")
    ap.add_argument("--cross_skew", type=float, default=0.0,
                    help="power-law exponent for CROSS-community edge senders "
                         "(0 = uniform; ~1.0 models hub-carried long-range "
                         "edges, the realistic protein/citation shape)")
    ap.add_argument("--exchange", type=str, default="auto")
    ap.add_argument("--scramble", action="store_true",
                    help="randomly permute node ids first (destroys the "
                         "generator's contiguous layout — what raw datasets "
                         "look like before reordering)")
    ap.add_argument("--order", type=str, default="none",
                    choices=["none", "rcm", "cluster"],
                    help="locality reordering pass (data/reorder.py): rcm for "
                         "banded/mesh graphs, cluster (greedy max-connectivity) "
                         "for community/small-world graphs — shrinks halo "
                         "boundaries and band windows")
    ap.add_argument("--build_only", action="store_true",
                    help="measure host shard/halo build time only (proteins-"
                         "scale rehearsal: the step itself would take minutes "
                         "on a CPU mesh)")
    ap.add_argument("--ici_gbps", type=float, default=45.0,
                    help="assumed per-direction ICI bandwidth (GB/s) for the "
                         "analytic efficiency projection (v5e ≈ 45)")
    ap.add_argument("--json", type=str, default="",
                    help="write results to this JSON file")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu" and args.devices:
            os.environ.setdefault(
                "XLA_FLAGS", f"--xla_force_host_platform_device_count={args.devices}")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from deep_gcns_torch_tpu.models.deeper_gcn import DeeperGCNConfig
    from deep_gcns_torch_tpu.parallel import (SpatialDeeperGCN, make_mesh,
                                              shard_graph, shard_nodes,
                                              spatial_train_step)

    n_avail = len(jax.devices())
    n_max = args.devices or n_avail
    rng = np.random.default_rng(0)
    n, e = args.nodes, args.nodes * args.avg_degree
    if args.locality > 0:
        senders, receivers = community_graph(rng, n, args.avg_degree,
                                             args.locality,
                                             cross_skew=args.cross_skew)
    else:
        senders = rng.integers(0, n, e)
        receivers = rng.integers(0, n, e)
    if args.scramble:
        scr = rng.permutation(n)
        senders, receivers = scr[senders], scr[receivers]
    if args.order != "none":
        from deep_gcns_torch_tpu.data.reorder import (cluster_order,
                                                      permute_graph, rcm_order)

        t0 = time.time()
        if args.order == "rcm":
            perm = rcm_order(senders, receivers, n)
        else:
            perm = cluster_order(senders, receivers, n,
                                 cluster_size=max(n // max(n_max, 1), 1024))
        senders, receivers = permute_graph(perm, senders, receivers)
        print(f"{args.order} reorder: {time.time() - t0:.2f}s", flush=True)
    x_np = rng.standard_normal((n, args.hidden)).astype(np.float32)
    lab_np = rng.integers(0, 16, n)

    cfg = DeeperGCNConfig(in_channels=args.hidden, hidden_channels=args.hidden,
                          num_tasks=16, num_layers=args.layers, block="res+",
                          aggr="softmax", norm="layer", dropout=0.0)

    def sum_loss(logits, lab, m):
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, lab[:, None], 1)[:, 0]
        m = m.astype(nll.dtype)
        return jnp.sum(nll * m), jnp.sum(m)

    bpr = args.hidden * 4  # bytes/row f32
    results, rows = {}, []
    sizes = [d for d in (1, 2, 4, 8, 16) if d <= n_max]
    # warm the allocator arena with one throwaway full-scale build: the FIRST
    # build in a process pays first-touch page faults for the whole O(E)
    # working set (measured 9.5s -> 3.1s at 10M edges) — round 3's "D=2
    # regression" (183s vs 61s at D=8) was exactly this, D=2 ran first.
    if len(sizes) > 1:
        t0 = time.time()
        shard_graph(senders, receivers, n, sizes[-1])
        print(f"[warmup] build at D={sizes[-1]}: {time.time()-t0:.2f}s",
              flush=True)
    for d in sizes:
        model = SpatialDeeperGCN(cfg, axis="gp", exchange=args.exchange)
        t0 = time.time()
        shards = shard_graph(senders, receivers, n, d)
        build_s = time.time() - t0
        use_halo = d > 1 and model._use_halo(shards)
        halo_rows = int(shards.halo_rows_per_device)
        ag_rows = (d - 1) * shards.shard_size
        if args.build_only:
            print(f"devices={d:2d}  shard/halo build={build_s:6.2f}s  "
                  f"halo_rows/dev={halo_rows}  off_pads={list(shards.off_pads)}",
                  flush=True)
            rows.append(dict(devices=d, build_s=round(build_s, 2),
                             shard_size=int(shards.shard_size),
                             off_pads=[int(q) for q in shards.off_pads],
                             comm_rows_per_layer_per_dev=halo_rows,
                             allgather_rows_per_layer_per_dev=int(ag_rows)))
            continue
        params, state = model.init(jax.random.PRNGKey(0))
        xs = jnp.asarray(shard_nodes(x_np, shards))
        lab = jnp.asarray(shard_nodes(lab_np[:, None].astype(np.int32),
                                      shards)[..., 0])
        msk = jnp.asarray(np.asarray(shards.node_mask))
        mesh = make_mesh(("gp",), devices=jax.devices()[:d])
        tx = optax.adam(1e-3)
        step = spatial_train_step(model, tx, sum_loss, mesh, axis="gp")
        opt = tx.init(params)
        sh_dev = jax.device_put(shards)
        params, state, opt, loss = step(params, state, opt, xs, sh_dev, lab, msk,
                                        jax.random.PRNGKey(1))
        jax.block_until_ready(loss)
        t0 = time.time()
        for i in range(args.iters):
            params, state, opt, loss = step(params, state, opt, xs, sh_dev, lab,
                                            msk, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(loss)
        dt = (time.time() - t0) / args.iters
        rate = e * args.layers / dt
        results[d] = rate
        eff = rate / (results[1] * d) if 1 in results and d > 1 else 1.0
        mode = "halo" if use_halo else ("local" if d == 1 else "allgather")
        comm_rows = halo_rows if use_halo else (ag_rows if d > 1 else 0)
        # analytic ICI projection (VERDICT r2 weak #3: the CPU-mesh step time is
        # not an ICI measurement — model the pod from the measured comm volume):
        # per layer each device ships comm_rows·bpr bytes in BOTH directions
        # (fwd exchange + its transpose in the bwd); with perfect compute
        # scaling the projected step is t1/D + comm_time, and the overlapped
        # variant hides comm under the local-edge aggregation.
        proj = {}
        if 1 in results and d > 1:
            t1 = e * args.layers / results[1]
            comm_s = 2 * args.layers * comm_rows * bpr / (args.ici_gbps * 1e9)
            proj_step = t1 / d + comm_s
            proj = dict(
                ici_eff_no_overlap=round((t1 / d) / proj_step, 4),
                ici_comm_ms_per_step=round(comm_s * 1e3, 3))
        print(f"devices={d:2d}  step={dt * 1000:7.1f} ms  "
              f"rate={rate / 1e6:8.2f} M edge-msg/s  efficiency={eff:5.1%}  "
              f"exchange={mode:9s}  comm={comm_rows * bpr / 1e6:7.2f} MB/layer/dev "
              f"(allgather would be {ag_rows * bpr / 1e6:.2f})"
              + (f"  ici_eff≈{proj['ici_eff_no_overlap']:.1%}" if proj else ""),
              flush=True)
        rows.append(dict(devices=d, step_ms=round(dt * 1e3, 2),
                         build_s=round(build_s, 2),
                         edge_msgs_per_s=round(rate), efficiency=round(eff, 4),
                         exchange=mode, shard_size=int(shards.shard_size),
                         off_pads=[int(q) for q in shards.off_pads],
                         comm_rows_per_layer_per_dev=int(comm_rows),
                         allgather_rows_per_layer_per_dev=int(ag_rows),
                         comm_mb_per_layer_per_dev=round(comm_rows * bpr / 1e6, 3),
                         **proj))

    if args.json:
        out = dict(nodes=n, edges=int(e), hidden=args.hidden, layers=args.layers,
                   locality=args.locality, platform=jax.devices()[0].platform,
                   note=("multi-device rows on a virtual CPU mesh: comm volume is "
                         "exact; step-time efficiency is not an ICI measurement"),
                   rows=rows)
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
