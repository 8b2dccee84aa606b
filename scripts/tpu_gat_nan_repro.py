"""Repro + mitigation check for the bf16 sym-norm RevGAT NaN-gradient envelope.

COMPONENTS.md (round 4) records: deep reversible RevGAT (>=2 mid layers) with
symmetric norm in bf16 produces NaN GRADIENTS (forward finite) on graphs with
extreme power-law senders (max out-degree ~46k — the directed
powerlaw_community_edges stress graph at arxiv scale), on BOTH the band and
fused-CSC routes.  VERDICT r4 next #6 asks: try f32 accumulation of the
score/denominator path, re-run this repro, price the cost.

Round-5 findings (this script + /tmp probes, all on-chip):
  * the NaN is NOT a reversible-engine artifact — plain stored-activation
    autodiff NaNs identically;
  * mechanism: sym-norm's in_deg^0.5 amplification grows carry outliers
    (231 → 1071 → 2237 over the mid layers), one hub row drives the GLOBAL
    per-head score shift to ~94 while typical receivers score ~100 lower —
    168k of 169k receivers underflow den to exactly 0 (silently zeroed
    forward) and ~1.2k land in f32-denormal dens, whose backward 1/den
    overflows to inf → inf·0 = NaN;
  * dtype-independent: f32 compute NaNs the same way (the score SPREAD is
    the envelope, not bf16).
Mitigations (convs/dgl_gat.py): DEN_TINY backward guard (no more NaN on the
fast paths) + stabilizer="per_receiver" (exact dense per-receiver route).

Usage: python scripts/tpu_gat_nan_repro.py [--layers N] [--route band|csc]
       [--per-receiver] [--f32] [--small]
Prints per-parameter-group NaN counts of one loss gradient.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=5)
    ap.add_argument("--route", default="band", choices=["band", "csc"])
    ap.add_argument("--per-receiver", action="store_true",
                    help="stabilizer='per_receiver' (exact dense route)")
    ap.add_argument("--f32", action="store_true",
                    help="compute_dtype=float32 (NaNs too: spread envelope)")
    ap.add_argument("--small", action="store_true",
                    help="33k-node variant (expected finite)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deep_gcns_torch_tpu.data.reorder import cluster_order, permute_graph
    from deep_gcns_torch_tpu.data.synthetic import powerlaw_community_edges
    from deep_gcns_torch_tpu.graph import attach_band, build_graph
    from deep_gcns_torch_tpu.models.rev_gat import RevGAT, RevGATConfig

    n = 33_000 if args.small else 169_343
    rng = np.random.default_rng(0)
    s, r = powerlaw_community_edges(rng, n, 15)
    od = np.bincount(s, minlength=n)
    print(f"[gen] n={n} E={len(s)} max_out_deg={od.max()}", file=sys.stderr)
    perm = cluster_order(s, r, n, cluster_size=16384)
    s, r = permute_graph(perm, s, r)
    C, K = 128, 40
    x = rng.standard_normal((n, C)).astype(np.float32)
    g = build_graph(x, s, r, num_nodes=n)
    if args.route == "band":
        g = attach_band(g)
    labels_full = jnp.asarray(np.pad(rng.integers(0, K, n),
                                     (0, g.num_nodes_padded - n)))
    g = jax.device_put(g)

    cfg = RevGATConfig(
        in_feats=C + K, n_classes=K, n_layers=args.layers,
        n_hidden=256, n_heads=3, dropout=0.75, input_drop=0.25,
        edge_drop=0.3,
        compute_dtype="float32" if args.f32 else "bfloat16",
        stabilizer="per_receiver" if args.per_receiver else "auto")
    model = RevGAT(cfg)
    p, _ = jax.jit(model.init)(jax.random.PRNGKey(0))
    onehot = jax.nn.one_hot(labels_full, K) * g.node_mask[:, None]
    x_in = jnp.concatenate([g.x, onehot], axis=1)
    band = g.band
    g_const = g.replace(band=None)

    @jax.jit
    def lossgrad(p, band, key):
        gg = g_const.replace(band=band)

        def lossf(p):
            logits, _ = model.apply(p, {}, x_in, gg, train=True, rng=key)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits,
                                                                 labels_full)
            return jnp.sum(ce * gg.node_mask) / jnp.sum(gg.node_mask)

        return jax.value_and_grad(lossf)(p)

    t0 = time.time()
    loss, gr = lossgrad(p, band, jax.random.PRNGKey(1))
    jax.block_until_ready(loss)
    print(f"[run] compile+step={time.time()-t0:.1f}s loss={float(loss):.4f}",
          file=sys.stderr)
    flat = jax.tree_util.tree_leaves_with_path(gr)
    bad = 0
    for path, leaf in flat:
        nn = int(jnp.sum(~jnp.isfinite(leaf)))
        if nn:
            bad += 1
            print(f"[nan] {jax.tree_util.keystr(path)}: {nn}/{leaf.size}",
                  file=sys.stderr)
    tag = (f"route={args.route} L={args.layers} "
           f"stab={'per_receiver' if args.per_receiver else 'auto'} "
           f"f32={args.f32} small={args.small}")
    if bad == 0 and np.isfinite(float(loss)):
        print(f"[ok] ALL GRADS FINITE ({tag})")
    else:
        print(f"[fail] {bad} grad tensors non-finite ({tag})")


if __name__ == "__main__":
    main()
