"""Price the RevGCN-1001x80 bench step phase-by-phase on the real chip
(VERDICT r4 weak #1 / next #2): what do the 32 ms/layer buy, and would
batching the G=2 group functions into one 80-ch pass save anything?

Phases measured on the EXACT bench workload (13k nodes / 780k edges, 8-dim
edge attrs, C=80, G=2, aggr=softmax, edge encodings, bf16 compute):
  fm40_fwd        one group function (LayerNorm->relu->drop->GENConv @ 40ch)
  fm40_fwdbwd     same under value_and_grad (the vjp unit of the backward)
  layer_fwd       coupling.forward (2 sequential fm calls + adds)
  layer_invvjp    coupling.inverse_and_vjp (the fused backward unit)
  fm80_fwd(+bwd)  ONE 80-ch group function on the same graph — the
                  lane-batching hypothesis: if t(80) << 2*t(40) the 40-ch
                  tables waste MXU/issue slots and batching would pay
  gather_floor    [E,40] and [E,80] row gathers (the issue-rate wall)

Usage: python scripts/rev_phase_profile.py
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def chain(jax, f, x0, args=(), iters=48):
    # iters >= 48: an 8-iter scan reads ~2.5 ms/iter high on this tunnel
    # (per-dispatch warm-up tail; no-op control + iters sweep, r5 notes)
    """args pass big tables (edge embeddings) as ARGUMENTS — closing them
    over embeds hundreds of MB in the remote-compile request (HTTP 413)."""
    @jax.jit
    def run(x0, args):
        def body(x_, _):
            o = f(x_, *args)
            return x_ + 1e-6 * o.astype(x_.dtype), None
        return jax.lax.scan(body, x0, None, length=iters)[0]
    run(x0, args).block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        run(x0, args).block_until_ready()
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.devices()[0].platform == "tpu"

    from deep_gcns_torch_tpu.data.synthetic import random_node_graph
    from deep_gcns_torch_tpu.models import RevGCN, RevGCNConfig
    from deep_gcns_torch_tpu.rev.rev_layer import GENBlock

    rng = np.random.default_rng(0)
    g, _ = random_node_graph(rng, 13_000, 60, 8, num_classes=2,
                             self_loops=False)
    ea = jnp.asarray(rng.standard_normal((g.num_edges_padded, 8)), jnp.float32)
    g = dataclasses.replace(g, edge_attr=ea,
                            edge_attr_csc=jnp.take(ea, g.csc_perm, axis=0))
    g = jax.device_put(g)
    npd = g.num_nodes_padded
    E = g.num_edges_padded
    print(f"[rev] n={npd} E={E}", file=sys.stderr)

    model = RevGCN(RevGCNConfig(
        in_channels=8, node_feat_dim=8, edge_feat_dim=8, hidden_channels=80,
        num_tasks=112, num_layers=3, group=2, aggr="softmax", norm="layer",
        mlp_layers=1, dropout=0.1, conv_encode_edge=True,
        use_one_hot_encoding=True, compute_dtype="bfloat16"))
    p, _ = jax.jit(model.init)(jax.random.PRNGKey(0))
    coupling = model._coupling
    p1 = jax.tree_util.tree_map(lambda a: a[0], p["layers"])   # one layer
    pg = jax.tree_util.tree_map(lambda a: a[0], p1)            # one group fn

    # edge embeddings as the model computes them ([E, 80] per group chunk)
    emb, _ = model._edge_encoder.apply(p["edge_encoder"], {}, g.edge_attr)
    emb2 = jnp.concatenate([emb] * 2, axis=-1)
    emb2_csc = jnp.concatenate(
        [model._edge_encoder.apply(p["edge_encoder"], {}, g.edge_attr_csc)[0]]
        * 2, axis=-1)
    h80 = jnp.asarray(rng.standard_normal((npd, 80)), jnp.float32)
    h40 = h80[:, :40]

    fm = coupling.fm  # GENBlock 40ch

    def fm40_fwd(x, e2, e2c):
        out, _ = fm.apply(pg, {}, x[:, :40], g,
                          chunk_args=(None, e2[:, :80], e2c[:, :80]),
                          train=False)
        return jnp.sum(out)

    def fm40_fwdbwd(x, e2, e2c):
        return jnp.sum(jax.grad(lambda x_: fm40_fwd(x_, e2, e2c))(x))

    def layer_fwd(x, e2, e2c):
        return jnp.sum(coupling.forward(p1, x, g, None, e2, e2c,
                                        train=False))

    gy = jnp.asarray(rng.standard_normal((npd, 80)), jnp.float32)

    def layer_invvjp(x, e2, e2c):
        xr, gx, gp, _ = coupling.inverse_and_vjp(p1, x, g, gy, None, e2,
                                                 e2c, train=False)
        return (jnp.sum(xr) + jnp.sum(gx)
                + sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(gp)))

    # one 80-ch group function on the same graph (batching hypothesis)
    blk80 = GENBlock(80, 80, aggr="softmax", encode_edge=True,
                     edge_feat_dim=160, norm="layer", mlp_layers=1,
                     compute_dtype="bfloat16")
    p80, _ = jax.jit(blk80.init)(jax.random.PRNGKey(1))

    def fm80_fwd(x, e1, e1c):
        out, _ = blk80.apply(p80, {}, x, g, chunk_args=(None, e1, e1c),
                             train=False)
        return jnp.sum(out)

    def fm80_fwdbwd(x, e1, e1c):
        return jnp.sum(jax.grad(lambda x_: fm80_fwd(x_, e1, e1c))(x))

    # gather floor
    sid = jnp.minimum(g.senders, npd - 1)

    def gather40(x):
        return jnp.sum(jnp.take(x[:, :40].astype(jnp.bfloat16), sid, axis=0)
                       .astype(jnp.float32))

    def gather80(x):
        return jnp.sum(jnp.take(x.astype(jnp.bfloat16), sid, axis=0)
                       .astype(jnp.float32))

    e_args = (emb2, emb2_csc)
    e160 = (emb2, emb2_csc)  # [E, 160] — exactly edge_feat_dim=160
    rows = [
        ("gather [E,40] bf16", gather40, ()),
        ("gather [E,80] bf16", gather80, ()),
        ("fm40 fwd", fm40_fwd, e_args),
        ("fm40 fwd+bwd", fm40_fwdbwd, e_args),
        ("fm80 fwd", fm80_fwd, e160),
        ("fm80 fwd+bwd", fm80_fwdbwd, e160),
        ("layer fwd (2 x fm40 seq)", layer_fwd, e_args),
        ("layer inverse+vjp (fused)", layer_invvjp, e_args),
    ]
    out = {}
    for name, f, a in rows:
        t = chain(jax, f, h80, a)
        out[name] = t
        print(f"[rev] {name}: {t:.2f} ms", file=sys.stderr)
    tot = out["layer fwd (2 x fm40 seq)"] + out["layer inverse+vjp (fused)"]
    print(f"[rev] fwd + fused backward per layer: {tot:.2f} ms "
          f"(bench observed ~32 ms/layer incl. optimizer/head amortization)",
          file=sys.stderr)
    save = 1 - (out["fm80 fwd+bwd"] / (2 * out["fm40 fwd+bwd"]))
    print(f"[rev] batching hypothesis: fm80 fwd+bwd = "
          f"{out['fm80 fwd+bwd']:.2f} vs 2x fm40 = "
          f"{2 * out['fm40 fwd+bwd']:.2f} -> width-batching would save "
          f"{100 * save:.0f}% of fm time IF the groups were independent "
          f"(they are sequentially coupled)", file=sys.stderr)


if __name__ == "__main__":
    main()
