"""Drive the fused dense dst-score GAT kernels (ops/gat_dense.py) on the real
chip: Mosaic-vs-XLA parity on a hubby graph, then arxiv-scale timing of the
aggregation fwd / fwd+bwd against the r4 XLA-composed route's recorded
numbers (112.7 ms fwd / 370.9 ms fwd+bwd, ROOFLINE.md r4 — the VERDICT #1
target is >=2x both).

Usage: python scripts/tpu_gat_dense_drive.py [--small-only]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_hub_drive import realistic  # noqa: E402

R4_FWD_MS = 112.7
R4_FWDBWD_MS = 370.9


def chain(jax, jnp, f, x0, args, iters=8):
    @jax.jit
    def run(x0, args):
        def body(x_, _):
            o = f(x_, args)
            return x_ + 1e-6 * o.astype(x_.dtype), None
        return jax.lax.scan(body, x0, None, length=iters)[0]
    run(x0, args).block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        run(x0, args).block_until_ready()
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


def hubby_graph(rng, n, deg, window, hubs):
    from deep_gcns_torch_tpu.graph import attach_band, build_graph

    w = (1.0 / (1.0 + np.arange(n, dtype=np.float64))) ** 0.9
    rng.shuffle(w)
    s = rng.choice(n, n * deg, p=w / w.sum())
    r = np.clip(s + rng.integers(-300, 301, n * deg), 0, n - 1)
    x = rng.standard_normal((n, 8)).astype(np.float32)
    return attach_band(build_graph(x, s, r, num_nodes=n), window=window,
                       hubs=hubs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small-only", action="store_true")
    args_cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.devices()[0].platform == "tpu"

    from deep_gcns_torch_tpu.graph import attach_band, build_graph
    from deep_gcns_torch_tpu.ops.band import make_edge_drop
    from deep_gcns_torch_tpu.ops.gat_dense import gat_dense_agg

    # ---- small-scale Mosaic vs XLA parity (hubby band, with drop) ----------
    rng = np.random.default_rng(0)
    g = hubby_graph(rng, 4096, 8, 256, 64)
    f = g.band.fwd
    print(f"[parity] hubs fwd={0 if f.hub_ids is None else f.hub_ids.shape[0]}"
          f" rows={0 if f.hub_row_ids is None else f.hub_row_ids.shape[0]}"
          f" cov={f.coverage:.3f}", file=sys.stderr)
    npd = g.num_nodes_padded
    h, d = 3, 64
    feat = jnp.asarray(rng.standard_normal((npd, h, d)).astype(np.float32))
    el = jnp.asarray(rng.standard_normal((npd, h)).astype(np.float32))
    er = jnp.asarray(rng.standard_normal((npd, h)).astype(np.float32))
    co_n = jnp.asarray(rng.standard_normal((npd, h, d)).astype(np.float32))
    co_d = jnp.asarray(rng.standard_normal((npd, h)).astype(np.float32))
    band_d = jax.device_put(g.band)
    for drop in (None, make_edge_drop(jax.random.PRNGKey(3), 0.4)):
        def loss(ftuple, band, interp):
            f_, l_, r_ = ftuple
            num, den = gat_dense_agg(f_, l_, r_, None, None, None, band,
                                     drop, 0.2, None, interp)
            return jnp.sum(num * co_n) + jnp.sum(den * co_d)

        vg = jax.value_and_grad(loss, argnums=0)
        l_k, g_k = jax.jit(lambda t, b: vg(t, b, False))((feat, el, er),
                                                         band_d)
        l_x, g_x = jax.jit(lambda t, b: vg(t, b, "xla"))((feat, el, er),
                                                         band_d)
        rel = float(abs(l_k - l_x) / (abs(l_x) + 1e-9))
        grel = max(float(jnp.max(jnp.abs(a - b))
                         / (jnp.max(jnp.abs(b)) + 1e-9))
                   for a, b in zip(g_k, g_x))
        tag = "drop" if drop is not None else "nodrop"
        print(f"[parity:{tag}] loss rel={rel:.2e} grad rel={grel:.2e}",
              file=sys.stderr)
        assert rel < 1e-4 and grel < 1e-3, (rel, grel)
    print("[parity] Mosaic == XLA on chip", file=sys.stderr)
    if args_cli.small_only:
        return

    # ---- arxiv-scale timing (realistic power-law community graph) ---------
    n, deg = 169_343, 15
    s, r = realistic(rng, n, deg)
    x_np = rng.standard_normal((n, 8)).astype(np.float32)
    g = attach_band(build_graph(x_np, s, r, num_nodes=n))
    f, b = g.band.fwd, g.band.bwd
    print(f"[big] w={f.window} cov={f.coverage:.3f} "
          f"hubs fwd={0 if f.hub_ids is None else f.hub_ids.shape[0]}"
          f"/bwd={0 if b.hub_ids is None else b.hub_ids.shape[0]} "
          f"rows fwd={0 if f.hub_row_ids is None else f.hub_row_ids.shape[0]}"
          f"/bwd={0 if b.hub_row_ids is None else b.hub_row_ids.shape[0]} "
          f"lo fwd={f.n_lo}/bwd={b.n_lo}", file=sys.stderr)
    npd = g.num_nodes_padded
    h, d = 3, 256
    feat = jnp.asarray(rng.standard_normal((npd, h, d)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    el = jnp.asarray(rng.standard_normal((npd, h)).astype(np.float32))
    er = jnp.asarray(rng.standard_normal((npd, h)).astype(np.float32))
    band_d = jax.device_put(g.band)
    drop = make_edge_drop(jax.random.PRNGKey(3), 0.3)
    cd = jnp.bfloat16

    def fwd(x_, band):
        num, den = gat_dense_agg(feat, x_[:, :h], er, None, None, None, band,
                                 None, 0.2, cd, False)
        return jnp.sum(num) + jnp.sum(den)

    def fwdbwd(x_, band):
        def loss(l_):
            num, den = gat_dense_agg(feat, l_, er, None, None, None, band,
                                     drop, 0.2, cd, False)
            return jnp.sum(num) + jnp.sum(den)
        return jnp.sum(jax.grad(loss)(x_[:, :h]))

    def fwdbwd_full(x_, band):
        def loss(f_, l_, r_):
            num, den = gat_dense_agg(f_, l_, r_, None, None, None, band,
                                     drop, 0.2, cd, False)
            return jnp.sum(num) + jnp.sum(den)
        gs = jax.grad(loss, argnums=(0, 1, 2))(feat, x_[:, :h], er)
        return sum(jnp.sum(t.astype(jnp.float32)) for t in gs)

    x0 = el  # chained input
    t_f = chain(jax, jnp, fwd, x0, band_d)
    print(f"[big] dense dst-score agg fwd: {t_f:.1f} ms "
          f"(r4 route {R4_FWD_MS} ms -> {R4_FWD_MS / t_f:.2f}x)",
          file=sys.stderr)
    t_fb = chain(jax, jnp, fwdbwd_full, x0, band_d)
    print(f"[big] dense dst-score agg fwd+bwd (all grads, drop): {t_fb:.1f} ms"
          f" (r4 route {R4_FWDBWD_MS} ms -> {R4_FWDBWD_MS / t_fb:.2f}x)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
