"""Sweep band build configs (window × hub threshold) on the realistic
arxiv-scale graph, timing band_softmax_agg fwd on the real chip — picks the
operating point for bench.py's realistic workload.  Also times the hub dot
in isolation (is XLA fusing the int8→bf16 convert into the matmul read?).

Usage: python scripts/tpu_band_sweep.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpu_hub_drive import realistic  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    assert jax.devices()[0].platform == "tpu"

    from deep_gcns_torch_tpu.ops.band import band_softmax_agg, build_band_pair

    rng = np.random.default_rng(0)
    nb_, deg_, c_ = 169_343, 15, 128
    sb_, rb_ = realistic(rng, nb_, deg_)
    n_pad = -(-nb_ // 128) * 128
    xb_ = jnp.asarray(rng.standard_normal((n_pad, c_)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    t_ = jnp.asarray([0.8], jnp.float32)

    # --- hub-dot micro: does the int8 convert fuse into the matmul? ---------
    a8 = jnp.asarray(rng.integers(0, 2, (n_pad, 4096)).astype(np.int8))
    xh = jnp.asarray(rng.standard_normal((4096, 256)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    @jax.jit
    def hubdot(a, x):
        def body(x_, _):
            o = jax.lax.dot_general(a.astype(x_.dtype), x_,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return x_ + 1e-6 * o[:4096].astype(x_.dtype), None
        return jax.lax.scan(body, x, None, length=10)[0]

    hubdot(a8, xh).block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        hubdot(a8, xh).block_until_ready()
        best = min(best, (time.time() - t0) / 10)
    gb = (n_pad * 4096 + 4096 * 256 * 2 + n_pad * 256 * 4) / 2**30
    print(f"[hubdot] [169k,4096]@[4096,256] = {best*1e3:.2f} ms "
          f"(roofline ≈ {gb/0.9*1000:.2f} ms int8-fused, "
          f"mxu ≈ {2*n_pad*4096*256/197e12*1e3:.2f} ms)", file=sys.stderr)

    def time_band(tag, window, hubs):
        t0 = time.time()
        bp = build_band_pair(sb_, rb_, n_pad, window, hubs=hubs)
        f = bp.fwd
        hcols = 0 if f.hub_ids is None else len(f.hub_ids)
        print(f"[{tag}] build {time.time()-t0:.0f}s fwd w={f.window} "
              f"cov={f.coverage:.3f} hub_cols={hcols} hub_e={f.n_hub} "
              f"n_lo={f.n_lo}", file=sys.stderr)
        bp_d = jax.device_put(bp)

        @jax.jit
        def run(x0, bands):
            def body(x_, _):
                o = band_softmax_agg(x_, bands, t_, 1e-7, False)
                return x_ + 1e-6 * o.astype(x_.dtype), None
            return jax.lax.scan(body, x0, None, length=10)[0]

        run(xb_, bp_d).block_until_ready()
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            run(xb_, bp_d).block_until_ready()
            best = min(best, (time.time() - t0) / 10)
        print(f"[{tag}] fwd = {best*1e3:.2f} ms", file=sys.stderr)
        del bp_d
        return best

    time_band("w512-h256 (r4 default)", "auto", "auto")
    time_band("w1024-h256", 1024, "auto")
    time_band("w1024-h512", 1024, 512)
    time_band("w1024-nohub", 1024, None)
    time_band("w2048-h512", 2048, 512)
    print("OK", file=sys.stderr)


if __name__ == "__main__":
    main()
