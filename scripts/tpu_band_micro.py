"""Micro-breakdown of the band path at bench shape on the real chip."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from deep_gcns_torch_tpu.ops.band import (
        _band_call, band_softmax_agg, build_band_pair)

    rng = np.random.default_rng(0)
    n, deg, c = 169_472, 15, 128
    bw = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    s = rng.integers(0, n, n * deg)
    r = np.clip(s + rng.integers(-bw, bw + 1, n * deg), 0, n - 1)
    bp = build_band_pair(s, r, n, window)
    print(f"E={len(s)} bw={bw} window={window} coverage={bp.fwd.coverage:.3f} "
          f"n_lo={bp.fwd.n_lo}", file=sys.stderr)
    bp_d = jax.device_put(bp)
    t_ = jnp.asarray([0.8], jnp.float32)

    def chain(f, cshape, iters=10):
        x0 = jnp.asarray(rng.standard_normal((n, cshape)).astype(np.float32)
                         ).astype(jnp.bfloat16)

        @jax.jit
        def run(x):
            def body(x, _):
                o = f(x)
                return x + 1e-6 * o[:, :cshape].astype(x.dtype), None
            return jax.lax.scan(body, x, None, length=iters)[0]
        run(x0).block_until_ready()
        best = float("inf")
        for _ in range(4):
            t0 = time.time()
            run(x0).block_until_ready()
            best = min(best, (time.time() - t0) / iters)
        return best * 1e3

    # bare kernel, no leftover, c=128 / c=256
    import dataclasses
    band_nolo = dataclasses.replace(bp_d.fwd, n_lo=0)
    t128 = chain(lambda x: _band_call(x, band_nolo, False), 128)
    print(f"bare band kernel c=128: {t128:.2f} ms", file=sys.stderr)
    t256 = chain(lambda x: _band_call(
        jnp.concatenate([x, x], 1), band_nolo, False), 128)
    print(f"bare band kernel c=256 (+concat): {t256:.2f} ms", file=sys.stderr)

    # full softmax agg fwd (with leftover)
    tf = chain(lambda x: band_softmax_agg(x, bp_d, t_, 1e-7, False), 128)
    print(f"band_softmax_agg fwd: {tf:.2f} ms", file=sys.stderr)

    # prep-only (elementwise + cmax + pack)
    def prep(x):
        m = jax.nn.relu(x.astype(jnp.float32)) + 1e-7
        cmax = jax.lax.stop_gradient(jnp.max(m, 0) * 0.8)
        e = jnp.exp(m * 0.8 - cmax[None, :])
        return jnp.concatenate([e * m, e], 1).astype(x.dtype)
    tp = chain(prep, 128)
    print(f"prep only: {tp:.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
