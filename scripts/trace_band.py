"""Capture an xprof trace of the band softmax-agg forward and print per-op times."""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from deep_gcns_torch_tpu.ops.band import band_softmax_agg, build_band_pair

TRACE_DIR = "/tmp/band_trace"

rng = np.random.default_rng(0)
n, deg, c, bw, window = 169_472, 15, 128, 256, 512
s = rng.integers(0, n, n * deg)
r = np.clip(s + rng.integers(-bw, bw + 1, n * deg), 0, n - 1)
bp = jax.device_put(build_band_pair(s, r, n, window))
t_ = jnp.asarray([0.8], jnp.float32)
x0 = jnp.asarray(rng.standard_normal((n, c)).astype(np.float32)).astype(jnp.bfloat16)


@jax.jit
def run(x):
    def body(x, _):
        o = band_softmax_agg(x, bp, t_, 1e-7, False)
        return x + 1e-6 * o.astype(x.dtype), None
    return jax.lax.scan(body, x, None, length=10)[0]


run(x0).block_until_ready()
os.system(f"rm -rf {TRACE_DIR}")
with jax.profiler.trace(TRACE_DIR):
    run(x0).block_until_ready()

pb = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
from tensorflow.tsl.profiler.protobuf import xplane_pb2

xs = xplane_pb2.XSpace()
with open(pb[0], "rb") as f:
    xs.ParseFromString(f.read())

for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name:
        continue
    print("== plane:", plane.name)
    ev_metadata = plane.event_metadata
    for line in plane.lines:
        stats = {}
        for ev in line.events:
            md = ev_metadata[ev.metadata_id]
            stats.setdefault(md.name, [0, 0.0])
            stats[md.name][0] += 1
            stats[md.name][1] += ev.duration_ps / 1e9
        if not stats:
            continue
        tot = sum(v[1] for v in stats.values())
        print(f"-- line: {line.name} total {tot:.2f} ms (10 iters)")
        for name, (cnt, ms) in sorted(stats.items(), key=lambda kv: -kv[1][1])[:14]:
            print(f"{ms:9.2f} ms  x{cnt:5d}  {name[:100]}")
