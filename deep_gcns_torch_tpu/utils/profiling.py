"""Profiling / tracing utilities.

The reference has only wall-clock timing and `torch.cuda.max_memory_allocated`
(`examples/ogb/ogbn_arxiv/main.py:95`, `examples/ogb_eff/ogbn_proteins/main.py:212-214`).
The TPU-native replacements:
  * `trace(dir)` — context manager around `jax.profiler` producing xprof traces;
  * `EdgeRateMeter` — first-class edges/s accounting (the BASELINE.json north star);
  * `device_memory_stats` — live/peak HBM from the device allocator.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """xprof trace of the enclosed block: `with trace('/tmp/trace'): step()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> dict:
    """bytes_in_use / peak_bytes_in_use when the backend exposes allocator stats."""
    d = device or jax.devices()[0]
    try:
        s = d.memory_stats() or {}
    except Exception:
        s = {}
    return {"bytes_in_use": s.get("bytes_in_use"),
            "peak_bytes_in_use": s.get("peak_bytes_in_use")}


class EdgeRateMeter:
    """Aggregated edge-messages/s across steps: update(edges_processed) per step."""

    def __init__(self):
        self.edges = 0
        self.t0: Optional[float] = None
        self.elapsed = 0.0

    def start(self):
        self.t0 = time.time()

    def update(self, edges: int):
        assert self.t0 is not None, "call start() first"
        self.elapsed += time.time() - self.t0
        self.edges += int(edges)
        self.t0 = time.time()

    def rate(self) -> float:
        return self.edges / self.elapsed if self.elapsed > 0 else 0.0

    @staticmethod
    def fastpath_misses():
        """Fused-kernel routing misses seen so far (route:reason → count) —
        non-empty means some aggregation ran on the slow XLA fallback."""
        from ..ops.segment import fastpath_misses
        return fastpath_misses()
