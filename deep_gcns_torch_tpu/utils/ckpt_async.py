"""Async (orbax-backed) checkpointing.

The reference's checkpoint path is synchronous `torch.save` of a CPU-offloaded
state dict (`utils/ckpt_util.py:9-24`, `:107-111`) — the train loop stalls for
the full serialization.  On TPU the idiomatic replacement is orbax's async
checkpointing: `save()` snapshots device arrays and returns immediately, the
write overlaps subsequent train steps, and `wait_until_finished()` fences before
exit.  The sync npz path (`utils/ckpt.py`) remains for portability and for the
reference's exact file-layout semantics (best-copy etc.); this module is the
production path for long runs (RevGNN-Deep 1001-layer training, multi-hour
epochs on ogbn-proteins).

Retention mirrors the reference's two conventions: keep the latest k checkpoints
(rolling) and pin the best-metric step (`save_checkpoint` + `*_best.pth` copy,
`utils/ckpt_util.py:107-111`) via `best_fn` metrics.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax


class AsyncCheckpointer:
    """Rolling async checkpoint manager for (params, state, opt_state) pytrees.

    Usage::

        ckpt = AsyncCheckpointer(dir, max_to_keep=3)
        for epoch in ...:
            ...train...
            ckpt.save(epoch, params=params, state=state, opt_state=opt_state,
                      metrics={"valid": v}, meta={"lr": lr})
        ckpt.wait()

        # resume
        restored = ckpt.restore(like=dict(params=params0, state=state0,
                                          opt_state=opt0))
    """

    def __init__(self, directory: str, *, max_to_keep: int = 3,
                 keep_best: bool = True, best_mode: str = "max"):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._keep_best = keep_best
        self._best_mode = best_mode
        best_fn = (lambda m: m.get("best", m.get("valid", 0.0))) if keep_best else None
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=best_fn,
                best_mode=best_mode,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, *, params, state=None, opt_state=None,
             metrics: Optional[Dict[str, float]] = None,
             meta: Optional[Dict[str, Any]] = None) -> None:
        """Enqueue an async save; returns as soon as device arrays are snapshotted."""
        ocp = self._ocp
        tree = {"params": params}
        if state is not None:
            tree["state"] = state
        if opt_state is not None:
            tree["opt_state"] = opt_state
        items = {"tree": ocp.args.StandardSave(tree)}
        if meta:
            items["meta"] = ocp.args.JsonSave(dict(meta))
        metrics = dict(metrics) if metrics else None
        if metrics is None and self._keep_best:
            # best_fn is set: a metric-less save must not confuse orbax's
            # best-step ordering — rank it strictly worse than any real metric.
            # Finite sentinel (not ±inf): orbax serializes metrics as JSON and
            # ±Infinity is not valid RFC-8259 JSON for external tooling.
            sentinel = -1e30 if self._best_mode == "max" else 1e30
            metrics = {"best": sentinel}
        self._mgr.save(step, args=ocp.args.Composite(**items), metrics=metrics)

    def restore(self, step: Optional[int] = None, *, like: Dict[str, Any],
                with_meta: bool = False):
        """Restore pytrees shaped like `like` (a dict with any of params/state/
        opt_state). step=None restores the latest."""
        ocp = self._ocp
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        like_tree = {k: v for k, v in like.items() if v is not None}
        items = {"tree": ocp.args.StandardRestore(like_tree)}
        if with_meta:
            items["meta"] = ocp.args.JsonRestore()
        out = self._mgr.restore(step, args=ocp.args.Composite(**items))
        if with_meta:
            return out["tree"], (out.get("meta") or {}), step
        return out["tree"]

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def wait(self) -> None:
        """Block until all enqueued saves are durably on disk."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._mgr.close()


def _main_smoke():  # pragma: no cover - manual driver
    import jax.numpy as jnp

    ck = AsyncCheckpointer("/tmp/ckpt_async_smoke", max_to_keep=2)
    p = {"w": jnp.ones((4, 4)), "layers": [jnp.zeros((2,)), jnp.arange(3.0)]}
    ck.save(0, params=p, metrics={"valid": 0.5}, meta={"lr": 1e-3})
    ck.wait()
    r = ck.restore(like={"params": jax.tree.map(jnp.zeros_like, p)})
    print(jax.tree.map(lambda a, b: bool((a == b).all()), r["params"], p))


if __name__ == "__main__":  # pragma: no cover
    _main_smoke()
