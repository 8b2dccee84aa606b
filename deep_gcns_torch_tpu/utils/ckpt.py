"""Checkpoint save/load.

TPU-native equivalent of `utils/ckpt_util.py:9-129`: the checkpoint payload keeps the
reference's schema {epoch, model (params+state), optimizer, best_value, lr-ish extras}
but serializes JAX pytrees to a single .npz (flattened path→array) — no pickle of
code, no device state; restoring works on any backend.  The reference's
DataParallel `module.` prefix reconciliation (`:51-64`) has no analog here (pytrees
are layout-free), and its best-copy convention (`:107-111`) is kept.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _treedef_of(tree):
    return jax.tree_util.tree_structure(tree)


def save_ckpt(path: str, *, params, state=None, opt_state=None, epoch: int = 0,
              best_value: float = -float("inf"), extra: Optional[dict] = None):
    """Write `{path}.npz` (+ `.json` metadata). Mirrors `save_ckpt`
    (`utils/ckpt_util.py:9-24`)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    for name, tree in (("params", params), ("state", state), ("opt", opt_state)):
        if tree is not None:
            for k, v in _flatten(tree).items():
                arrays[f"{name}|{k}"] = v
    np.savez(path + ".npz", **arrays)
    meta = {"epoch": int(epoch), "best_value": float(best_value)}
    if extra:
        meta.update(extra)
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load_ckpt(path: str, *, params_like, state_like=None, opt_like=None
              ) -> Tuple[Any, Any, Any, dict]:
    """Restore pytrees shaped like the provided templates + metadata dict.

    Mirrors `load_pretrained_models` / `load_pretrained_optimizer`
    (`utils/ckpt_util.py:27-104`)."""
    data = np.load(path + ".npz")
    meta = {}
    if os.path.exists(path + ".json"):
        meta = json.load(open(path + ".json"))

    def restore(name, like):
        if like is None:
            return None
        flat_like, treedef = jax.tree_util.tree_flatten_with_path(like)
        leaves = []
        for p, leaf in flat_like:
            key = name + "|" + "/".join(
                str(getattr(q, "key", getattr(q, "idx", q))) for q in p)
            if key not in data:
                raise KeyError(f"checkpoint missing {key}")
            arr = data[key]
            if arr.shape != np.shape(leaf):
                raise ValueError(f"shape mismatch for {key}: "
                                 f"{arr.shape} vs {np.shape(leaf)}")
            leaves.append(arr)
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(like), leaves)

    return (restore("params", params_like), restore("state", state_like),
            restore("opt", opt_like), meta)


def save_best(path: str, is_best: bool):
    """Copy `{path}.npz/.json` to `{path}_best.*` (reference `save_checkpoint`
    best-copy, `utils/ckpt_util.py:107-111`)."""
    if not is_best:
        return
    for ext in (".npz", ".json"):
        if os.path.exists(path + ext):
            shutil.copyfile(path + ext, path + "_best" + ext)
