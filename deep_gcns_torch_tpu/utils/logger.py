"""Experiment logging infra.

Mirrors the reference's conventions:
  * experiment dirs named  name ⊕ key-hyperparams ⊕ timestamp ⊕ uuid with a source
    snapshot copied in (`examples/sem_seg_dense/config.py:100-125`,
    `utils/logger.py:17-26`);
  * python logging to file + stdout (`config.py:135-159`);
  * CSV best-result dump (`utils/logger.py:6-14`);
  * lightweight scalar logging to JSONL (host-side stand-in for TensorBoard
    SummaryWriter; plus optional TensorBoard via tensorboardX if installed).
"""

from __future__ import annotations

import glob
import json
import logging
import os
import shutil
import time
import uuid
from typing import Optional


def create_exp_dir(root: str, name: str, snapshot_src: Optional[str] = None) -> str:
    """Create `{root}/{name}-{timestamp}-{uuid}` (+ code snapshot)."""
    stamp = time.strftime("%Y%m%d-%H%M%S")
    exp = os.path.join(root, f"{name}-{stamp}-{uuid.uuid4().hex[:8]}")
    os.makedirs(exp, exist_ok=True)
    if snapshot_src:
        dst = os.path.join(exp, "code_snapshot")
        os.makedirs(dst, exist_ok=True)
        for f in glob.glob(os.path.join(snapshot_src, "**", "*.py"), recursive=True):
            rel = os.path.relpath(f, snapshot_src)
            out = os.path.join(dst, rel)
            os.makedirs(os.path.dirname(out), exist_ok=True)
            shutil.copyfile(f, out)
    return exp


def setup_logging(exp_dir: str, level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger("deep_gcns_torch_tpu")
    logger.setLevel(level)
    logger.handlers.clear()
    fh = logging.FileHandler(os.path.join(exp_dir, "log.txt"))
    sh = logging.StreamHandler()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    fh.setFormatter(fmt)
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    return logger


class ScalarLogger:
    """Append-only JSONL summary log — the headless replacement for the
    reference's TF1 `TfLogger` (`utils/tf_logger.py:17-110`): scalars and
    histograms go to JSONL lines; mesh/point-cloud summaries go to PLY files
    (the TensorBoard mesh plugin has no headless analog in this image)."""

    def __init__(self, exp_dir: str):
        self.exp_dir = exp_dir
        self.path = os.path.join(exp_dir, "scalars.jsonl")

    def log(self, step: int, **scalars):
        with open(self.path, "a") as f:
            for k, v in scalars.items():
                f.write(json.dumps({"step": int(step), "tag": k,
                                    "value": float(v)}) + "\n")

    def log_histogram(self, step: int, tag: str, values, bins: int = 30):
        """Histogram summary (`tf_logger.py::histo_summary` analog): bucket
        counts + edges + moments as one JSONL line."""
        import numpy as np

        v = np.asarray(values).reshape(-1).astype(np.float64)
        counts, edges = np.histogram(v, bins=bins)
        rec = {"step": int(step), "tag": tag, "kind": "histogram",
               "min": float(v.min()) if v.size else 0.0,
               "max": float(v.max()) if v.size else 0.0,
               "mean": float(v.mean()) if v.size else 0.0,
               "std": float(v.std()) if v.size else 0.0,
               "counts": counts.tolist(),
               "edges": np.round(edges, 6).tolist()}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def log_mesh(self, step: int, tag: str, points, colors=None, labels=None):
        """Point-cloud/mesh summary (`tf_logger.py::mesh_summary` analog):
        writes `{exp}/meshes/{tag}_{step}.ply`, returns the path."""
        from .pc_export import write_ply

        path = os.path.join(self.exp_dir, "meshes", f"{tag}_{step}.ply")
        return write_ply(path, points, colors=colors, labels=labels)


def save_best_result(csv_path: str, name: str, **metrics):
    """CSV best-result dump (`utils/logger.py:6-14`)."""
    new = not os.path.exists(csv_path)
    with open(csv_path, "a") as f:
        if new:
            f.write("name," + ",".join(metrics.keys()) + "\n")
        f.write(name + "," + ",".join(str(v) for v in metrics.values()) + "\n")
