"""Shared scaffolding for the example apps (the reference keeps a per-app OptInit
argparse class + main loop, e.g. `examples/ogb/ogbn_arxiv/{args,main}.py`; here the
common mechanics live in one place and each app stays a thin, flag-compatible CLI)."""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo root


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--use_gpu", action="store_true", help="(ignored; TPU-native)")
    p.add_argument("--platform", type=str, default="",
                   help="force jax platform (e.g. cpu) — useful for smoke tests")
    p.add_argument("--device", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--data_root", type=str, default="data/")
    p.add_argument("--exp_root", type=str, default="runs/")
    p.add_argument("--exp_name", type=str, default="exp")
    p.add_argument("--synthetic", action="store_true",
                   help="run on synthetic data (no dataset download available)")
    p.add_argument("--synthetic_nodes", type=int, default=4096)
    p.add_argument("--pretrained_model", type=str, default="",
                   help="checkpoint prefix to resume from")
    p.add_argument("--save_ckpt", action="store_true")
    p.add_argument("--optimizer", type=str, default="adam",
                   choices=["adam", "radam", "adamw_ref", "adamw"],
                   help="adam matches the reference apps (torch.optim.Adam, "
                        "e.g. `examples/ogb/ogbn_arxiv/main.py:88`); radam / "
                        "adamw_ref select the reference-exact reimplementations "
                        "of its utils/optim.py (quirks preserved — use for "
                        "parity runs)")
    p.add_argument("--weight_decay", type=float, default=0.0)
    return p


def make_optimizer(args, lr=None):
    """Build the optax transformation selected by --optimizer (reference-exact
    variants from deep_gcns_torch_tpu.utils.optim)."""
    from deep_gcns_torch_tpu.utils import optim as O

    lr = args.lr if lr is None else lr
    wd = getattr(args, "weight_decay", 0.0)
    name = getattr(args, "optimizer", "adam")
    if name == "adam":
        return O.adam(lr, wd)
    if name == "radam":
        return O.radam(lr, wd)
    if name == "adamw_ref":
        return O.adamw_ref(lr, weight_decay=wd)
    if name == "adamw":
        return O.adamw_warmup(lr, warmup_steps=0, weight_decay=wd)
    raise ValueError(name)


def add_deeper_gcn_flags(p: argparse.ArgumentParser, *, num_layers=28,
                         hidden=128, norm="batch", t=1.0, aggr="softmax"):
    """The reference's DeeperGCN flag surface (`examples/ogb/ogbn_arxiv/args.py`)."""
    p.add_argument("--num_layers", type=int, default=num_layers)
    p.add_argument("--hidden_channels", type=int, default=hidden)
    p.add_argument("--block", type=str, default="res+")
    p.add_argument("--conv", type=str, default="gen")
    p.add_argument("--gcn_aggr", type=str, default=aggr)
    p.add_argument("--norm", type=str, default=norm)
    p.add_argument("--mlp_layers", type=int, default=1)
    p.add_argument("--t", type=float, default=t)
    p.add_argument("--learn_t", action="store_true")
    p.add_argument("--p", type=float, default=1.0)
    p.add_argument("--learn_p", action="store_true")
    p.add_argument("--y", type=float, default=0.0)
    p.add_argument("--learn_y", action="store_true")
    p.add_argument("--msg_norm", action="store_true")
    p.add_argument("--learn_msg_scale", action="store_true")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="bfloat16 halves HBM traffic on the conv hot path")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the layer scan (torch.utils.checkpoint "
                        "analog) — only needed for very deep nets on very large "
                        "partitions; costs a re-forward per layer in the backward")
    return p


def add_spatial_flags(p: argparse.ArgumentParser):
    """Edge-partitioned spatial parallelism (parallel/spatial.py) — exact
    full-graph training over a device mesh; the reference has no multi-device
    training story at all (lossy per-cluster subgraphs only)."""
    p.add_argument("--spatial", type=int, default=1,
                   help="partition the graph's edges over N devices "
                        "(halo exchange over ICI); 1 = single chip")
    p.add_argument("--exchange", type=str, default="auto",
                   choices=["auto", "halo", "allgather"],
                   help="spatial source-row exchange strategy")
    p.add_argument("--tp", type=int, default=1,
                   help="shard the hidden dim over N devices (tensor "
                        "parallelism, parallel/tensor.py); composes with "
                        "--spatial on a 2-D mesh (spatial x tp devices)")
    return p


def apply_spatial_env(args):
    """CPU-mesh support: force N virtual host devices BEFORE the first jax
    import (XLA reads the flag at backend init).  Applied for ANY --spatial N
    run — the flag only multiplies the CPU backend's devices, so it is a no-op
    when an accelerator platform wins, and it saves a CPU-only host from
    hitting the mesh device-count assert when --platform cpu was omitted."""
    n_dev = getattr(args, "spatial", 1) * getattr(args, "tp", 1)
    if n_dev > 1:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_dev}"
            ).strip()
    return args


def select_platform(args, *, attach_hint_s: float = 20.0):
    """Apply --platform and probe the backend, flagging a stalled TPU attach.

    Attaching to a TPU chip held by another process blocks indefinitely (one
    process at a time over the tunnel) and the runtime exposes no connect
    timeout, so run a watchdog: if the first device probe hasn't returned
    after `attach_hint_s`, print an actionable hint pointing at
    `--platform cpu`. Returns jax.devices().
    """
    import threading

    import jax

    if getattr(args, "platform", ""):
        jax.config.update("jax_platforms", args.platform)
    done = threading.Event()

    def _watch():
        if not done.wait(attach_hint_s):
            print(
                f"[examples] still attaching to the accelerator after "
                f"{attach_hint_s:.0f}s — the TPU chip is likely held by another "
                "process. Re-run with --platform cpu for a CPU smoke test, or "
                "free the chip and retry.",
                file=sys.stderr, flush=True)

    threading.Thread(target=_watch, daemon=True).start()
    try:
        return jax.devices()
    finally:
        done.set()


def setup_experiment(args, name: str):
    from deep_gcns_torch_tpu.utils.logger import (ScalarLogger, create_exp_dir,
                                                  setup_logging)

    exp = create_exp_dir(args.exp_root, f"{name}-{args.exp_name}")
    logger = setup_logging(exp)
    logger.info("args: %s", vars(args))
    return exp, logger, ScalarLogger(exp)


class EpochTimer:
    def __init__(self):
        self.t0 = time.time()
        self.times = []

    def lap(self):
        t = time.time()
        self.times.append(t - self.t0)
        self.t0 = t
        return self.times[-1]

    def mean(self):
        return float(np.mean(self.times)) if self.times else 0.0


def reorder_and_band(args, g, labels, splits, rng):
    """Shared --reorder/--band post-pass: relabel the graph by a locality
    permutation (node arrays and split index sets move consistently) and
    attach the band-dense adjacency.  Works on an already-built Graph
    (rebuilds it when a permutation applies).  Metrics are
    permutation-invariant; call BEFORE jax.device_put."""
    import numpy as np

    reorder = getattr(args, "reorder", "none")
    band = getattr(args, "band", "off")
    if reorder == "none" and band == "off":
        return g, labels, splits
    from deep_gcns_torch_tpu.graph import attach_band, build_graph

    if reorder != "none":
        from deep_gcns_torch_tpu.data.reorder import (cluster_order,
                                                      invert_permutation,
                                                      permute_graph, rcm_order)

        n = int(np.sum(np.asarray(g.node_mask)))
        n_edge = int(g.n_edge)
        s = np.asarray(g.senders)[:n_edge]
        r = np.asarray(g.receivers)[:n_edge]
        x = np.asarray(g.x)[:n]
        if reorder == "rcm":
            perm = rcm_order(s, r, n)
        else:
            perm = cluster_order(s, r, n, cluster_size=16384)
        s, r, x, labels = permute_graph(perm, s, r, x, np.asarray(labels))
        inv = invert_permutation(perm)
        splits = {k: inv[np.asarray(v)] for k, v in splits.items()}
        g = build_graph(x, s, r, num_nodes=n)
    if band != "off":
        g = attach_band(g, hubs=("auto" if getattr(args, "band_hubs", "auto")
                                 == "auto" else None))
        import logging

        logging.getLogger("deep_gcns_torch_tpu").info(
            "band attached: window=%d coverage=%.3f (bwd %.3f)",
            g.band.fwd.window, g.band.fwd.coverage, g.band.bwd.coverage)
    return g, labels, splits
