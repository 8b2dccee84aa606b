"""Functional module core.

Design: modules are *config-only* frozen dataclasses; parameters and mutable state
(batch-norm running statistics) are explicit pytrees.  This is deliberately not a port
of `torch.nn` — explicit pytrees make `lax.scan` over stacked per-layer weights,
`jax.custom_vjp` reversible blocks, and `pjit` sharding annotations trivial, which is
where the TPU wins come from.

Protocol:
    params, state = module.init(key)
    out, state    = module.apply(params, state, *args, train=False, rng=None, **kw)

Conventions:
  * `rng` is a PRNG key; modules derive sub-keys deterministically via fold_in.
  * `mask` (optional bool [N]) marks valid rows — batch-norm statistics must ignore
    padding rows (XLA static-shape padding has no reference counterpart; the torch
    code never sees padding).
  * `axis_name` — when set and inside pmap/shard_map, batch-norm statistics are
    all-reduced across replicas (`lax.pmean`), the TPU-native replacement for
    DataParallel's per-replica BN.

Initialization matches torch defaults so that accuracy parity holds:
  * Linear: U(-1/√in, 1/√in) for weight and bias (torch.nn.Linear default).
  * Embedding: Xavier-uniform (reference Atom/BondEncoder,
    `gcn_lib/sparse/torch_nn.py:84,106`).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Any
State = Any


class Module:
    def init(self, key: Array) -> Tuple[Params, State]:
        raise NotImplementedError

    def apply(self, params: Params, state: State, *args, **kw) -> Tuple[Array, State]:
        raise NotImplementedError

    def __call__(self, params, state, *args, **kw):
        return self.apply(params, state, *args, **kw)


# ---------------------------------------------------------------------------
# activations (reference: `gcn_lib/sparse/torch_nn.py:9-20` act_layer)
# ---------------------------------------------------------------------------

def activation(act: Optional[str], x: Array, *, neg_slope: float = 0.2,
               prelu: Optional[Array] = None) -> Array:
    """Dispatch relu/leakyrelu/prelu (`gcn_lib/sparse/torch_nn.py:9-20` act_layer).

    For "prelu" the slope is the learnable `prelu` param when provided (modules
    that own one pass it through — MLP/BasicConv/GATConv/SemiGCNConv), else the
    static init slope `neg_slope` (reference init: `nn.PReLU(init=neg_slope)`).
    """
    if act is None or act.lower() == "none":
        return x
    a = act.lower()
    if a == "relu":
        return jax.nn.relu(x)
    if a == "leakyrelu":
        return jax.nn.leaky_relu(x, neg_slope)
    if a == "prelu":
        slope = neg_slope if prelu is None else prelu.astype(x.dtype)
        return jnp.where(x >= 0, x, slope * x)
    raise NotImplementedError(f"activation layer [{act}] is not found")


def prelu_init(act: Optional[str], neg_slope: float = 0.2) -> Optional[Array]:
    """Learnable PReLU slope param for modules whose act factory hits "prelu"
    (reference `nn.PReLU(num_parameters=1, init=neg_slope)`)."""
    if act is not None and act.lower() == "prelu":
        return jnp.full((1,), neg_slope, jnp.float32)
    return None


@dataclass(frozen=True)
class PReLU(Module):
    """PReLU with a single learned slope (torch: num_parameters=1, init=neg_slope)."""
    init_slope: float = 0.2

    def init(self, key):
        return {"a": jnp.asarray([self.init_slope], jnp.float32)}, {}

    def apply(self, params, state, x, **kw):
        a = params["a"]
        return jnp.where(x >= 0, x, a * x), state


@dataclass(frozen=True)
class Identity(Module):
    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, **kw):
        return x, state


# ---------------------------------------------------------------------------
# dropout
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _dropout_rng(x, rate: float, rng):
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0)


def _dropout_fwd(x, rate, rng):
    # Save ONLY the key: a stored keep-mask is a pred array (4 bytes/elem on TPU
    # — an 87MB residual per layer at arxiv scale), while regenerating it from
    # the key in the backward costs ~0.05ms of VPU. Deterministic by construction.
    return _dropout_rng(x, rate, rng), rng


def _dropout_bwd(rate, rng, g):
    keep = jax.random.bernoulli(rng, 1.0 - rate, g.shape)
    return jnp.where(keep, g / (1.0 - rate), 0), None


_dropout_rng.defvjp(_dropout_fwd, _dropout_bwd)


def dropout(x: Array, rate: float, *, train: bool, rng: Optional[Array],
            mask: Optional[Array] = None) -> Array:
    """Inverted dropout (torch F.dropout semantics). `mask` overrides sampling with a
    precomputed keep-mask already scaled (SharedDropout for reversible blocks,
    `eff_gcn_modules/rev/rev_layer.py:12-26`)."""
    if mask is not None:
        return x * mask if train else x
    if not train or rate <= 0.0:
        return x
    assert rng is not None, "dropout needs an rng key at train time"
    return _dropout_rng(x, rate, rng)


def shared_dropout_mask(rng: Array, shape, rate: float, dtype=jnp.float32) -> Array:
    """One bernoulli mask shared across all reversible layers
    (`examples/ogb_eff/ogbn_proteins/model_rev.py:101-102`)."""
    keep = jax.random.bernoulli(rng, 1.0 - rate, shape)
    return keep.astype(dtype) / (1.0 - rate)


# ---------------------------------------------------------------------------
# linear / embedding
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Linear(Module):
    in_dim: int
    out_dim: int
    bias: bool = True

    def init(self, key):
        kw, kb = jax.random.split(key)
        bound = 1.0 / (self.in_dim ** 0.5)
        p = {"w": jax.random.uniform(kw, (self.in_dim, self.out_dim), jnp.float32,
                                     -bound, bound)}
        if self.bias:
            p["b"] = jax.random.uniform(kb, (self.out_dim,), jnp.float32, -bound, bound)
        return p, {}

    def apply(self, params, state, x, *, compute_dtype=None, **kw):
        w = params["w"]
        if compute_dtype is not None:
            # bf16 matmul with f32 accumulation on the MXU; params stay f32
            # (master weights), bias added in f32.
            x = x.astype(compute_dtype)
            w = w.astype(compute_dtype)
            y = jnp.matmul(x, w, preferred_element_type=jnp.float32)
        else:
            y = x @ w
        if self.bias:
            y = y + params["b"]
        return y, state


@dataclass(frozen=True)
class Embedding(Module):
    num: int
    dim: int

    def init(self, key):
        # xavier uniform (fan_in=num, fan_out=dim) as in the reference encoders.
        bound = (6.0 / (self.num + self.dim)) ** 0.5
        return {"w": jax.random.uniform(key, (self.num, self.dim), jnp.float32,
                                        -bound, bound)}, {}

    def apply(self, params, state, idx, **kw):
        return jnp.take(params["w"], idx, axis=0), state


@dataclass(frozen=True)
class MultiEmbedding(Module):
    """Sum of per-column categorical embeddings — Atom/BondEncoder pattern
    (`gcn_lib/sparse/torch_nn.py:74-113`)."""
    dims: Tuple[int, ...]
    emb_dim: int

    def init(self, key):
        keys = jax.random.split(key, len(self.dims))
        tables = []
        for d, k in zip(self.dims, keys):
            bound = (6.0 / (d + self.emb_dim)) ** 0.5
            tables.append(jax.random.uniform(k, (d, self.emb_dim), jnp.float32,
                                             -bound, bound))
        return {"tables": tables}, {}

    def apply(self, params, state, x, **kw):
        # x: [N, F] int categorical features
        out = 0
        for i, tbl in enumerate(params["tables"]):
            out = out + jnp.take(tbl, x[:, i], axis=0)
        return out, state


# ---------------------------------------------------------------------------
# norms (reference: `gcn_lib/sparse/torch_nn.py:23-34` norm_layer)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class LayerNorm(Module):
    dim: int
    eps: float = 1e-5
    affine: bool = True

    def init(self, key):
        p = {}
        if self.affine:
            p = {"scale": jnp.ones((self.dim,)), "bias": jnp.zeros((self.dim,))}
        return p, {}

    def apply(self, params, state, x, **kw):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            y = y * params["scale"] + params["bias"]
        return y, state


@dataclass(frozen=True)
class BatchNorm(Module):
    """BatchNorm1d over the row axis of [N, C] (torch defaults: eps 1e-5, momentum 0.1,
    affine). Padding-aware (`mask`) and cross-replica capable (`axis_name`)."""
    dim: int
    eps: float = 1e-5
    momentum: float = 0.1
    affine: bool = True

    def init(self, key):
        p = {}
        if self.affine:
            p = {"scale": jnp.ones((self.dim,)), "bias": jnp.zeros((self.dim,))}
        s = {"mean": jnp.zeros((self.dim,)), "var": jnp.ones((self.dim,))}
        return p, s

    def apply(self, params, state, x, *, train: bool = False,
              mask: Optional[Array] = None, axis_name: Optional[str] = None, **kw):
        if train:
            # one-pass moments (E[x²] − E[x]²): both reductions read x once and
            # have no sequential dependency — the (x − mu)² form costs a second
            # full HBM pass over [N, C] per layer. f32 cancellation error is
            # ~mu²·1e-7, negligible for normalized residual streams.
            if mask is not None:
                m = mask[:, None].astype(x.dtype)
                xm = x * m
                cnt = jnp.maximum(jnp.sum(m), 1.0)
                mu = jnp.sum(xm, axis=0) / cnt
                ex2 = jnp.sum(xm * x, axis=0) / cnt
            else:
                cnt = jnp.asarray(x.shape[0], x.dtype)
                mu = jnp.mean(x, axis=0)
                ex2 = jnp.mean(x * x, axis=0)
            var = jnp.maximum(ex2 - jnp.square(mu), 0.0)
            if axis_name is not None:
                # cross-replica moments: E[x²] - E[x]² (assumes equal per-replica counts)
                ex2 = jax.lax.pmean(var + jnp.square(mu), axis_name)
                mu = jax.lax.pmean(mu, axis_name)
                var = ex2 - jnp.square(mu)
                cnt = jax.lax.psum(cnt, axis_name)
            # torch tracks *unbiased* variance in running stats, biased in normalization
            unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
            new_state = {
                "mean": (1 - self.momentum) * state["mean"] + self.momentum * mu,
                "var": (1 - self.momentum) * state["var"] + self.momentum * unbiased,
            }
        else:
            mu, var = state["mean"], state["var"]
            new_state = state
        y = (x - mu) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            y = y * params["scale"] + params["bias"]
        return y, new_state


@dataclass(frozen=True)
class InstanceNorm(Module):
    """InstanceNorm (affine=False per reference `torch_nn.py:31`): per-sample,
    per-channel normalization over the spatial axis. For flat [N, C] node data torch's
    InstanceNorm1d would see (C, N) per graph; here we normalize over axis 0 treating
    the whole (valid) row set as one instance."""
    dim: int
    eps: float = 1e-5

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, *, mask: Optional[Array] = None, **kw):
        if mask is not None:
            m = mask[:, None].astype(x.dtype)
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            mu = jnp.sum(x * m, axis=0) / cnt
            var = jnp.sum(jnp.square(x - mu) * m, axis=0) / cnt
        else:
            mu = jnp.mean(x, axis=0)
            var = jnp.mean(jnp.square(x - mu), axis=0)
        return (x - mu) * jax.lax.rsqrt(var + self.eps), state


def make_norm(norm: Optional[str], dim: int) -> Optional[Module]:
    """String → norm module (reference `norm_layer`, `torch_nn.py:23-34`)."""
    if norm is None or str(norm).lower() == "none":
        return None
    n = norm.lower()
    if n == "batch":
        return BatchNorm(dim)
    if n == "layer":
        return LayerNorm(dim)
    if n == "instance":
        return InstanceNorm(dim)
    raise NotImplementedError(f"normalization layer [{norm}] is not found")


# ---------------------------------------------------------------------------
# MLP (reference `gcn_lib/sparse/torch_nn.py:50-71`: Lin → norm → act → drop per
# layer; bare Linear at the end when last_lin)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MLP(Module):
    channels: Tuple[int, ...]
    act: Optional[str] = "relu"
    norm: Optional[str] = None
    bias: bool = True
    drop: float = 0.0
    last_lin: bool = False

    def __post_init__(self):
        object.__setattr__(self, "channels", tuple(self.channels))

    def _layers(self):
        layers = []
        n = len(self.channels)
        for i in range(1, n):
            lin = Linear(self.channels[i - 1], self.channels[i], self.bias)
            is_last = i == n - 1
            bare = is_last and self.last_lin
            norm = None if bare else make_norm(self.norm, self.channels[i])
            layers.append((lin, norm, not bare))
        return layers

    def init(self, key):
        params, state = [], []
        for i, (lin, norm, post) in enumerate(self._layers()):
            k = jax.random.fold_in(key, i)
            lp, _ = lin.init(k)
            entry = {"lin": lp}
            sentry = {}
            if norm is not None:
                np_, ns = norm.init(jax.random.fold_in(k, 1))
                entry["norm"] = np_
                sentry["norm"] = ns
            if post:  # post-processing layer → owns its act param
                pa = prelu_init(self.act)
                if pa is not None:
                    entry["prelu"] = pa
            params.append(entry)
            state.append(sentry)
        return params, state

    def apply(self, params, state, x, *, train: bool = False, rng: Optional[Array] = None,
              mask: Optional[Array] = None, axis_name: Optional[str] = None,
              compute_dtype=None, **kw):
        if not state:
            state = [{} for _ in self._layers()]
        new_state = []
        for i, (lin, norm, post) in enumerate(self._layers()):
            x, _ = lin.apply(params[i]["lin"], {}, x, compute_dtype=compute_dtype)
            sentry = {}
            if post:
                if norm is not None:
                    x, ns = norm.apply(params[i].get("norm", {}),
                                       state[i].get("norm", {}), x,
                                       train=train, mask=mask, axis_name=axis_name)
                    sentry["norm"] = ns
                x = activation(self.act, x, prelu=params[i].get("prelu"))
                if self.drop > 0:
                    r = None if rng is None else jax.random.fold_in(rng, i)
                    x = dropout(x, self.drop, train=train, rng=r)
            new_state.append(sentry)
        return x, new_state


def kaiming_reinit(params, key: Array):
    """Re-draw every 2-D weight leaf with kaiming-normal (std = √(2/fan_in)) and zero
    every 1-D bias — the reference's `model_init` convention
    (`examples/ppi/architecture.py:38-45`, `examples/modelnet_cls/architecture.py:63-70`).
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for i, (path, leaf) in enumerate(flat):
        name = path[-1].key if hasattr(path[-1], "key") else None
        if name == "w" and leaf.ndim == 2:
            std = (2.0 / leaf.shape[0]) ** 0.5
            out.append(jax.random.normal(jax.random.fold_in(key, i), leaf.shape,
                                         leaf.dtype) * std)
        elif name == "b":
            out.append(jnp.zeros_like(leaf))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def init_all(key: Array, modules: Sequence[Tuple[str, Module]]):
    """Init a dict of named modules → ({name: params}, {name: state})."""
    params, state = {}, {}
    for i, (name, mod) in enumerate(modules):
        p, s = mod.init(jax.random.fold_in(key, i))
        params[name], state[name] = p, s
    return params, state
