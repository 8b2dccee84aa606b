"""Dense (batched point-cloud) graph conv path.

TPU-native rebuild of `gcn_lib/dense/` with channels-LAST layout ``[B, N, K, C]``
(the reference uses ``B×C×N×K``; channels-last keeps the contraction dimension
innermost, which is what the MXU wants — a 1×1 Conv2d is exactly a matmul over C).

Semantics parity:
  * `BasicConv` (`gcn_lib/dense/torch_nn.py:48-72`): per stage Conv1×1 → act →
    norm → dropout, kaiming-normal weight init, zero bias.
  * `batched_index_select` (`torch_nn.py:75-96`) becomes `take_along_axis`.
  * `EdgeConv2d` / `MRConv2d` (`gcn_lib/dense/torch_vertex.py:8-35`).
  * blocks (`torch_vertex.py:75-116`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import Module, activation, dropout, prelu_init
from ..ops.gather import gather_neighbors
from ..ops.knn import dilated_knn_graph_dense

Array = jax.Array


def batched_index_select(x: Array, idx: Array) -> Array:
    """x: [B, N, C], idx: [B, N, K] → neighbor features [B, N, K, C]."""
    return jax.vmap(lambda xb, ib: jnp.take(xb, ib, axis=0, mode="clip"))(x, idx)


def _check_canonical_centers(centers: Optional[Array]) -> None:
    """EdgeConv2d/MRConv2d assume centers == broadcast arange(N) and broadcast
    x_i instead of gathering it (VJP is a k-reduce, not a scatter). A caller
    passing non-canonical centers would silently get wrong output — catch it
    when the array is concrete (eager / constant-folded). Tracers (the normal
    jit path) are skipped: every producer in this framework (ops/knn.py) emits
    the canonical arange.
    """
    if centers is None or isinstance(centers, jax.core.Tracer):
        return
    import numpy as _np

    c = _np.asarray(centers)
    want = _np.arange(c.shape[-2], dtype=c.dtype)[:, None]
    if not (c == want).all():
        raise ValueError(
            "EdgeConv2d/MRConv2d require canonical centers (broadcast arange(N)); "
            "got a non-canonical center index array. Gather the features with "
            "batched_index_select yourself or reorder the edge_index.")


# ---------------------------------------------------------------------------
# norms over dense layout
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class BatchNorm2d(Module):
    """Per-channel BN over all (B, N, K) positions — torch BatchNorm2d on B×C×N×K."""
    dim: int
    eps: float = 1e-5
    momentum: float = 0.1

    def init(self, key):
        return ({"scale": jnp.ones((self.dim,)), "bias": jnp.zeros((self.dim,))},
                {"mean": jnp.zeros((self.dim,)), "var": jnp.ones((self.dim,))})

    def apply(self, params, state, x, *, train=False, axis_name=None, **kw):
        red = tuple(range(x.ndim - 1))
        if train:
            mu = jnp.mean(x, axis=red)
            var = jnp.mean(jnp.square(x - mu), axis=red)
            cnt = jnp.asarray(x.size / x.shape[-1], x.dtype)
            if axis_name is not None:
                ex2 = jax.lax.pmean(var + jnp.square(mu), axis_name)
                mu = jax.lax.pmean(mu, axis_name)
                var = ex2 - jnp.square(mu)
                cnt = jax.lax.psum(cnt, axis_name)
            unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
            new_state = {"mean": (1 - self.momentum) * state["mean"] + self.momentum * mu,
                         "var": (1 - self.momentum) * state["var"] + self.momentum * unbiased}
        else:
            mu, var = state["mean"], state["var"]
            new_state = state
        y = (x - mu) * jax.lax.rsqrt(var + self.eps)
        return y * params["scale"] + params["bias"], new_state


@dataclass(frozen=True)
class InstanceNorm2d(Module):
    """Per (batch, channel) normalization over spatial dims (affine=False)."""
    dim: int
    eps: float = 1e-5

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, **kw):
        red = tuple(range(1, x.ndim - 1))
        mu = jnp.mean(x, axis=red, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=red, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + self.eps), state


def make_norm2d(norm: Optional[str], dim: int) -> Optional[Module]:
    if norm is None or str(norm).lower() == "none":
        return None
    n = norm.lower()
    if n == "batch":
        return BatchNorm2d(dim)
    if n == "instance":
        return InstanceNorm2d(dim)
    raise NotImplementedError(f"normalization layer [{norm}] is not found")


# ---------------------------------------------------------------------------
# BasicConv: stacks of 1×1 conv (= matmul over C) → act → norm → drop
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class BasicConv(Module):
    channels: Tuple[int, ...]
    act: Optional[str] = "relu"
    norm: Optional[str] = None
    bias: bool = True
    drop: float = 0.0
    compute_dtype: Optional[str] = None  # e.g. "bfloat16": bf16 matmul, f32 accum

    def __post_init__(self):
        object.__setattr__(self, "channels", tuple(self.channels))

    def _stages(self):
        out = []
        for i in range(1, len(self.channels)):
            out.append((self.channels[i - 1], self.channels[i],
                        make_norm2d(self.norm, self.channels[i])))
        return out

    def init(self, key):
        params, state = [], []
        for i, (cin, cout, nrm) in enumerate(self._stages()):
            k = jax.random.fold_in(key, i)
            w = jax.random.normal(k, (cin, cout), jnp.float32) * (2.0 / cin) ** 0.5
            entry = {"w": w}
            if self.bias:
                entry["b"] = jnp.zeros((cout,))
            sentry = {}
            if nrm is not None:
                entry["norm"], sentry["norm"] = nrm.init(jax.random.fold_in(k, 1))
            pa = prelu_init(self.act)
            if pa is not None:
                entry["prelu"] = pa
            params.append(entry)
            state.append(sentry)
        return params, state

    def apply(self, params, state, x, *, train=False, rng=None, axis_name=None, **kw):
        new_state = []
        for i, (cin, cout, nrm) in enumerate(self._stages()):
            if self.compute_dtype is not None:
                cd = jnp.dtype(self.compute_dtype)
                x = jnp.matmul(x.astype(cd), params[i]["w"].astype(cd),
                               preferred_element_type=jnp.float32)
            else:
                x = x @ params[i]["w"]
            if self.bias:
                x = x + params[i]["b"]
            if self.act is not None and str(self.act).lower() != "none":
                x = activation(self.act, x, prelu=params[i].get("prelu"))
            sentry = {}
            if nrm is not None:
                x, ns = nrm.apply(params[i]["norm"], state[i]["norm"], x, train=train,
                                  axis_name=axis_name)
                sentry["norm"] = ns
            if self.drop > 0:
                r = None if rng is None else jax.random.fold_in(rng, i)
                x = dropout(x, self.drop, train=train, rng=r)
            new_state.append(sentry)
        return x, new_state


# ---------------------------------------------------------------------------
# convs
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class EdgeConv2d(Module):
    """max_k BasicConv([x_i ‖ x_j − x_i]) (`gcn_lib/dense/torch_vertex.py:23-35`).

    Contract: edge_index = (nn_idx, centers) with centers the CANONICAL arange
    (every producer in this framework — ops/knn.py — emits that); centers are
    not gathered, x_i is a broadcast, so non-canonical centers are unsupported.
    """
    in_dim: int
    out_dim: int
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True
    compute_dtype: Optional[str] = None

    def _nn(self):
        return BasicConv((self.in_dim * 2, self.out_dim), self.act, self.norm,
                         self.bias, compute_dtype=self.compute_dtype)

    def init(self, key):
        return self._nn().init(key)

    def apply(self, params, state, x, edge_index, *, train=False, rng=None,
              axis_name=None, **kw):
        nn_idx, centers = edge_index
        _check_canonical_centers(centers)
        if self.compute_dtype is not None:
            # cast BEFORE the gather: halves the dominant [B,N,K,C] HBM traffic
            x = x.astype(jnp.dtype(self.compute_dtype))
        # centers are always the canonical arange in this framework (ops/knn.py),
        # so x_i is a broadcast — its VJP is a k-reduce, not a scatter
        x_i = jnp.broadcast_to(x[:, :, None, :], nn_idx.shape + x.shape[-1:])
        x_j = gather_neighbors(x, nn_idx)
        h = jnp.concatenate([x_i, x_j - x_i], axis=-1)  # [B, N, K, 2C]
        y, ns = self._nn().apply(params, state, h, train=train, rng=rng,
                                 axis_name=axis_name)
        return jnp.max(y, axis=2), ns  # [B, N, C']


@dataclass(frozen=True)
class MRConv2d(Module):
    """BasicConv([x ‖ max_k(x_j − x_i)]) (`torch_vertex.py:8-20`).

    Contract: centers must be the canonical arange (see EdgeConv2d)."""
    in_dim: int
    out_dim: int
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True
    compute_dtype: Optional[str] = None

    def _nn(self):
        return BasicConv((self.in_dim * 2, self.out_dim), self.act, self.norm,
                         self.bias, compute_dtype=self.compute_dtype)

    def init(self, key):
        return self._nn().init(key)

    def apply(self, params, state, x, edge_index, *, train=False, rng=None,
              axis_name=None, **kw):
        nn_idx, centers = edge_index
        _check_canonical_centers(centers)
        if self.compute_dtype is not None:
            x = x.astype(jnp.dtype(self.compute_dtype))
        x_i = x[:, :, None, :]
        x_j = gather_neighbors(x, nn_idx)
        rel = jnp.max(x_j - x_i, axis=2)  # [B, N, C]
        h = jnp.concatenate([x, rel], axis=-1)[:, :, None, :]  # [B, N, 1, 2C]
        y, ns = self._nn().apply(params, state, h, train=train, rng=rng,
                                 axis_name=axis_name)
        return y[:, :, 0, :], ns


def graph_conv2d(in_dim: int, out_dim: int, conv: str = "edge", act: str = "relu",
                 norm: Optional[str] = None, bias: bool = True,
                 compute_dtype: Optional[str] = None) -> Module:
    if conv == "edge":
        return EdgeConv2d(in_dim, out_dim, act, norm, bias, compute_dtype)
    if conv == "mr":
        return MRConv2d(in_dim, out_dim, act, norm, bias, compute_dtype)
    raise NotImplementedError(f"conv:{conv} is not supported")


@dataclass(frozen=True)
class DynConv2d(Module):
    """Graph conv on a per-forward dilated kNN graph (`torch_vertex.py:55-72`)."""
    in_dim: int
    out_dim: int
    kernel_size: int = 9
    dilation: int = 1
    conv: str = "edge"
    act: str = "relu"
    norm: Optional[str] = None
    bias: bool = True
    stochastic: bool = False
    epsilon: float = 0.0
    knn_method: str = "exact"   # "approx" = subsample + PartialReduce (ops/knn.py)
    compute_dtype: Optional[str] = None

    def _conv(self):
        return graph_conv2d(self.in_dim, self.out_dim, self.conv, self.act, self.norm,
                            self.bias, self.compute_dtype)

    def init(self, key):
        return self._conv().init(key)

    def apply(self, params, state, x, edge_index=None, *, train=False, rng=None,
              axis_name=None, **kw):
        if edge_index is None:
            krng = None if rng is None else jax.random.fold_in(rng, 23)
            edge_index = dilated_knn_graph_dense(
                x, self.kernel_size, self.dilation, stochastic=self.stochastic,
                epsilon=self.epsilon, train=train, rng=krng,
                method=self.knn_method)
        return self._conv().apply(params, state, x, edge_index, train=train, rng=rng,
                                  axis_name=axis_name)


def _block2d(body: Module, kind: str, res_scale: float = 1.0):
    @dataclass(frozen=True)
    class _Block(Module):
        def init(self, key):
            return body.init(key)

        def apply(self, params, state, x, edge_index=None, **kw):
            y, ns = body.apply(params, state, x, edge_index, **kw)
            if kind == "res":
                return y + x * res_scale, ns
            if kind == "dense":
                return jnp.concatenate([x, y], axis=-1), ns
            return y, ns

    return _Block()


def PlainDynBlock2d(in_channels, kernel_size=9, dilation=1, conv="edge", act="relu",
                    norm=None, bias=True, stochastic=False, epsilon=0.0,
                    knn_method="exact", compute_dtype=None):
    return _block2d(DynConv2d(in_channels, in_channels, kernel_size, dilation, conv,
                              act, norm, bias, stochastic, epsilon, knn_method,
                              compute_dtype), "plain")


def ResDynBlock2d(in_channels, kernel_size=9, dilation=1, conv="edge", act="relu",
                  norm=None, bias=True, stochastic=False, epsilon=0.0, res_scale=1.0,
                  knn_method="exact", compute_dtype=None):
    return _block2d(DynConv2d(in_channels, in_channels, kernel_size, dilation, conv,
                              act, norm, bias, stochastic, epsilon, knn_method,
                              compute_dtype), "res", res_scale)


def DenseDynBlock2d(in_channels, out_channels=64, kernel_size=9, dilation=1,
                    conv="edge", act="relu", norm=None, bias=True, stochastic=False,
                    epsilon=0.0, knn_method="exact", compute_dtype=None):
    return _block2d(DynConv2d(in_channels, out_channels, kernel_size, dilation, conv,
                              act, norm, bias, stochastic, epsilon, knn_method,
                              compute_dtype), "dense")
