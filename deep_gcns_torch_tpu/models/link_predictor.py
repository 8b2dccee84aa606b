"""Link predictor head for ogbl-collab.

Rebuild of `examples/ogb/ogbl_collab/model.py:164-203`: score(i,j) =
sigmoid(MLP(x_i ⊙ x_j)) with Linear→[norm]→ReLU→dropout stacks and a bare final
Linear."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..nn.core import Linear, Module, dropout, make_norm

Array = jax.Array


@dataclass(frozen=True)
class LinkPredictor(Module):
    in_dim: int
    hidden_dim: int
    out_dim: int = 1
    num_layers: int = 3
    norm: Optional[str] = None
    dropout: float = 0.0

    def _lins(self):
        dims = ([self.in_dim] + [self.hidden_dim] * (self.num_layers - 1)
                + [self.out_dim])
        return [Linear(dims[i], dims[i + 1]) for i in range(len(dims) - 1)]

    def init(self, key):
        params, state = {"lins": [], "norms": []}, {"norms": []}
        lins = self._lins()
        for i, lin in enumerate(lins):
            p, _ = lin.init(jax.random.fold_in(key, i))
            params["lins"].append(p)
            if i < len(lins) - 1 and self.norm and self.norm.lower() != "none":
                nrm = make_norm(self.norm, self.hidden_dim)
                np_, ns = nrm.init(jax.random.fold_in(key, 100 + i))
                params["norms"].append(np_)
                state["norms"].append(ns)
        return params, state

    def apply(self, params, state, x_i, x_j, *, train: bool = False,
              rng: Optional[Array] = None, axis_name: Optional[str] = None, **kw):
        x = x_i * x_j
        lins = self._lins()
        has_norm = self.norm and self.norm.lower() != "none"
        new_norm_states = []
        for i, lin in enumerate(lins[:-1]):
            x, _ = lin.apply(params["lins"][i], {}, x)
            if has_norm:
                nrm = make_norm(self.norm, self.hidden_dim)
                x, ns = nrm.apply(params["norms"][i], state["norms"][i], x,
                                  train=train, axis_name=axis_name)
                new_norm_states.append(ns)
            x = jax.nn.relu(x)
            x = dropout(x, self.dropout, train=train,
                        rng=None if rng is None else jax.random.fold_in(rng, i))
        x, _ = lins[-1].apply(params["lins"][-1], {}, x)
        return jax.nn.sigmoid(x), {"norms": new_norm_states}
