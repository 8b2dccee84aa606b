"""Grouped additive reversible coupling.

TPU-native rebuild of `eff_gcn_modules/rev/memgcn.py:9-52` as a pure (forward,
inverse) function pair: split x into G feature chunks; y_i = x_i + F_i(y_{i-1});
y_0's input is Σ x_{1..G-1}; the additive structure gives an *exact* inverse, so the
backward pass can reconstruct inputs instead of storing them (invertible.py).

Extra per-edge/per-node args (dropout mask, edge embeddings) are chunked alongside,
exactly like the reference (`memgcn.py:19-20`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import Module

Array = jax.Array


def _chunk(x: Optional[Array], group: int):
    if x is None:
        return [None] * group
    return jnp.split(x, group, axis=-1)


@dataclass(frozen=True)
class GroupAdditiveCoupling(Module):
    """fm is the per-group function (e.g. a GENBlock working on C/G channels);
    each group has independent parameters (stacked on a leading G axis)."""
    fm: Module
    group: int = 2

    def init(self, key):
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(self.group))
        params, state = jax.vmap(self.fm.init)(keys)
        # reversible path requires stateless fms (layer-norm etc.); batch-norm's
        # running stats would break exact inversion bookkeeping under scan.
        assert not jax.tree_util.tree_leaves(state), (
            "GroupAdditiveCoupling requires stateless group functions "
            "(use norm='layer'); got non-empty state")
        return params, {}

    def _fm(self, params, i, x, g, **kw):
        p_i = jax.tree_util.tree_map(lambda a: a[i], params)
        y, _ = self.fm.apply(p_i, {}, x, g, **kw)
        return y

    def apply(self, params, state, x, g, *, chunked_args: Tuple[Any, ...] = (),
              **kw):
        return self.forward(params, x, g, *chunked_args, **kw), state

    def forward(self, params, x, g, *args, **kw):
        xs = _chunk(x, self.group)
        args_chunks = list(zip(*[_chunk(a, self.group) for a in args])) or \
            [()] * self.group
        # reference: y_0's input is Σ x_{1..} (empty sum → 0 for group=1)
        y_in = sum(xs[1:]) if self.group > 1 else jnp.zeros_like(xs[0])
        ys = []
        for i in range(self.group):
            fmd = self._fm(params, i, y_in, g, chunk_args=args_chunks[i], **kw)
            y = xs[i] + fmd
            y_in = y
            ys.append(y)
        return jnp.concatenate(ys, axis=-1)

    def inverse(self, params, y, g, *args, **kw):
        ys = _chunk(y, self.group)
        args_chunks = list(zip(*[_chunk(a, self.group) for a in args])) or \
            [()] * self.group
        xs = []
        for i in range(self.group - 1, -1, -1):
            if i != 0:
                y_in = ys[i - 1]
            else:
                y_in = sum(xs) if xs else jnp.zeros_like(ys[0])
            fmd = self._fm(params, i, y_in, g, chunk_args=args_chunks[i], **kw)
            xs.append(ys[i] - fmd)
        return jnp.concatenate(xs[::-1], axis=-1)

    def inverse_and_vjp(self, params, y, g, gy, *args, **kw):
        """Fused inverse + VJP for the backward pass of the reversible engine.

        The additive structure means the term subtracted in `inverse`
        (F_i(u_i)) is exactly the primal that `jax.vjp` of the forward would
        recompute at the same point u_i — so evaluate each group function ONCE
        via jax.vjp, reuse its primal for the reconstruction, and chain the
        cotangents by hand:

            y_i = x_i + F_i(u_i),  u_i = y_{i-1} (i>0),  u_0 = Σ_{j≥1} x_j
            ⇒ gx_i = gy_i^tot;  gu_i routes to gy_{i-1} (i>0) or to gx_{j≥1}.

        Returns (x, gx, gparams, gargs). Saves one full group-function
        evaluation (its node-table gather included) per group per layer vs
        inverse + jax.vjp(forward) — ~25% of the reversible backward at
        RevGAT/RevGCN scale, where the edge gathers dominate.
        """
        G = self.group
        ys = _chunk(y, G)
        gys = list(_chunk(gy, G))
        args_chunks = list(zip(*[_chunk(a, G) for a in args])) or [()] * G
        xs = [None] * G
        gxs = [None] * G
        gps = [None] * G
        gargs = [None] * G

        def f(p_, u_, a_):
            out, _ = self.fm.apply(p_, {}, u_, g, chunk_args=a_, **kw)
            return out

        for i in range(G - 1, -1, -1):
            if i > 0:
                u_i = ys[i - 1]
            else:
                u_i = sum(xs[1:]) if G > 1 else jnp.zeros_like(ys[0])
            u_i = jax.lax.stop_gradient(u_i)
            p_i = jax.tree_util.tree_map(lambda a: a[i], params)
            prim, vjp = jax.vjp(f, p_i, u_i, args_chunks[i])
            xs[i] = ys[i] - prim
            gy_tot = gys[i]
            gp_i, gu_i, ga_i = vjp(gy_tot)
            gxs[i] = gy_tot
            gps[i] = gp_i
            gargs[i] = ga_i
            if i > 0:
                gys[i - 1] = gys[i - 1] + gu_i
            else:
                for j in range(1, G):
                    gxs[j] = gxs[j] + gu_i
        x = jnp.concatenate(xs, axis=-1)
        gx = jnp.concatenate(gxs, axis=-1)
        gparams = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *gps)
        gargs_full = []
        for k, a in enumerate(args):
            if a is None:
                gargs_full.append(None)
            else:
                gargs_full.append(jnp.concatenate([gargs[i][k] for i in range(G)],
                                                  axis=-1))
        return x, gx, gparams, tuple(gargs_full)
