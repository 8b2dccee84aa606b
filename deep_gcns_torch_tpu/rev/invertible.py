"""O(1)-activation-memory reversible layer stack.

TPU-native replacement for `eff_gcn_modules/rev/gcn_revop.py:15-157`
(InvertibleCheckpointFunction): the torch version frees input storage in forward
(`:65`) and, per layer in backward, reconstructs the input via `fn_inverse` (`:100`),
re-runs the forward under grad and calls autograd.grad (`:122-140`).

Here the same schedule is a `jax.custom_vjp` around a `lax.scan` over stacked
per-layer parameters:
  * forward: scan of coupling forwards — custom_vjp means XLA saves NO per-layer
    residuals, only the final output;
  * backward: reverse scan that (1) inverts the coupling to rebuild the layer input,
    (2) runs `jax.vjp` of the single-layer forward for parameter/input/arg cotangents.
Activation memory is O(1) in depth — the enabler for 1001-layer RevGNN on one chip.

The torch RNG-state capture machinery (`gcn_revop.py:28-37, 89-96, 286-304`)
dissolves: determinism between forward and inverse is by construction (the shared
dropout mask and any PRNG keys are explicit scan-invariant arguments).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

Array = jax.Array


def make_reversible_scan(fwd_one: Callable, inv_one: Callable,
                         inv_vjp_one: Callable = None):
    """Build `run(stacked_params, h0, diff_args) -> hL`.

    fwd_one(params_l, h, diff_args) -> h_next   (pure, stateless)
    inv_one(params_l, h_next, diff_args) -> h   (exact inverse of fwd_one)
    inv_vjp_one(params_l, h_next, diff_args, g_next)
        -> (h, g_h, g_params, g_args)           (optional fused backward)

    `diff_args` is a pytree of float arrays shared by every layer (e.g. shared
    dropout mask, edge embeddings); cotangents for it are accumulated across layers
    (an edge embedding computed once and fed to all layers gets the summed gradient,
    matching torch autograd). Non-differentiable structure (the Graph) should be
    closed over by fwd_one/inv_one.

    When `inv_vjp_one` is given (e.g. `GroupAdditiveCoupling.inverse_and_vjp`),
    the backward uses it instead of inverse-then-`jax.vjp(fwd_one)` — for additive
    couplings the inverse can reuse the vjp's primal evaluation, saving one full
    layer evaluation (node-table gathers included) per layer of backward.
    """

    @jax.custom_vjp
    def run(stacked_params, h, diff_args):
        def body(carry, p):
            return fwd_one(p, carry, diff_args), None

        out, _ = jax.lax.scan(body, h, stacked_params)
        return out

    def run_fwd(stacked_params, h, diff_args):
        out = run(stacked_params, h, diff_args)
        return out, (stacked_params, out, diff_args)

    def run_bwd(res, g_out):
        stacked_params, y, diff_args = res
        zero_args = jax.tree_util.tree_map(jnp.zeros_like, diff_args)

        def body(carry, p):
            y, gy, ga = carry
            if inv_vjp_one is not None:
                x, gx, gp, gai = inv_vjp_one(p, y, diff_args, gy)
                x = jax.lax.stop_gradient(x)
            else:
                x = jax.lax.stop_gradient(inv_one(p, y, diff_args))
                _, vjp = jax.vjp(lambda p_, x_, a_: fwd_one(p_, x_, a_), p, x,
                                 diff_args)
                gp, gx, gai = vjp(gy)
            ga = jax.tree_util.tree_map(jnp.add, ga, gai)
            return (x, gx, ga), gp

        (_, gx, ga), gparams = jax.lax.scan(
            body, (y, g_out, zero_args), stacked_params, reverse=True)
        return gparams, gx, ga

    run.defvjp(run_fwd, run_bwd)
    return run
