"""Fused guided-optimization steps.

The reference leaves the optimization loop to user scripts (SURVEY §3.1):
`loss(drawer.synthesize()).backward(); optimizer.step()` — one dispatch per
op, autograd tape per step. The TPU-native equivalent fuses synthesize ->
k losses -> VJP -> optimizer update into ONE compiled XLA program per step
(and `run_on_device` goes further: the whole N-step loop becomes a single
lax.scan program, so there are zero host round-trips during optimization).

The reference's manual `GradientCheckpoint` for sharing the synthesize
prefix across losses (reference perceptor/utils/gradient_checkpoint.py:57)
is obsolete here: one value_and_grad over the summed losses reuses the
prefix automatically.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


def make_guidance_step(
    synthesize: Callable,
    losses: Sequence[Callable],
    optimizer: optax.GradientTransformation,
    loss_weights: Optional[Sequence[float]] = None,
):
    """Returns jitted `step(params, opt_state) -> (params, opt_state, aux)`.

    `synthesize(params) -> images`; each loss maps images -> scalar.
    """
    weights = list(loss_weights) if loss_weights is not None else [1.0] * len(losses)

    def total_loss(params):
        images = synthesize(params)
        values = jnp.stack([loss(images) for loss in losses])
        total = jnp.sum(values * jnp.asarray(weights))
        return total, values

    @jax.jit
    def step(params, opt_state):
        (loss, values), grads = jax.value_and_grad(total_loss, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "losses": values}

    return step


def optimize(
    drawer,
    losses: Sequence[Callable],
    n_steps: int = 100,
    optimizer: Optional[optax.GradientTransformation] = None,
    loss_weights: Optional[Sequence[float]] = None,
    callback: Optional[Callable] = None,
):
    """Host-loop convenience: optimize the drawer's params in place.

    Returns (drawer, history of total losses).
    """
    optimizer = optimizer or optax.adam(0.05)
    step = make_guidance_step(drawer.synthesize, losses, optimizer, loss_weights)
    params = drawer.params
    opt_state = optimizer.init(params)
    history = []
    for i in range(n_steps):
        params, opt_state, aux = step(params, opt_state)
        history.append(aux["loss"])
        if callback is not None:
            callback(i, params, aux)
    drawer.replace_(params)
    return drawer, [float(h) for h in history]


def run_on_device(
    synthesize: Callable,
    losses: Sequence[Callable],
    params,
    n_steps: int,
    optimizer: Optional[optax.GradientTransformation] = None,
    loss_weights: Optional[Sequence[float]] = None,
):
    """Whole optimization as ONE compiled program (lax.scan over steps).

    No host round-trips: returns (final_params, per-step total loss array).
    """
    optimizer = optimizer or optax.adam(0.05)
    weights = list(loss_weights) if loss_weights is not None else [1.0] * len(losses)

    def total_loss(p):
        images = synthesize(p)
        values = jnp.stack([loss(images) for loss in losses])
        return jnp.sum(values * jnp.asarray(weights))

    @jax.jit
    def run(params):
        opt_state = optimizer.init(params)

        def body(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(total_loss)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, _), losses_history = jax.lax.scan(
            body, (params, opt_state), None, length=n_steps
        )
        return params, losses_history

    return run(params)
