"""Clamp with feasibility-directed gradient.

Rebuild of reference perceptor/transforms/clamp_with_grad.py:8-23: forward is
an ordinary clamp; backward passes the gradient only where it points back
toward the feasible region:  grad_out = grad_in * (grad_in * (x - clamp(x)) >= 0).

Used by guidance (`Predictions.guided`, reference
models/velocity_diffusion/predictions.py:148-155) and thresholding. Pure
elementwise — XLA fuses it into surrounding kernels, so a hand-written
Pallas kernel would only add dispatch overhead; the custom VJP is the part
the compiler can't infer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def clamp_with_grad(x, min_value=0.0, max_value=1.0):
    return jnp.clip(x, min_value, max_value)


def _fwd(x, min_value, max_value):
    return jnp.clip(x, min_value, max_value), (x, min_value, max_value)


def _bwd(residuals, grad_in):
    x, min_value, max_value = residuals
    clamped = jnp.clip(x, min_value, max_value)
    keep = (grad_in * (x - clamped)) >= 0
    grad_x = grad_in * keep.astype(grad_in.dtype)
    return (grad_x, jnp.zeros_like(jnp.asarray(min_value, dtype=grad_in.dtype)),
            jnp.zeros_like(jnp.asarray(max_value, dtype=grad_in.dtype)))


clamp_with_grad.defvjp(_fwd, _bwd)
