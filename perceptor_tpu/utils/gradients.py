"""Multi-loss gradient combination.

The reference's manual `GradientCheckpoint` (reference
perceptor/utils/gradient_checkpoint.py:5-54) exists to backprop N losses into
one shared synthesized image and then continue through the shared prefix
once. Under JAX, `jax.vjp` of the synthesize function gives the shared-prefix
reuse for free; what survives are the gradient *combination* helpers
(`nonzero_mean` gradient_checkpoint.py:35-38, `nonzero_scale` :41-54), kept
here as pure functions usable inside jit.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def nonzero_mean(gradients, axis: int = 0):
    """Mean over `axis` counting only nonzero entries.

    Accepts a list of arrays (stacked along a new leading axis) or an array.
    """
    if isinstance(gradients, (list, tuple)):
        gradients = jnp.stack(gradients)
    count = jnp.sum(gradients != 0, axis=axis)
    return jnp.sum(gradients, axis=axis) / (count + 1e-6)


def nonzero_scale(tensor, axis=None):
    """Normalize by the std of nonzero entries (reference :41-54)."""
    if isinstance(tensor, (list, tuple)):
        tensor = jnp.stack(tensor)
    shape = tensor.shape
    if axis is None:
        flat = tensor.reshape(-1)
        axis = 0
    else:
        flat = tensor
    mask = flat != 0
    denom = jnp.sum(mask, axis=axis) + 1e-6
    mean_square = jnp.sum(jnp.square(flat), axis=axis) / denom
    mean = jnp.sum(flat, axis=axis) / denom
    std = jnp.sqrt(jnp.maximum(mean_square - jnp.square(mean), 0.0)) + 1e-6
    scaled = flat / (jnp.expand_dims(std, axis) + 1e-6)
    return scaled.reshape(shape)


def combine_gradients(
    gradients: Sequence[jax.Array], mode: str = "sum"
) -> jax.Array:
    """Combine per-loss gradients w.r.t. a shared tensor into one update."""
    if mode == "sum":
        return sum(gradients[1:], gradients[0])
    if mode == "nonzero_mean":
        return nonzero_mean(list(gradients))
    if mode == "nonzero_scale_sum":
        scaled = [nonzero_scale(g) for g in gradients]
        return sum(scaled[1:], scaled[0])
    raise ValueError(f"unknown combine mode {mode!r}")
