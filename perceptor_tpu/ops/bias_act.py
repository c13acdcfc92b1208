"""Fused bias + activation + gain + clamp.

TPU-native equivalent of the reference CUDA bias_act
(perceptor/models/stylegan_xl/torch_utils/ops/bias_act.py:118, activation
table :25-99, ref impl :165). The 9 activations with their default
alpha/gain are reproduced; XLA fuses the whole chain into surrounding
kernels and derives exact (including second-order) gradients, which the
CUDA version needed hand-written kernels for.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

# name -> (fn(x, alpha), default_alpha, default_gain)
ACTIVATIONS = {
    "linear": (lambda x, a: x, 0.0, 1.0),
    "relu": (lambda x, a: jax.nn.relu(x), 0.0, math.sqrt(2)),
    "lrelu": (lambda x, a: jax.nn.leaky_relu(x, a), 0.2, math.sqrt(2)),
    "tanh": (lambda x, a: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": (lambda x, a: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": (lambda x, a: jax.nn.elu(x), 0.0, 1.0),
    "selu": (lambda x, a: jax.nn.selu(x), 0.0, 1.0),
    "softplus": (lambda x, a: jax.nn.softplus(x), 0.0, 1.0),
    "swish": (lambda x, a: jax.nn.sigmoid(x) * x, 0.0, math.sqrt(2)),
}


def bias_act(
    x: jax.Array,
    b: Optional[jax.Array] = None,
    dim: int = 1,
    act: str = "linear",
    alpha: Optional[float] = None,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
) -> jax.Array:
    """y = clamp(gain * act(x + b), -clamp, clamp), bias broadcast on `dim`."""
    if act not in ACTIVATIONS:
        raise ValueError(f"unknown activation: {act}")
    fn, def_alpha, def_gain = ACTIVATIONS[act]
    alpha = def_alpha if alpha is None else float(alpha)
    gain = def_gain if gain is None else float(gain)

    if b is not None:
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + b.reshape(shape)
    x = fn(x, alpha)
    if gain != 1.0:
        x = x * gain
    if clamp is not None and clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x
