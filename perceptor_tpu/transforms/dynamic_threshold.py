"""Imagen-style dynamic thresholding.

Functional spec: reference perceptor/transforms/dynamic_threshold.py:7-21 —
map [0,1] images to [-1,1], clamp each batch item to its own `quantile`
percentile of |x| (floored at 1.0) with gradient-preserving clamp, divide by
the threshold, map back.

The per-item threshold is applied with an explicit (N,1,1,1) reshape (the
reference relies on broadcasting that is only correct for batch size 1).
"""

from __future__ import annotations

import jax.numpy as jnp

from perceptor_tpu.ops.clamp import clamp_with_grad
from perceptor_tpu.transforms.interface import TransformInterface


def dynamic_threshold(images, quantile=0.95):
    denoised_xs = images * 2.0 - 1.0
    n = denoised_xs.shape[0]
    flat = jnp.abs(denoised_xs.reshape(n, -1))
    threshold = jnp.quantile(flat, quantile, axis=1)
    threshold = jnp.maximum(threshold, 1.0)
    threshold = jax_stop_grad(threshold).reshape(n, 1, 1, 1)
    denoised_xs = (
        clamp_with_grad(denoised_xs, -threshold, threshold) / threshold
    )
    return (denoised_xs + 1.0) / 2.0


def jax_stop_grad(x):
    import jax

    return jax.lax.stop_gradient(x)


class DynamicThreshold(TransformInterface):
    def __init__(self, quantile=0.95):
        self.quantile = quantile

    def encode(self, images, quantile=None):
        return dynamic_threshold(images, quantile or self.quantile)

    def decode(self, images):
        return images
