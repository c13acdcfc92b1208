"""MSE between two images after resize to a common size
(reference perceptor/losses/resize.py:5-18)."""

from __future__ import annotations

import jax.numpy as jnp

from perceptor_tpu.losses.interface import LossInterface
from perceptor_tpu.ops.resize import resize


class Resize(LossInterface):
    def __init__(self, size=None):
        self.size = size

    def forward(self, images_a, images_b, size=None):
        if size is None:
            size = self.size
        return jnp.mean(
            jnp.square(
                resize(images_a, out_shape=size) - resize(images_b, out_shape=size)
            )
        )
