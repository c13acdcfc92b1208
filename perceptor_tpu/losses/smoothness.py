"""Total-variation-squared smoothness loss
(reference perceptor/losses/smoothness.py:4-10)."""

from __future__ import annotations

import jax.numpy as jnp

from perceptor_tpu.losses.interface import LossInterface


class Smoothness(LossInterface):
    def forward(self, images):
        gradient_height = images[:, :, 1:, :] - images[:, :, :-1, :]
        gradient_width = images[:, :, :, 1:] - images[:, :, :, :-1]
        return jnp.mean(jnp.square(gradient_height)) + jnp.mean(
            jnp.square(gradient_width)
        )
