"""Generic pairwise image-image spherical distance for any encoder model
(reference perceptor/losses/spherical_distance.py:4-21)."""

from __future__ import annotations

import jax.numpy as jnp

from perceptor_tpu.losses.interface import LossInterface
from perceptor_tpu.losses.prompt_bank import spherical_distance_squared


class SphericalDistance(LossInterface):
    def __init__(self, model):
        self.model = model

    def forward(self, images_a, images_b):
        return jnp.mean(
            spherical_distance_squared(
                self.model.encode_images(images_a),
                self.model.encode_images(images_b),
            )
        )
