"""Raw pixel-grid drawer (reference perceptor/drawers/raw/raw.py:9-41)."""

from __future__ import annotations

import jax.numpy as jnp

from perceptor_tpu.drawers import inits
from perceptor_tpu.drawers.interface import DrawingInterface
from perceptor_tpu.ops.resize import resize


class Raw(DrawingInterface):
    def __init__(self, init_images):
        """
        Minimal container for an optimizable pixel grid with init helpers.

        Usage:

            drawer = Raw.random_fractal_image((1, 3, 256, 256))
            images = drawer.synthesize(params)   # pure; params = pixel grid
        """
        self.params = jnp.asarray(init_images, dtype=jnp.float32)
        self.shape = self.params.shape

    def synthesize(self, params=None):
        return params if params is not None else self.params

    def encode(self, images, mode="bilinear"):
        return resize(images, out_shape=self.shape[-2:], resample=mode)

    @staticmethod
    def random_fractal_image(shape, seed=None) -> "Raw":
        return Raw(inits.fractal(shape, seed))

    @staticmethod
    def random_gradient_image(shape, seed=None) -> "Raw":
        return Raw(inits.gradient(shape, seed))
