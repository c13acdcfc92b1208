"""JPEG drawer: parameterize an image by its quantized YCbCr DCT blocks.

Rebuild of reference perceptor/drawers/jpeg/jpeg.py:9-29 — the optimizable
params are the (y, cb, cr) coefficient pytree; synthesize is the
differentiable JPEG decode.
"""

from __future__ import annotations

import jax.numpy as jnp

from perceptor_tpu.drawers.interface import DrawingInterface
from perceptor_tpu.drawers.jpeg.codec import compress_jpeg, decompress_jpeg
from perceptor_tpu.ops.resize import resize


class JPEG(DrawingInterface):
    def __init__(self, init_images, factor: float = 1.0):
        init_images = jnp.asarray(init_images, dtype=jnp.float32)
        self.shape = init_images.shape
        self.factor = factor
        self.params = self.encode(init_images)

    def synthesize(self, params=None):
        params = params if params is not None else self.params
        return self.decode(params)

    def encode(self, images):
        if images.shape[-2:] != self.shape[-2:]:
            images = resize(images, out_shape=self.shape[-2:])
        return compress_jpeg(images, factor=self.factor)

    def decode(self, ycbcr):
        y, cb, cr = ycbcr
        return decompress_jpeg(
            y, cb, cr, self.shape[-2], self.shape[-1], factor=self.factor
        )
