"""Style-transfer loss: weighted L1 on VGG19 features + Gram matrices.

Rebuild of reference perceptor/losses/style_transfer.py:10-69: activations
at slices (0,4)(4,9)(9,16)(16,23)(23,30) with the input image prepended,
losses on slices 2/3/4 weighted 5/15/2 (features) and 5^2*5e3/15^2*5e3/
2^2*5e3 (grams), total scaled by 0.001.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from perceptor_tpu.losses.interface import LossInterface
from perceptor_tpu.models.vgg import VGG19
from perceptor_tpu.ops.resize import resize


def gram_matrix(features: jax.Array) -> jax.Array:
    """(reference :57-61)."""
    a, b, c, d = features.shape
    flat = features.reshape(a * b, c * d)
    return (flat @ flat.T) / (a * b * c * d)


class StyleTransfer(LossInterface):
    def __init__(self, style_images=None):
        self.model = VGG19()
        self.encodings: Optional[List[jax.Array]] = None
        if style_images is not None:
            self.encodings = self.encode(style_images)

    def encode(self, images) -> List[jax.Array]:
        """[input, slice1..slice5] activations (reference :26-30, :64-69)."""
        if images.shape[-2:] != (256, 256):
            images = resize(images, out_shape=(256, 256))
        return [images] + list(self.model.activations_fn(self.model.params, images))[:5]

    def loss(self, encodings_a, encodings_b) -> jax.Array:
        """(reference :32-48)."""
        l1 = [
            jnp.abs(a - b).mean() for a, b in zip(encodings_a, encodings_b)
        ]
        gram = [
            jnp.abs(gram_matrix(a) - gram_matrix(b)).mean()
            for a, b in zip(encodings_a, encodings_b)
        ]
        vgg_loss = 5 * l1[2] + 15 * l1[3] + 2 * l1[4]
        vgg_loss_gram = (
            5**2 * 5e3 * gram[2] + 15**2 * 5e3 * gram[3] + 2**2 * 5e3 * gram[4]
        )
        return (vgg_loss + vgg_loss_gram) * 0.001

    def forward(self, images_a, images_b=None) -> jax.Array:
        if images_b is None:
            if self.encodings is None:
                raise ValueError("no style images: pass images_b or style_images")
            encodings_b = self.encodings
        else:
            encodings_b = self.encode(images_b)
        return self.loss(self.encode(images_a), encodings_b)
