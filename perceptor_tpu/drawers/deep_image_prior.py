"""DeepImagePrior drawer.

Rebuild of reference perceptor/drawers/deep_image_prior.py:8-23: params =
(network params, additive residual image); latents are frozen; synthesize
= net(latents) + images; `loss()` = L1 penalty on the residual.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from perceptor_tpu.drawers.interface import DrawingInterface
from perceptor_tpu.models.deep_image_prior import DeepImagePrior as DIPModel


class DeepImagePrior(DrawingInterface):
    def __init__(
        self,
        size,
        n_feature_channels: int = 64,
        output_channels: int = 3,
        seed: int = 0,
        fp16: bool = True,
    ):
        self.model = DIPModel(
            shape=(n_feature_channels, *size), output_channels=output_channels,
            seed=seed, fp16=fp16,
        )
        self.latents = self.model.random_latents(jax.random.PRNGKey(seed))
        self.params = {
            "network": self.model.params,
            "images": jnp.zeros((1, output_channels, *size)),
        }

    def synthesize(self, params=None):
        params = params if params is not None else self.params
        return self.model.apply_fn(params["network"], self.latents) + params["images"]

    def loss(self, params=None):
        """L1 residual penalty (reference :22-23)."""
        params = params if params is not None else self.params
        return jnp.abs(params["images"]).mean() * 1e-4
