"""BruteDiffusion drawer: parameterize the diffused image at a fixed t.

Rebuild of reference perceptor/drawers/diffusion/brute_diffusion.py:7-49:
params = the diffused image (in [0,1] space) at noise level `t`;
synthesize = the model's denoised prediction; encode = q-sample an image
to level t. Works with any model exposing `predictions(diffused, ts)` and
`diffuse(images, ts, ...)` (VelocityDiffusion here; the reference's
predict_denoised/diffuse protocol).
"""

from __future__ import annotations

import jax.numpy as jnp

from perceptor_tpu.drawers.interface import DrawingInterface


class BruteDiffusion(DrawingInterface):
    def __init__(self, model, diffused_images, t: float):
        self.model = model
        self.t = float(t)
        self.params = jnp.asarray(diffused_images, dtype=jnp.float32)

    @staticmethod
    def from_image(model, images, t, noise=None, key=None) -> "BruteDiffusion":
        """(reference :17-24)."""
        drawer = BruteDiffusion(model, jnp.zeros_like(images), t)
        return drawer.replace_(drawer.encode(images, noise=noise, key=key))

    @property
    def x(self):
        """Diffused state in [-1,1] x-space (reference :26-28)."""
        return self.params * 2.0 - 1.0

    def synthesize(self, params=None):
        params = params if params is not None else self.params
        ts = jnp.full((params.shape[0],), self.t)
        return self.model.predictions(params, ts).denoised_images

    @property
    def model_params(self):
        return self.model.params

    def synthesize_fn(self, model_params, params):
        """Pure synthesize: UNet weights as an argument (engine-safe)."""
        ts = jnp.full((params.shape[0],), self.t)
        return self.model.predictions_fn(
            model_params, params, ts
        ).denoised_images

    def encode(self, images, noise=None, key=None):
        return self.model.diffuse(images, self.t, noise=noise, key=key)

    def noise(self, params=None):
        """Predicted noise at the current state (reference :47-49)."""
        params = params if params is not None else self.params
        ts = jnp.full((params.shape[0],), self.t)
        return self.model.predictions(params, ts).predicted_noise
