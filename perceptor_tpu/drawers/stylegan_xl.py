"""StyleGAN-XL drawer: parameterize w-latents
(reference perceptor/drawers/stylegan_xl.py:7-20)."""

from __future__ import annotations

import jax.numpy as jnp

from perceptor_tpu.drawers.interface import DrawingInterface


class StyleGANXL(DrawingInterface):
    def __init__(self, model=None, latents=None, name: str = "imagenet128",
                 size: int = 1, **latent_kwargs):
        from perceptor_tpu.models.stylegan_xl import StyleGANXL as Model

        self.model = model if model is not None else Model(name)
        if latents is None:
            latents = self.model.latents(size, **latent_kwargs)
        self.params = jnp.asarray(latents)

    def synthesize(self, params=None):
        params = params if params is not None else self.params
        return self.model.synthesis_fn(self.model.params, params)

    @property
    def model_params(self):
        return self.model.params

    def synthesize_fn(self, model_params, params):
        """Pure synthesize: generator weights as an argument (engine-safe)."""
        return self.model.synthesis_fn(model_params, params)

    def encode(self, images):
        raise NotImplementedError(
            "StyleGAN-XL inversion is not supported (reference drawer has no "
            "encode either)"
        )
