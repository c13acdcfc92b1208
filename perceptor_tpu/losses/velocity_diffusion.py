"""Diffusion-as-prior loss with RePaint noise resampling.

Rebuild of reference perceptor/losses/velocity_diffusion.py:11-91. The
reference's `guided_resample_` context manager (yield the denoised image,
collect `.backward()` gradients on the noise parameter, then guide +
resample) becomes an explicit functional method: pass the external loss as
a callable; the VJP w.r.t. the held noise, the `guided()` shift and the
RePaint `resample_noise` update happen in one compiled step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from perceptor_tpu.losses.interface import LossInterface
from perceptor_tpu.ops.clamp import clamp_with_grad
from perceptor_tpu.predictions import diffusion_space


class VelocityDiffusion(LossInterface):
    def __init__(self, model, noise, from_ts: float = 0.5, resample_ts: float = 0.3):
        self.model = model
        self.from_ts = from_ts
        self.resample_ts = resample_ts
        self.noise = jnp.asarray(noise)

    def _predictions(self, denoised, noise, **extra_kwargs):
        diffused = self.model.diffuse(denoised, self.from_ts, noise=noise)
        return self.model.predictions(diffused, self.from_ts, **extra_kwargs)

    def diffuse_denoise(self, denoised, noise=None, **extra_kwargs):
        """(reference :19-26)."""
        noise = self.noise if noise is None else noise
        return self._predictions(denoised, noise, **extra_kwargs).denoised_images

    def forward(self, images, frozen_diffused_denoised):
        """MSE against the (stop-gradient) diffused-denoised target
        (reference :28-32)."""
        target = jnp.clip(jax.lax.stop_gradient(frozen_diffused_denoised), 0, 1)
        return jnp.square(target - clamp_with_grad(images)).mean()

    def guided_resample_(
        self,
        denoised,
        loss_fn,
        key,
        guidance_scale: float = 0.5,
        clamp_value: float = 1e-6,
        **extra_kwargs,
    ):
        """Resample the held noise in the direction of -d loss/d noise
        (reference :34-61). `loss_fn(diffused_denoised_images) -> scalar`
        plays the role of the reference's backward inside the context.
        Returns (loss value, diffused_denoised images); updates self.noise.
        """

        def objective(noise):
            predictions = self._predictions(denoised, noise, **extra_kwargs)
            images = predictions.denoised_images
            return loss_fn(images), (predictions, images)

        (loss, (predictions, images)), noise_grad = jax.value_and_grad(
            objective, has_aux=True
        )(self.noise)
        guided = predictions.guided(
            -noise_grad, guidance_scale=guidance_scale, clamp_value=clamp_value
        )
        self.noise = guided.resample_noise(self.resample_ts, key)
        return loss, images

    def compensate_noise_(self, from_denoised, to_denoised):
        """(reference :63-68)."""
        delta = diffusion_space.encode(to_denoised) - diffusion_space.encode(
            from_denoised
        )
        self.noise = self.noise - jax.lax.stop_gradient(delta)
        return self
