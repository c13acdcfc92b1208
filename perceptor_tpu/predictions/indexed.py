"""eps-parameterized predictions on a discrete (indexed) DDPM schedule.

Two variants, matching the reference:

  - `IndexedEpsPredictions` — pixel-space eps models (OpenAI ADM / guided
    diffusion). Functional spec: reference
    perceptor/models/guided_diffusion/predictions.py:9-198.
  - `LatentIndexedEpsPredictions` — latent-space eps models (Stable
    Diffusion): state lives in VAE latent space, carries encode/decode
    callables for pixel round-trips, adds latent/pixel dynamic thresholds
    and classifier-free guidance. Functional spec: reference
    perceptor/models/stable_diffusion/predictions.py:10-250.

Schedule lookup is a gather (`jnp.take`) into the 1000-entry cumulative
alpha/sigma tables carried on the object — trace-compatible with traced
indices inside lax.scan loops.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from perceptor_tpu.core.pytree import Functional, static_field
from perceptor_tpu.ops.clamp import clamp_with_grad
from perceptor_tpu.predictions import diffusion_space
from perceptor_tpu.predictions.base import PredictionAlgebra, expand_like_batch


class _IndexedEpsBase(PredictionAlgebra):
    """Shared schedule lookup + eps adapters for the indexed variants."""

    def _indices(self, indices):
        indices = jnp.asarray(indices)
        if indices.ndim == 0:
            indices = indices[None]
        if indices.ndim != 1:
            raise ValueError("indices must be a scalar or a 1D array")
        return indices.astype(jnp.int32)

    def alphas(self, indices):
        values = jnp.take(self.schedule_alphas, self._indices(indices))
        return expand_like_batch(values, self.predicted_noise)

    def sigmas(self, indices):
        values = jnp.take(self.schedule_sigmas, self._indices(indices))
        return expand_like_batch(values, self.predicted_noise)

    @property
    def from_alphas(self):
        return self.alphas(self.from_indices)

    @property
    def from_sigmas(self):
        return self.sigmas(self.from_indices)

    @property
    def denoised_xs(self):
        """(from_xs - sigma * eps) / alpha, alpha clamped away from 0
        (reference stable_diffusion/predictions.py:51-54)."""
        return (
            self.from_xs - self.from_sigmas * self.predicted_noise
        ) / jnp.maximum(self.from_alphas, 1e-7)

    @property
    def _output(self):
        return self.predicted_noise

    def _replace_output(self, predicted_noise):
        return self.replace(predicted_noise=predicted_noise)

    def _from_pair(self, denoised_xs, predicted_noise):
        del denoised_xs  # eps parameterization: the pair collapses to eps
        return self.replace(predicted_noise=predicted_noise)


class IndexedEpsPredictions(Functional, _IndexedEpsBase):
    """Pixel-space indexed eps predictions (ADM / guided diffusion)."""

    from_diffused_images: jax.Array  # (N, C, H, W) in [0, 1]
    from_indices: jax.Array  # (N,) int
    predicted_noise: jax.Array  # (N, C, H, W)
    schedule_alphas: jax.Array  # (T,)
    schedule_sigmas: jax.Array  # (T,)

    @property
    def from_xs(self):
        return diffusion_space.encode(self.from_diffused_images)

    def _decode_xs(self, xs):
        return diffusion_space.decode(xs)

    def forced_denoised_images(self, denoised_images):
        return self.forced_denoised_xs(diffusion_space.encode(denoised_images))


class LatentIndexedEpsPredictions(Functional, _IndexedEpsBase):
    """Latent-space indexed eps predictions (Stable Diffusion).

    `encode`/`decode` are the frozen VAE pixel<->latent callables (carried as
    static fields, mirroring reference stable_diffusion/predictions.py:16-17).
    """

    from_diffused_latents: jax.Array  # (N, C, H/8, W/8)
    from_indices: jax.Array  # (N,) int
    predicted_noise: jax.Array  # (N, C, H/8, W/8)
    schedule_alphas: jax.Array  # (T,)
    schedule_sigmas: jax.Array  # (T,)
    encode: Callable = static_field(default=None)
    decode: Callable = static_field(default=None)

    @property
    def from_xs(self):
        return self.from_diffused_latents

    def _decode_xs(self, xs):
        # x-space IS latent space; sampler methods hand back latents
        # (reference stable_diffusion/predictions.py:60-98 returns latents).
        return xs

    @property
    def denoised_latents(self):
        return self.denoised_xs

    @property
    def denoised_images(self):
        """VAE decode of the denoised latents
        (reference stable_diffusion/predictions.py:56-58)."""
        return self.decode(self.denoised_xs)

    def forced_denoised_latents(self, denoised_latents):
        """Reference stable_diffusion/predictions.py:218-223 — unlike the
        base, SD always rederives eps with a sigma clamp (no small-sigma
        keep-old branch)."""
        predicted_noise = (
            self.from_diffused_latents - denoised_latents * self.from_alphas
        ) / jnp.maximum(self.from_sigmas, 1e-7)
        return self.replace(predicted_noise=predicted_noise)

    def latent_dynamic_threshold(self, quantile: float = 0.95):
        """Percentile clamp directly on predicted noise
        (reference stable_diffusion/predictions.py:181-193)."""
        if quantile is None:
            return self
        flat = jnp.abs(self.predicted_noise.reshape(self.predicted_noise.shape[0], -1))
        threshold = jnp.clip(jnp.quantile(flat, quantile, axis=1), min=2.5)
        threshold = expand_like_batch(threshold, self.predicted_noise)
        return self.forced_predicted_noise(
            clamp_with_grad(self.predicted_noise, -threshold, threshold)
        )

    def dynamic_threshold(self, quantile: float = 0.95):
        """Pixel-space Imagen threshold: round-trips the VAE
        (reference stable_diffusion/predictions.py:195-216)."""
        if quantile is None:
            return self
        denoised_xs = diffusion_space.encode(self.decode(self.denoised_latents))
        flat = jnp.abs(denoised_xs.reshape(denoised_xs.shape[0], -1))
        threshold = jnp.clip(jnp.quantile(flat, quantile, axis=1), min=1.0)
        threshold = expand_like_batch(threshold, denoised_xs)
        denoised_xs = clamp_with_grad(denoised_xs, -threshold, threshold) / threshold
        return self.forced_denoised_latents(
            self.encode(diffusion_space.decode(denoised_xs))
        )
