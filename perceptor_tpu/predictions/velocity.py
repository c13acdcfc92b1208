"""v-parameterized continuous-time predictions (cosine schedule).

Functional spec: reference perceptor/models/velocity_diffusion/predictions.py:9-216.
The network predicts velocity v; with alpha=cos(t*pi/2), sigma=sin(t*pi/2):

    denoised_xs     = from_xs * alpha - v * sigma
    predicted_noise = from_xs * sigma + v * alpha
    v               = alpha * predicted_noise - sigma * denoised_xs
"""

from __future__ import annotations

import jax

from perceptor_tpu.core.pytree import Functional
from perceptor_tpu.predictions import diffusion_space
from perceptor_tpu.predictions.base import PredictionAlgebra, expand_like_batch
from perceptor_tpu.schedules import t_to_alpha_sigma


class VelocityPredictions(Functional, PredictionAlgebra):
    """Immutable pytree: diffused images in [0,1], continuous ts, velocities."""

    from_diffused_images: jax.Array  # (N, C, H, W) in [0, 1]
    from_ts: jax.Array  # (N,)
    velocities: jax.Array  # (N, C, H, W)

    # -- schedule ---------------------------------------------------------

    def alphas(self, ts):
        alphas, _ = t_to_alpha_sigma(ts)
        return expand_like_batch(alphas, self.velocities)

    def sigmas(self, ts):
        _, sigmas = t_to_alpha_sigma(ts)
        return expand_like_batch(sigmas, self.velocities)

    @property
    def from_alphas(self):
        return self.alphas(self.from_ts)

    @property
    def from_sigmas(self):
        return self.sigmas(self.from_ts)

    # -- canonical quantities ----------------------------------------------

    @property
    def from_xs(self):
        return diffusion_space.encode(self.from_diffused_images)

    @property
    def denoised_xs(self):
        """Reference predictions.py:51-55."""
        return self.from_xs * self.from_alphas - self.velocities * self.from_sigmas

    @property
    def predicted_noise(self):
        """Reference predictions.py:58-62."""
        return self.from_xs * self.from_sigmas + self.velocities * self.from_alphas

    # -- parameterization adapters ------------------------------------------

    @property
    def _output(self):
        return self.velocities

    def _replace_output(self, velocities):
        return self.replace(velocities=velocities)

    def _from_pair(self, denoised_xs, predicted_noise):
        """v = alpha * eps - sigma * x0 (reference predictions.py:183-188)."""
        return self.replace(
            velocities=self.from_alphas * predicted_noise
            - self.from_sigmas * denoised_xs
        )

    def _decode_xs(self, xs):
        return diffusion_space.decode(xs)

    def reverse_step(self, to):
        """NOTE the reference returns UNDECODED x-space here — velocity
        predictions.py:112-117 omits the diffusion_space.decode that
        step() applies (:105). Reproduced for parity."""
        to_alphas, to_sigmas = self.alphas(to), self.sigmas(to)
        return self.denoised_xs * to_alphas + self.predicted_noise * to_sigmas

    # -- reference-named conveniences -----------------------------------------

    def forced_denoised_images(self, denoised_images):
        """Reference predictions.py:177-188 (image-space entry point)."""
        return self.forced_denoised_xs(diffusion_space.encode(denoised_images))
