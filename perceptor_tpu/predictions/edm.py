"""EDM (Karras 2022) denoised-parameterized predictions, sigma-space schedule.

Functional spec: reference perceptor/models/monster_diffusion/prediction.py:38-220.
The network (after EDM preconditioning) directly predicts the denoised x;
the schedule is alpha=1, sigma=t (variance-exploding), so:

    predicted_noise (eps) = (diffused_xs - denoised_xs) / sigma
    step: to_xs = denoised_xs + eps * to_sigma

The EDM correction differs from the DDIM-family `correction`: it is a Heun
trapezoidal update in sigma (reference prediction.py:109-120), exposed here
as `heun_correction`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from perceptor_tpu.core.pytree import Functional
from perceptor_tpu.predictions import diffusion_space
from perceptor_tpu.predictions.base import PredictionAlgebra, expand_like_batch


class EDMPredictions(Functional, PredictionAlgebra):
    """Immutable pytree over (denoised_xs, diffused images, sigmas-as-ts)."""

    denoised_xs: jax.Array  # (N, C, H, W) in x-space [-1, 1]
    diffused_images: jax.Array  # (N, C, H, W) in [0, 1]
    ts: jax.Array  # (N,) sigma values

    # -- schedule: alpha = 1, sigma = t ------------------------------------

    def alphas(self, ts):
        return jnp.ones_like(self.sigmas(ts))

    def sigmas(self, ts):
        return expand_like_batch(ts, self.denoised_xs)

    @property
    def from_alphas(self):
        return self.alphas(self.ts)

    @property
    def from_sigmas(self):
        return self.sigmas(self.ts)

    # -- canonical quantities -----------------------------------------------

    @property
    def from_xs(self):
        return diffusion_space.encode(self.diffused_images)

    @property
    def diffused_xs(self):
        return self.from_xs

    @property
    def predicted_noise(self):
        """eps = (diffused - denoised) / sigma (reference prediction.py:94-96)."""
        return (self.from_xs - self.denoised_xs) / self.from_sigmas

    eps = predicted_noise

    # -- parameterization adapters --------------------------------------------

    @property
    def _output(self):
        return self.denoised_xs

    def _replace_output(self, denoised_xs):
        return self.replace(denoised_xs=denoised_xs)

    def _from_pair(self, denoised_xs, predicted_noise):
        del predicted_noise  # denoised parameterization keeps x0 directly
        return self.replace(denoised_xs=denoised_xs)

    def _decode_xs(self, xs):
        return diffusion_space.decode(xs)

    # -- EDM-specific samplers ---------------------------------------------------

    def heun_correction(self, previous_diffused_images, previous_ts, previous_eps):
        """Heun 2nd-order update: average the eps slopes at the two evals
        (reference prediction.py:109-120)."""
        previous_xs = diffusion_space.encode(previous_diffused_images)
        corrected = previous_xs + (
            self.from_sigmas - self.sigmas(previous_ts)
        ) * (self.eps + previous_eps) / 2
        return diffusion_space.decode(corrected)

    def inject_noise(self, to_ts, key):
        """EDM stochastic churn: renoise from sigma to a higher sigma
        (reference monster_diffusion.py:187-199 semantics)."""
        to_sigmas = self.sigmas(to_ts)
        fresh = jax.random.normal(key, self.from_xs.shape, self.from_xs.dtype)
        added = jnp.sqrt(jnp.maximum(to_sigmas**2 - self.from_sigmas**2, 0.0))
        return diffusion_space.decode(self.from_xs + fresh * added)
