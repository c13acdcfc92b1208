"""Shared diffusion prediction algebra.

All four parameterizations in the reference implement the same method set
by different routes (reference velocity_diffusion/predictions.py:9-216,
stable_diffusion/predictions.py:10-250, guided_diffusion/predictions.py:9-198,
monster_diffusion/prediction.py:38+). Here the algebra is written once over
the canonical quantities:

    from_xs          diffused state in x-space            (N, C, H, W)
    from_alphas/..   per-sample signal/noise scales       (N, 1, 1, 1)
    denoised_xs      predicted clean state                (N, C, H, W)
    predicted_noise  predicted eps                        (N, C, H, W)

with the identity  from_xs = denoised_xs * alpha + predicted_noise * sigma.

Subclass contract (see velocity.py / indexed.py / edm.py):
    alphas(t), sigmas(t)       schedule lookup -> (N,1,1,1)
    from_alphas, from_sigmas   schedule at the current noise level
    from_xs                    current diffused state in x-space
    denoised_xs                derived from the stored network output
    predicted_noise            derived from the stored network output
    _output / _replace_output  the raw network-output field (v or eps)
    _from_pair(x0, eps)        rebuild the output field from the pair
    _decode_xs(xs)             x-space -> user-facing space

Stochastic methods take an explicit `key` (JAX PRNG) — the reference's
implicit `torch.randn_like` calls (predictions.py:98,126,144) have no
TPU-native equivalent without explicit key plumbing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from perceptor_tpu.ops.clamp import clamp_with_grad


def expand_like_batch(values, reference) -> jax.Array:
    """Broadcast scalar / (N,) schedule values to (N, 1, 1, 1)."""
    values = jnp.asarray(values, dtype=jnp.result_type(reference.dtype, jnp.float32))
    if values.ndim == 0:
        values = values[None]
    if values.ndim != 1:
        raise ValueError("schedule values must be scalars or 1D arrays")
    return values.reshape(values.shape[0], *([1] * (reference.ndim - 1)))


class PredictionAlgebra:
    """Mixin implementing the full reference Predictions method set."""

    # -- derived state ---------------------------------------------------

    @property
    def denoised_images(self):
        return self._decode_xs(self.denoised_xs)

    # -- samplers --------------------------------------------------------

    def step(self, to, eta: float = 0.0, key=None):
        """DDIM update to noise level `to`; eta>0 adds fresh noise.

        Reference velocity_diffusion/predictions.py:68-105 (identical math in
        stable_diffusion/predictions.py:60-98). `eta` may be a python float
        (eta>0 selects the stochastic branch at trace time) or a traced
        scalar (always the stochastic branch — exact for eta=0 too, since
        ddim_sigma then vanishes); the stochastic branch requires `key`.
        """
        to_alphas, to_sigmas = self.alphas(to), self.sigmas(to)
        if isinstance(eta, jax.Array) or eta > 0.0:
            if key is None:
                raise ValueError("step(eta>0) is stochastic: pass key=")
            ddim_sigma = (
                eta
                * jnp.sqrt(to_sigmas**2 / self.from_sigmas**2)
                * jnp.sqrt(1 - self.from_alphas**2 / to_alphas**2)
            )
            adjusted_sigma = jnp.sqrt(to_sigmas**2 - ddim_sigma**2)
            to_xs = self.denoised_xs * to_alphas + self.predicted_noise * adjusted_sigma
            to_xs = to_xs + jax.random.normal(key, to_xs.shape, to_xs.dtype) * ddim_sigma
        else:
            to_xs = self.denoised_xs * to_alphas + self.predicted_noise * to_sigmas
        return self._decode_xs(to_xs)

    def correction(self, previous):
        """PNDM-ish second-order correction: average two denoised estimates
        (reference predictions.py:107-110)."""
        return previous.forced_denoised_xs(
            (self.denoised_xs + previous.denoised_xs) / 2
        )

    def reverse_step(self, to):
        """Deterministic DDIM inversion toward higher noise
        (reference predictions.py:112-117)."""
        to_alphas, to_sigmas = self.alphas(to), self.sigmas(to)
        return self._decode_xs(
            self.denoised_xs * to_alphas + self.predicted_noise * to_sigmas
        )

    def dpm_solver_pp_step(self, to, prev_denoised_xs, prev_h, is_first):
        """DPM-Solver++(2M) multistep update (predictions/dpm_solver.py;
        arXiv:2211.01095 — beyond-reference sampler, ~20 evals for
        50-step-DDIM quality).  Carry `denoised_xs` and the returned `h`
        into the next step; `is_first` selects the first-order update.

        Returns (next_state_decoded, h)."""
        from perceptor_tpu.predictions.dpm_solver import dpm_pp_2m_update

        to_xs, h = dpm_pp_2m_update(
            self.from_xs,
            self.denoised_xs,
            prev_denoised_xs,
            prev_h,
            self.from_alphas,
            self.from_sigmas,
            self.alphas(to),
            self.sigmas(to),
            is_first,
        )
        return self._decode_xs(to_xs), h

    def resample_noise(self, resample, key):
        """RePaint harmonizing noise (reference predictions.py:119-130)."""
        resample_sigmas = self.sigmas(resample)
        fresh = jax.random.normal(
            key, self.predicted_noise.shape, self.predicted_noise.dtype
        )
        resampled = (
            resample_sigmas * self.predicted_noise
            + jnp.sqrt(self.from_sigmas**2 - resample_sigmas**2) * fresh
        )
        return resampled / self.from_sigmas

    def resample(self, resample, key):
        """RePaint resampling step (https://github.com/andreas128/RePaint;
        reference predictions.py:132-137)."""
        return self._decode_xs(
            self.denoised_xs * self.from_alphas
            + self.resample_noise(resample, key) * self.from_sigmas
        )

    def noisy_reverse_step(self, to, key):
        """Stochastic renoising toward higher noise
        (reference predictions.py:139-146)."""
        to_alphas, to_sigmas = self.alphas(to), self.sigmas(to)
        fresh = jax.random.normal(
            key, self.predicted_noise.shape, self.predicted_noise.dtype
        )
        noise_sigma = (
            self.from_sigmas * self.predicted_noise
            + jnp.sqrt(to_sigmas**2 - self.from_sigmas**2) * fresh
        )
        return self._decode_xs(self.denoised_xs * to_alphas + noise_sigma)

    # -- guidance ---------------------------------------------------------

    def guided(self, guiding, guidance_scale: float = 0.5, clamp_value: float = 1e-6):
        """Add a (clamped, normalized) loss gradient onto the network output,
        scaled by sigma (reference predictions.py:148-155 — the same shift is
        applied to `velocities` for v-models and `predicted_noise` for
        eps-models, i.e. always to the raw output field)."""
        shift = (
            guidance_scale
            * self.from_sigmas
            * jnp.clip(guiding, -clamp_value, clamp_value)
            / clamp_value
        )
        return self._replace_output(self._output + shift)

    def classifier_free_guidance(self, positive, guidance_scale: float = 7.0):
        """uncond + (positive - uncond) * scale on the raw output field
        (reference stable_diffusion/predictions.py:243-250; linear in either
        parameterization, so it lives in the base)."""
        return self._replace_output(
            self._output + (positive._output - self._output) * guidance_scale
        )

    # -- thresholding ------------------------------------------------------

    def dynamic_threshold(self, quantile: float = 0.95):
        """Imagen-style percentile clamp on denoised x
        (reference predictions.py:157-172)."""
        if quantile is None:
            return self
        flat = jnp.abs(self.denoised_xs.reshape(self.denoised_xs.shape[0], -1))
        threshold = jnp.clip(jnp.quantile(flat, quantile, axis=1), min=1.0)
        threshold = expand_like_batch(threshold, self.denoised_xs)
        denoised_xs = clamp_with_grad(self.denoised_xs, -threshold, threshold)
        return self.forced_denoised_xs(denoised_xs / threshold)

    def static_threshold(self):
        """Clamp denoised x to the valid range (reference predictions.py:174)."""
        return self.forced_denoised_xs(clamp_with_grad(self.denoised_xs, -1.0, 1.0))

    # -- forcing -----------------------------------------------------------

    def forced_denoised_xs(self, denoised_xs):
        """Replace the denoised estimate, rederiving the output field.

        Reference predictions.py:177-188 branches on `(sigma >= 1e-3).all()`
        to avoid dividing by ~0; here that is a per-sample jnp.where select
        (jit-compatible, and more precise for mixed batches).
        """
        safe_sigmas = jnp.maximum(self.from_sigmas, 1e-7)
        new_noise = (self.from_xs - denoised_xs * self.from_alphas) / safe_sigmas
        predicted_noise = jnp.where(
            self.from_sigmas >= 1e-3, new_noise, self.predicted_noise
        )
        return self._from_pair(denoised_xs, predicted_noise)

    def forced_predicted_noise(self, predicted_noise):
        """Replace the noise estimate, rederiving the output field
        (reference predictions.py:190-200, same guard on alpha)."""
        safe_alphas = jnp.maximum(self.from_alphas, 1e-7)
        new_denoised = (self.from_xs - predicted_noise * self.from_sigmas) / safe_alphas
        denoised_xs = jnp.where(
            self.from_alphas >= 1e-3, new_denoised, self.denoised_xs
        )
        return self._from_pair(denoised_xs, predicted_noise)

    # -- diagnostics ---------------------------------------------------------

    def _wasserstein_residuals(self):
        noise = self.predicted_noise
        sorted_noise = jnp.sort(noise.reshape(noise.shape[0], -1), axis=1)
        n = sorted_noise.shape[1]
        margin = 0.5 / n
        points = jnp.linspace(margin, 1 - margin, n)
        expected = jax.scipy.special.ndtri(points).astype(sorted_noise.dtype)
        return sorted_noise - expected[None]

    def wasserstein_distance(self):
        """Gaussianity diagnostic on predicted noise
        (reference predictions.py:202-208)."""
        return jnp.abs(self._wasserstein_residuals()).mean()

    def wasserstein_square_distance(self):
        """(reference predictions.py:210-216)."""
        return jnp.square(self._wasserstein_residuals()).mean()
