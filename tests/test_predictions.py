"""Predictions algebra tests.

Mirrors the reference's schedule/step round-trip tests
(reference perceptor/models/velocity_diffusion/velocity_diffusion.py:222-243)
plus invariants the reference checks implicitly: the diffusion identity
x = x0*alpha + eps*sigma, forced_* round-trips, guidance linearity, CFG,
and jit/lax.scan compatibility of the pytree objects.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.predictions import (
    EDMPredictions,
    IndexedEpsPredictions,
    LatentIndexedEpsPredictions,
    VelocityPredictions,
)
from perceptor_tpu.schedules import (
    scaled_linear_alphas_sigmas,
    t_to_alpha_sigma,
)


def make_velocity(key=0, n=2, size=8):
    keys = jax.random.split(jax.random.PRNGKey(key), 3)
    images = jax.random.uniform(keys[0], (n, 3, size, size))
    ts = jnp.array([0.7, 0.4][:n])
    velocities = jax.random.normal(keys[1], (n, 3, size, size))
    return VelocityPredictions(
        from_diffused_images=images, from_ts=ts, velocities=velocities
    )


def make_indexed(key=0, n=2, size=8, latent=False):
    keys = jax.random.split(jax.random.PRNGKey(key), 3)
    state = jax.random.normal(keys[0], (n, 4 if latent else 3, size, size))
    indices = jnp.array([800, 400][:n])
    noise = jax.random.normal(keys[1], (n, 4 if latent else 3, size, size))
    alphas, sigmas = scaled_linear_alphas_sigmas()
    if latent:
        return LatentIndexedEpsPredictions(
            from_diffused_latents=state,
            from_indices=indices,
            predicted_noise=noise,
            schedule_alphas=jnp.asarray(alphas),
            schedule_sigmas=jnp.asarray(sigmas),
            encode=lambda images: images * 2 - 1,
            decode=lambda latents: (latents + 1) / 2,
        )
    return IndexedEpsPredictions(
        from_diffused_images=jax.nn.sigmoid(state),
        from_indices=indices,
        predicted_noise=noise,
        schedule_alphas=jnp.asarray(alphas),
        schedule_sigmas=jnp.asarray(sigmas),
    )


def test_velocity_identity():
    p = make_velocity()
    reconstructed = p.denoised_xs * p.from_alphas + p.predicted_noise * p.from_sigmas
    np.testing.assert_allclose(reconstructed, p.from_xs, atol=1e-5)


def test_velocity_step_to_same_t_is_identity():
    p = make_velocity()
    stepped = p.step(p.from_ts)
    np.testing.assert_allclose(stepped, p.from_diffused_images, atol=1e-5)


def test_velocity_step_closed_form():
    p = make_velocity()
    to_ts = jnp.array([0.5, 0.2])
    alphas, sigmas = t_to_alpha_sigma(to_ts)
    expected_xs = (
        p.denoised_xs * alphas[:, None, None, None]
        + p.predicted_noise * sigmas[:, None, None, None]
    )
    np.testing.assert_allclose(p.step(to_ts), (expected_xs + 1) / 2, atol=1e-5)


def test_velocity_forced_denoised_roundtrip():
    p = make_velocity()
    forced = p.forced_denoised_images(p.denoised_images)
    np.testing.assert_allclose(forced.velocities, p.velocities, atol=1e-4)


def test_velocity_forced_predicted_noise_roundtrip():
    p = make_velocity()
    forced = p.forced_predicted_noise(p.predicted_noise)
    np.testing.assert_allclose(forced.velocities, p.velocities, atol=1e-4)


def test_guided_shifts_output_by_clamped_grad():
    p = make_velocity()
    grad = jnp.full_like(p.velocities, 5.0)  # clamps to +clamp_value
    guided = p.guided(grad, guidance_scale=0.5, clamp_value=1e-6)
    np.testing.assert_allclose(
        guided.velocities - p.velocities, 0.5 * p.from_sigmas * jnp.ones_like(grad),
        atol=1e-5,
    )


def test_guided_gradient_flows():
    p = make_velocity()

    def loss(images):
        pred = p.forced_denoised_images(images)
        return jnp.square(pred.step(jnp.array([0.1, 0.1]))).sum()

    grads = jax.grad(loss)(p.denoised_images)
    assert bool(jnp.any(grads != 0))


def test_dynamic_threshold_bounds_denoised():
    p = make_velocity(key=3)
    p = p.replace(velocities=p.velocities * 10)  # force out-of-range denoised
    thresholded = p.dynamic_threshold(0.95)
    assert float(jnp.abs(thresholded.denoised_xs).max()) <= 1.0 + 1e-5


def test_static_threshold():
    p = make_velocity(key=3)
    p = p.replace(velocities=p.velocities * 10)
    thresholded = p.static_threshold()
    assert float(thresholded.denoised_xs.max()) <= 1.0 + 1e-5
    assert float(thresholded.denoised_xs.min()) >= -1.0 - 1e-5


def test_stochastic_methods_require_and_use_key():
    p = make_velocity()
    with pytest.raises(ValueError):
        p.step(jnp.array([0.5, 0.2]), eta=0.5)
    k = jax.random.PRNGKey(0)
    a = p.step(jnp.array([0.5, 0.2]), eta=0.5, key=k)
    b = p.step(jnp.array([0.5, 0.2]), eta=0.5, key=jax.random.PRNGKey(1))
    assert a.shape == p.from_diffused_images.shape
    assert bool(jnp.any(a != b))


def test_resample_statistics():
    p = make_velocity()
    resampled = p.resample(p.from_ts * 0.9, jax.random.PRNGKey(0))
    assert resampled.shape == p.from_diffused_images.shape
    assert bool(jnp.all(jnp.isfinite(resampled)))


def test_indexed_identity_and_step():
    p = make_indexed()
    reconstructed = p.denoised_xs * p.from_alphas + p.predicted_noise * p.from_sigmas
    np.testing.assert_allclose(reconstructed, p.from_xs, atol=1e-5)
    stepped = p.step(p.from_indices)
    np.testing.assert_allclose(stepped, p.from_diffused_images, atol=1e-5)


def test_latent_indexed_cfg():
    uncond = make_indexed(latent=True)
    positive = uncond.replace(
        predicted_noise=uncond.predicted_noise + 1.0
    )
    # scale 1 -> positive exactly
    cfg = uncond.classifier_free_guidance(positive, guidance_scale=1.0)
    np.testing.assert_allclose(cfg.predicted_noise, positive.predicted_noise, atol=1e-6)
    # scale 2 -> extrapolated
    cfg2 = uncond.classifier_free_guidance(positive, guidance_scale=2.0)
    np.testing.assert_allclose(
        cfg2.predicted_noise, uncond.predicted_noise + 2.0, atol=1e-6
    )


def test_latent_dynamic_threshold_clamps_noise():
    p = make_indexed(latent=True)
    p = p.replace(predicted_noise=p.predicted_noise * 10)
    t = p.latent_dynamic_threshold(0.9)
    q = jnp.quantile(
        jnp.abs(p.predicted_noise.reshape(2, -1)), 0.9, axis=1
    )
    limit = jnp.maximum(q, 2.5)
    assert float(jnp.abs(t.predicted_noise[0]).max()) <= float(limit[0]) + 1e-4


def test_latent_pixel_dynamic_threshold_roundtrips_codec():
    p = make_indexed(latent=True)
    t = p.dynamic_threshold(0.95)
    assert t.predicted_noise.shape == p.predicted_noise.shape
    assert bool(jnp.all(jnp.isfinite(t.predicted_noise)))


def test_wasserstein_ranks_gaussian_below_uniform():
    p = make_velocity(n=1, size=32)
    # force predicted noise ~ N(0,1): choose velocities accordingly
    gauss = jax.random.normal(jax.random.PRNGKey(5), p.from_xs.shape)
    p_gauss = p.forced_predicted_noise(gauss)
    uniform = jax.random.uniform(jax.random.PRNGKey(5), p.from_xs.shape) * 4 - 2
    p_uni = p.forced_predicted_noise(uniform)
    assert float(p_gauss.wasserstein_distance()) < float(p_uni.wasserstein_distance())


def test_edm_identity_and_step():
    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(key, (2, 3, 48, 48))
    denoised = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 48, 48)) * 0.1
    ts = jnp.array([10.0, 1.0])
    p = EDMPredictions(denoised_xs=denoised, diffused_images=images, ts=ts)
    # eps definition
    np.testing.assert_allclose(
        p.predicted_noise * p.from_sigmas + p.denoised_xs, p.from_xs, atol=1e-4
    )
    # step toward sigma=0 returns denoised
    stepped = p.step(jnp.zeros(2))
    np.testing.assert_allclose(stepped, p.denoised_images, atol=1e-5)


def test_edm_heun_correction_trapezoid():
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 8, 8))
    denoised = jnp.zeros((1, 3, 8, 8))
    p = EDMPredictions(
        denoised_xs=denoised, diffused_images=images, ts=jnp.array([2.0])
    )
    prev_images = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 8, 8))
    prev_eps = jnp.ones_like(denoised) * 0.5
    out = p.heun_correction(prev_images, jnp.array([3.0]), prev_eps)
    expected = (prev_images * 2 - 1) + (2.0 - 3.0) * (p.eps + prev_eps) / 2
    np.testing.assert_allclose(out, (expected + 1) / 2, atol=1e-5)


def test_predictions_work_under_jit_and_scan():
    """The whole sampler loop as one compiled program (SURVEY §7.9)."""
    alphas, sigmas = scaled_linear_alphas_sigmas()
    alphas, sigmas = jnp.asarray(alphas), jnp.asarray(sigmas)
    pairs = jnp.array([[900, 700], [700, 400], [400, 100]], dtype=jnp.int32)
    latents0 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8))

    @jax.jit
    def sample(latents0):
        def body(latents, pair):
            from_idx, to_idx = pair[0][None], pair[1][None]
            noise_pred = latents * 0.1  # stand-in for the UNet
            p = LatentIndexedEpsPredictions(
                from_diffused_latents=latents,
                from_indices=from_idx,
                predicted_noise=noise_pred,
                schedule_alphas=alphas,
                schedule_sigmas=sigmas,
            )
            return p.step(to_idx), p.wasserstein_distance()

        return jax.lax.scan(body, latents0, pairs)

    final, dists = sample(latents0)
    assert final.shape == latents0.shape
    assert dists.shape == (3,)
    assert bool(jnp.all(jnp.isfinite(final)))
