"""DPM-Solver++(2M) correctness (predictions/dpm_solver.py).

No torch twin exists (the reference has no DPM solver; diffusers is not
installed), so correctness rests on the solver's defining analytic
properties instead:

1. exactness on a perfect model — if the model always returns the true
   x0, every update must land exactly on alpha·x0 + sigma·eps (the
   exponential integrator is exact when the data prediction is constant);
2. order of accuracy — against a 2000-step DDIM ground truth on a smooth
   nonlinear model, 10-step DPM++(2M) must beat 10-step DDIM, and its
   error must shrink ~4x when steps double (2nd order);
3. the fused samplers (SD + velocity) run, are finite, and validate args.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.predictions import LatentIndexedEpsPredictions
from perceptor_tpu.predictions.dpm_solver import dpm_pp_2m_update
from perceptor_tpu.schedules import scaled_linear_alphas_sigmas


def _schedule():
    alphas, sigmas = scaled_linear_alphas_sigmas()
    return jnp.asarray(alphas), jnp.asarray(sigmas)


def test_exact_on_perfect_model():
    alphas, sigmas = _schedule()
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
    eps = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))

    indices = [900, 700, 500, 300, 100, 20]
    x = x0 * alphas[indices[0]] + eps * sigmas[indices[0]]
    prev_x0 = jnp.zeros_like(x)
    prev_h = jnp.ones((2, 1, 1, 1))
    for step, (i_from, i_to) in enumerate(zip(indices[:-1], indices[1:])):
        idx = jnp.full((2,), i_from)
        noise = (x - x0 * alphas[i_from]) / sigmas[i_from]  # perfect model
        predictions = LatentIndexedEpsPredictions(
            from_diffused_latents=x,
            from_indices=idx,
            predicted_noise=noise,
            schedule_alphas=alphas,
            schedule_sigmas=sigmas,
        )
        x, prev_h = predictions.dpm_solver_pp_step(
            jnp.full((2,), i_to), prev_x0, prev_h, step == 0
        )
        prev_x0 = predictions.denoised_xs
        want = x0 * alphas[i_to] + eps * sigmas[i_to]
        np.testing.assert_allclose(np.asarray(x), np.asarray(want), atol=1e-4)


def _toy_problem():
    """A smooth nonlinear data-prediction model over a cosine schedule."""

    def alpha_sigma(t):
        return jnp.cos(t * jnp.pi / 2), jnp.sin(t * jnp.pi / 2)

    def denoised_model(x, t):
        # smooth, contractive, t-dependent
        return jnp.tanh(x) * (0.5 + 0.5 * jnp.cos(t))

    return alpha_sigma, denoised_model


def _run_ddim(ts, x, alpha_sigma, model):
    for t_from, t_to in zip(ts[:-1], ts[1:]):
        a_f, s_f = alpha_sigma(t_from)
        a_t, s_t = alpha_sigma(t_to)
        x0 = model(x, t_from)
        eps = (x - a_f * x0) / s_f
        x = a_t * x0 + s_t * eps
    return x


def _run_dpm(ts, x, alpha_sigma, model):
    prev_x0 = jnp.zeros_like(x)
    prev_h = jnp.ones(())
    for i, (t_from, t_to) in enumerate(zip(ts[:-1], ts[1:])):
        a_f, s_f = alpha_sigma(t_from)
        a_t, s_t = alpha_sigma(t_to)
        x0 = model(x, t_from)
        x, prev_h = dpm_pp_2m_update(
            x, x0, prev_x0, prev_h, a_f, s_f, a_t, s_t, i == 0
        )
        prev_x0 = x0
    return x


def test_second_order_accuracy():
    alpha_sigma, model = _toy_problem()
    x_start = jax.random.normal(jax.random.PRNGKey(2), (4,))

    def ts(n):
        return jnp.linspace(0.85, 0.05, n + 1)

    truth = _run_ddim(ts(2000), x_start, alpha_sigma, model)

    err_ddim_10 = float(
        jnp.abs(_run_ddim(ts(10), x_start, alpha_sigma, model) - truth).max()
    )
    err_dpm_10 = float(
        jnp.abs(_run_dpm(ts(10), x_start, alpha_sigma, model) - truth).max()
    )
    err_dpm_20 = float(
        jnp.abs(_run_dpm(ts(20), x_start, alpha_sigma, model) - truth).max()
    )

    assert err_dpm_10 < err_ddim_10 / 3, (err_dpm_10, err_ddim_10)
    # 2nd order: doubling steps should cut the error ~4x (allow slack)
    assert err_dpm_20 < err_dpm_10 / 2.5, (err_dpm_20, err_dpm_10)


def test_sd_sample_dpm_method():
    from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer
    from perceptor_tpu.models.stable_diffusion import StableDiffusion

    model = StableDiffusion(
        name="tiny", fp16=False, tokenizer=SimpleTokenizer(merges=[])
    )
    images = model.sample(
        ["a test"], n_steps=6, size=(32, 32), key=jax.random.PRNGKey(0),
        method="dpm++",
    )
    assert images.shape[0] == 1 and images.shape[1] == 3
    assert bool(jnp.all(jnp.isfinite(images)))
    with pytest.raises(ValueError):
        model.sample(["a"], method="dpm++", eta=1.0)
    with pytest.raises(ValueError):
        model.sample(["a"], method="heun")


def test_velocity_sample_dpm_method():
    from perceptor_tpu.models.velocity_diffusion.velocity_diffusion import (
        VelocityDiffusion,
    )

    model = VelocityDiffusion(name="tiny", fp16=False)
    images = model.sample(
        n_images=2, n_steps=6, key=jax.random.PRNGKey(0), method="dpm++"
    )
    assert images.shape == (2, *model.shape)
    assert bool(jnp.all(jnp.isfinite(images)))
