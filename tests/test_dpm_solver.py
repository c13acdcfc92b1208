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


def test_guided_diffusion_sample_dpm_matches_algebra():
    """ADM fused sample(method="dpm++") must equal the host per-step loop
    through predictions.dpm_solver_pp_step."""
    from perceptor_tpu.models.guided_diffusion import GuidedDiffusion

    model = GuidedDiffusion(name="tiny", fp16=False)
    key = jax.random.PRNGKey(4)
    out = model.sample(
        n_images=1, n_steps=4, size=(32, 32), key=key, rho=3.0,
        method="dpm++",
    )

    init_key, _ = jax.random.split(key)
    diffused = model.random_diffused((1, 3, 32, 32), init_key)
    pairs = model.schedule_indices(n_steps=4, rho=3.0)
    prev_x0 = jnp.zeros_like(diffused)
    prev_h = jnp.ones((1, 1, 1, 1))
    for i, (from_i, to_i) in enumerate(pairs):
        p = model.predictions(diffused, int(from_i))
        diffused, prev_h = p.dpm_solver_pp_step(
            jnp.asarray([int(to_i)]), prev_x0, prev_h, i == 0
        )
        prev_x0 = p.denoised_xs
    expected = model.predictions(diffused, int(pairs[-1, 1])).denoised_images

    assert out.shape == expected.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=1e-4, atol=1e-4
    )
    with pytest.raises(ValueError):
        model.sample(method="dpm++", eta=0.5)
    with pytest.raises(ValueError):
        model.sample(method="plms2")


def test_text2image_sample_dpm_matches_host_loop():
    """LDM fused sample(method="dpm++") (shared builder in
    latent_diffusion/ddim.py) must equal the host loop through
    dpm_pp_2m_update over the same alphas-cumprod grid, CFG included."""
    from perceptor_tpu.models.latent_diffusion import BERTTokenizer, Text2Image

    tokenizer = BERTTokenizer(
        vocab=["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "cat"], max_length=16
    )
    model = Text2Image(
        fp16=False, tiny=True, tokenizer=tokenizer, guidance_scale=3.0
    )
    key = jax.random.PRNGKey(5)
    out = model.sample(
        ["a cat"], n_steps=4, size=(64, 64), key=key,
        from_index=999, to_index=500, method="dpm++",
    )

    init_key, _ = jax.random.split(key)
    latents = model.random_latents((1, 3, 64, 64), init_key)
    cond = model.conditioning(["a cat"])
    prev_x0 = jnp.zeros_like(latents)
    prev_h = jnp.ones((1, 1, 1, 1))
    pairs = model.schedule_indices(999, 500, 4)
    for i, (from_i, to_i) in enumerate(pairs):
        denoised = model.denoise(latents, int(from_i), cond)
        from_ac = model.alphas_cumprod(int(from_i))
        to_ac = model.alphas_cumprod(int(to_i))
        latents, prev_h = dpm_pp_2m_update(
            latents, denoised, prev_x0, prev_h,
            jnp.sqrt(from_ac), jnp.sqrt(1.0 - from_ac),
            jnp.sqrt(to_ac), jnp.sqrt(1.0 - to_ac),
            i == 0,
        )
        prev_x0 = denoised
    expected = model.images(model.denoise(latents, 500, cond))

    assert out.shape == expected.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), atol=1e-5
    )
    with pytest.raises(ValueError):
        model.sample(["a"], method="dpm++", eta=1.0)


def test_monster_dpm_solver_sample_matches_algebra():
    """MonsterDiffusion.dpm_solver_sample (one lax.scan) must equal the
    host per-step loop through EDMPredictions.dpm_solver_pp_step."""
    from perceptor_tpu.models.monster_diffusion import MonsterDiffusion

    model = MonsterDiffusion(name="tiny", fp16=False)
    key = jax.random.PRNGKey(7)
    out = model.dpm_solver_sample(size=1, n_evaluations=5, key=key)

    images = model.random_noise(1, key)
    pairs = model.schedule_ts(5)
    prev_x0 = jnp.zeros_like(images)
    prev_h = jnp.ones((1, 1, 1, 1))
    for i, (from_t, to_t) in enumerate(pairs):
        p = model.predictions(images, jnp.full((1,), from_t))
        images, prev_h = p.dpm_solver_pp_step(
            jnp.full((1,), to_t), prev_x0, prev_h, i == 0
        )
        prev_x0 = p.denoised_xs
    expected = jnp.clip(
        model.predictions(images, jnp.full((1,), pairs[-1, 1])).denoised_images,
        0, 1,
    )

    assert out.shape == expected.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=1e-4, atol=1e-5
    )
    assert bool(jnp.all(jnp.isfinite(out)))


def test_face_and_bsr_sample_dpm_method():
    from perceptor_tpu.models.latent_diffusion import Face, SuperResolution

    face = Face(fp16=False, tiny=True)
    out = face.sample(
        n_images=1, n_steps=3, size=(64, 64), key=jax.random.PRNGKey(0),
        from_index=999, to_index=500, method="dpm++",
    )
    assert out.shape == (1, 3, 64, 64)
    assert bool(jnp.all(jnp.isfinite(out)))

    bsr = SuperResolution(fp16=False, tiny=True)  # eta defaults to 1.0
    lr = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 16, 16))
    hr_canvas = bsr.upsample(lr)
    with pytest.raises(ValueError):
        bsr.sample(hr_canvas, method="dpm++")  # eta=1.0 default rejected
    out = bsr.sample(
        hr_canvas, n_steps=3, eta=0.0, key=jax.random.PRNGKey(2),
        from_index=999, to_index=500, method="dpm++",
    )
    assert out.shape == hr_canvas.shape
    assert bool(jnp.all(jnp.isfinite(out)))
