import jax.numpy as jnp
import numpy as np

from perceptor_tpu import schedules


def test_t_alpha_sigma_roundtrip():
    # reference velocity_diffusion.py:239-243 (test_utils_conversion)
    t = jnp.asarray(0.3)
    alpha, sigma = schedules.t_to_alpha_sigma(t)
    np.testing.assert_allclose(schedules.sigma_to_t(sigma), t, atol=1e-6)
    np.testing.assert_allclose(
        schedules.alpha_sigma_to_t(alpha, sigma), t, atol=1e-6
    )


def test_log_snr_roundtrip():
    alpha, sigma = schedules.t_to_alpha_sigma(jnp.asarray(0.42))
    log_snr = schedules.alpha_sigma_to_log_snr(alpha, sigma)
    alpha2, sigma2 = schedules.log_snr_to_alpha_sigma(log_snr)
    np.testing.assert_allclose(alpha2, alpha, atol=1e-6)
    np.testing.assert_allclose(sigma2, sigma, atol=1e-6)


def test_velocity_schedule_ts_endpoints():
    # reference velocity_diffusion.py:230-236 (test_schedule_ts)
    pairs = schedules.velocity_schedule_ts(n_steps=50, from_ts=0.6)
    assert pairs.shape == (50, 2)
    np.testing.assert_allclose(pairs[0, 0], 0.6, atol=1e-5)
    # monotonically decreasing
    assert (pairs[:, 0] > pairs[:, 1]).all()
    # consecutive pairing
    np.testing.assert_allclose(pairs[1:, 0], pairs[:-1, 1])


def test_velocity_schedule_matches_torch_reference():
    """Port of reference schedule_ts math (velocity_diffusion.py:49-66) in torch."""
    import math

    import torch

    def reference_schedule(n_steps, from_ts, to_ts, rho):
        def t_to_alpha_sigma(t):
            return torch.cos(t * math.pi / 2), torch.sin(t * math.pi / 2)

        from_alpha, from_sigma = t_to_alpha_sigma(torch.as_tensor(from_ts))
        to_alpha, to_sigma = t_to_alpha_sigma(torch.as_tensor(to_ts))
        from_log_snr = torch.log(from_alpha**2 / from_sigma**2)
        to_log_snr = torch.log(to_alpha**2 / to_sigma**2)
        e_from = (1 / from_log_snr.exp()).sqrt().clamp(max=150)
        e_to = (1 / to_log_snr.exp()).sqrt().clamp(min=1e-3)
        ramp = torch.linspace(0, 1, n_steps + 1)
        min_inv = e_to ** (1 / rho)
        max_inv = e_from ** (1 / rho)
        sigmas = (max_inv + ramp * (min_inv - max_inv)) ** rho
        log_snr = torch.log(torch.ones_like(sigmas) / sigmas**2)
        alpha = log_snr.sigmoid().sqrt()
        sigma = log_snr.neg().sigmoid().sqrt()
        ts = torch.atan2(sigma, alpha) / math.pi * 2
        return torch.stack([ts[:-1], ts[1:]], dim=1)

    expected = reference_schedule(50, 1.0, 1e-2, 7.0).numpy()
    got = schedules.velocity_schedule_ts(50, 1.0, 1e-2, 7.0)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_scaled_linear_matches_diffusers_formula():
    alphas, sigmas = schedules.scaled_linear_alphas_sigmas()
    assert alphas.shape == (1000,)
    # alpha^2 + sigma^2 == 1
    np.testing.assert_allclose(alphas**2 + sigmas**2, 1.0, atol=1e-6)
    # endpoints sanity from the DDPM scaled-linear schedule
    assert alphas[0] > 0.999 and alphas[-1] < 0.1


def test_indexed_schedule_sd():
    alphas, sigmas = schedules.scaled_linear_alphas_sigmas()
    pairs = schedules.indexed_schedule(alphas, sigmas, n_steps=50, rho=3.0)
    assert pairs.ndim == 2 and pairs.shape[1] == 2
    assert pairs[0, 0] <= 999
    assert (pairs[:, 0] > pairs[:, 1]).all()
    assert pairs.shape[0] >= 45  # n_steps * 0.9
    np.testing.assert_array_equal(pairs[1:, 0], pairs[:-1, 1])


def test_edm_schedule_and_preconditioning():
    pairs = schedules.edm_schedule_ts(51)
    assert pairs.shape == (50, 2)
    np.testing.assert_allclose(pairs[0, 0], 80.0, rtol=1e-5)
    np.testing.assert_allclose(pairs[-1, 1], 1e-2, rtol=1e-4)

    c_skip, c_out, c_in, c_noise = schedules.edm_preconditioning(jnp.asarray(1.0))
    sd = 0.5
    np.testing.assert_allclose(c_skip, sd**2 / (1 + sd**2), rtol=1e-6)
    np.testing.assert_allclose(c_in, 1 / np.sqrt(1 + sd**2), rtol=1e-6)
    np.testing.assert_allclose(c_noise, 0.0, atol=1e-7)


def test_spliced_ddpm_cosine_schedule_monotone():
    t = jnp.linspace(0.0, 1.0, 101)
    out = schedules.get_spliced_ddpm_cosine_schedule(t)
    assert (np.diff(np.asarray(out)) > 0).all()
