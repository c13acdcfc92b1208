"""Continuous-time cosine schedule math (v-diffusion).

Functional spec: reference perceptor/models/velocity_diffusion/utils.py:24-73.
Pure jnp functions — jittable, differentiable, usable inside lax.scan.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def t_to_alpha_sigma(t):
    """alpha = cos(t*pi/2), sigma = sin(t*pi/2) (reference utils.py:36-39)."""
    t = jnp.asarray(t)
    return jnp.cos(t * math.pi / 2), jnp.sin(t * math.pi / 2)


def alpha_sigma_to_t(alpha, sigma):
    return jnp.arctan2(sigma, alpha) / math.pi * 2


def sigma_to_t(sigma):
    return jnp.arcsin(jnp.asarray(sigma)) / math.pi * 2


def log_snr_to_alpha_sigma(log_snr):
    log_snr = jnp.asarray(log_snr)
    return (
        jnp.sqrt(jnp.asarray(1.0) / (1.0 + jnp.exp(-log_snr))),
        jnp.sqrt(jnp.asarray(1.0) / (1.0 + jnp.exp(log_snr))),
    )


def alpha_sigma_to_log_snr(alpha, sigma):
    return jnp.log(jnp.square(alpha) / jnp.square(sigma))


def get_ddpm_schedule(ddpm_t):
    """Timesteps for the DDPM-paper noise schedule (reference utils.py:52-56)."""
    ddpm_t = jnp.asarray(ddpm_t)
    log_snr = -jnp.log(jnp.expm1(1e-4 + 10 * jnp.square(ddpm_t)))
    alpha, sigma = log_snr_to_alpha_sigma(log_snr)
    return alpha_sigma_to_t(alpha, sigma)


def get_spliced_ddpm_cosine_schedule(t):
    """Spliced DDPM/cosine schedule (reference utils.py:59-65)."""
    t = jnp.asarray(t)
    ddpm_crossover = 0.48536712
    cosine_crossover = 0.80074257
    big_t = t * (1 + cosine_crossover - ddpm_crossover)
    ddpm_part = get_ddpm_schedule(big_t + ddpm_crossover - cosine_crossover)
    return jnp.where(big_t < cosine_crossover, big_t, ddpm_part)


def get_log_schedule(t, min_log_snr=-10, max_log_snr=10):
    """Logarithmically spaced schedule (reference utils.py:68-72)."""
    t = jnp.asarray(t)
    log_snr = t * (min_log_snr - max_log_snr) + max_log_snr
    alpha, sigma = log_snr_to_alpha_sigma(log_snr)
    return alpha_sigma_to_t(alpha, sigma)
