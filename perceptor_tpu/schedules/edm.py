"""EDM (Karras 2022) sigma-space schedule and preconditioning.

Functional spec: reference perceptor/models/monster_diffusion/diffusion.py:1-12
(constants) and monster_diffusion.py:44-52,85-101 (schedule + c_skip/c_out/
c_in/c_noise preconditioning).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EDM:
    """EDM constants (reference monster_diffusion/diffusion.py:1-12)."""

    P_mean: float = -1.2
    P_std: float = 1.2
    sigma_data: float = 0.5
    rho: float = 7.0
    sigma_min: float = 1e-2
    sigma_max: float = 80.0
    S_tmin: float = 0.05
    S_tmax: float = 50.0
    S_churn: float = 80.0
    S_noise: float = 1.003


def edm_schedule_ts(n_steps: int, config: EDM = EDM()) -> np.ndarray:
    """(n_steps-1, 2) consecutive (from_sigma, to_sigma) pairs.

    Reference monster_diffusion.py:44-52 (ramp has n_steps points; pairs zip
    consecutive entries).
    """
    ramp = np.linspace(0, 1, n_steps)
    min_inv_rho = config.sigma_min ** (1 / config.rho)
    max_inv_rho = config.sigma_max ** (1 / config.rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** config.rho
    return np.stack([sigmas[:-1], sigmas[1:]], axis=1).astype(np.float32)


def edm_preconditioning(sigma, config: EDM = EDM()):
    """Returns (c_skip, c_out, c_in, c_noise) per EDM table 1.

    Reference monster_diffusion.py:85-101:
        c_skip  = sigma_data^2 / (sigma^2 + sigma_data^2)
        c_out   = sigma * sigma_data / sqrt(sigma^2 + sigma_data^2)
        c_in    = 1 / sqrt(sigma^2 + sigma_data^2)
        c_noise = log(sigma) / 4
    """
    sigma = jnp.asarray(sigma)
    sd2 = config.sigma_data**2
    var = jnp.square(sigma) + sd2
    c_skip = sd2 / var
    c_out = sigma * config.sigma_data / jnp.sqrt(var)
    c_in = 1.0 / jnp.sqrt(var)
    c_noise = jnp.log(sigma) / 4.0
    return c_skip, c_out, c_in, c_noise
