"""DPM-Solver++(2M): second-order multistep ODE solver update.

Lu et al. 2022 (arXiv:2211.01095), the data-prediction ("++") multistep
variant — the modern default sampler in k-diffusion/diffusers, reaching
50-step DDIM quality in ~20 evals (one model eval per step, like DDIM;
the speedup is fewer steps at equal quality, not cheaper steps).

Beyond-reference capability: the reference ships DDIM/PNDM only.  The
update is a pure function over (alpha, sigma) schedule values, so every
diffusion family (indexed eps, continuous-t velocity) reuses it inside
its fused `lax.scan` sampler via
`PredictionAlgebra.dpm_solver_pp_step`: carry the previous denoised
estimate and the previous log-SNR step size — no extra model evals.
"""

from __future__ import annotations

import jax.numpy as jnp


def dpm_pp_2m_update(
    x,
    denoised,
    prev_denoised,
    prev_h,
    from_alphas,
    from_sigmas,
    to_alphas,
    to_sigmas,
    is_first,
):
    """One DPM-Solver++(2M) update from `from_*` to `to_*` in x-space.

    All schedule arguments are broadcast-ready against `x` (the algebra
    passes (N,1,1,1)).  `prev_h` is the previous log-SNR step size (pass
    ones on the first step — it only enters via h / prev_h); `is_first`
    selects the first-order exponential-integrator update (bool, scalar
    or broadcastable).

    Returns (x_next, h): carry `h` as the next step's `prev_h` and
    `denoised` as its `prev_denoised`.
    """
    # clamp away the schedule endpoints: cos(t*pi/2) at t=1 is a tiny
    # (possibly NEGATIVE) float32 value and sigma at index 0 can be ~0 —
    # either would poison the log-SNR
    def _lam(alphas, sigmas):
        return jnp.log(
            jnp.maximum(alphas, 1e-12) / jnp.maximum(sigmas, 1e-12)
        )

    lam_from = _lam(from_alphas, from_sigmas)
    lam_to = _lam(to_alphas, to_sigmas)
    h = lam_to - lam_from
    coeff = h / (2 * prev_h)  # = 1/(2r) with r = prev_h / h
    d = jnp.where(
        is_first,
        denoised,
        (1 + coeff) * denoised - coeff * prev_denoised,
    )
    x_next = (to_sigmas / from_sigmas) * x - to_alphas * jnp.expm1(-h) * d
    return x_next, h
