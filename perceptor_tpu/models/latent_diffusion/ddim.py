"""Shared DDIM update for the LDM-family fused samplers.

The same index-space DDIM formula appears in the reference's Text2Image
(:110-144), Face, and SuperResolution step() methods; the fused samplers
(one lax.scan per family) share it here with a traced eta.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ddim_update(latents, eps, denoised, from_ac, to_ac, eta, noise):
    """One DDIM update in alphas-cumprod index space.

    ``from_ac``/``to_ac`` are the (broadcast) alphas_cumprod at the two
    schedule indices; ``eta`` may be traced (eta==0 reduces exactly to
    the deterministic update since ``to_sigmas`` becomes 0).
    """
    to_sigmas = eta * jnp.sqrt(
        (1 - to_ac) / (1 - from_ac) * (1 - from_ac / to_ac)
    )
    dir_xt = jnp.sqrt(1.0 - to_ac - to_sigmas**2) * eps
    return jnp.sqrt(to_ac) * denoised + dir_xt + to_sigmas * noise


def build_ldm_sample_run(owner, stochastic, make_eps_fn, decode,
                         method="ddim"):
    """Shared fused-sampler builder for the LDM family (Text2Image, Face,
    SuperResolution): per pair eps -> denoise -> update, final denoise
    -> first-stage decode, as ONE jitted lax.scan program.

    ``owner`` supplies the schedule tables (``alphas_cumprod`` /
    ``sqrt_one_minus_alphas_cumprod``); ``make_eps_fn(params, cond,
    guidance_scale, n)`` returns the family's ``(latents, index) -> eps``
    closure (built-in CFG, concat conditioning, or unconditional — cond
    and guidance_scale pass through unused where not applicable);
    ``decode(params, denoised_latents) -> images [0, 1]``.

    ``method``: ``"ddim"`` (default) or ``"dpm++"`` — DPM-Solver++(2M)
    (predictions/dpm_solver.py) over the same alphas-cumprod grid
    (alpha = sqrt(ac), sigma = sqrt(1-ac)); deterministic, so the caller
    must have rejected eta>0.
    """
    from perceptor_tpu.predictions.dpm_solver import dpm_pp_2m_update

    @jax.jit
    def run(params, latents, pairs, cond, key, guidance_scale, eta):
        n = latents.shape[0]
        eps_fn = make_eps_fn(params, cond, guidance_scale, n)

        def denoise(latents, index, eps):
            return (
                latents - owner.sqrt_one_minus_alphas_cumprod(index) * eps
            ) / jnp.sqrt(owner.alphas_cumprod(index))

        def body(carry, step_input):
            i, pair = step_input
            from_i, to_i = pair[0], pair[1]
            if method == "dpm++":
                latents, prev_x0, prev_h, key = carry
            else:
                latents, key = carry
            eps = eps_fn(latents, from_i)
            denoised = denoise(latents, from_i, eps)
            if method == "dpm++":
                from_ac = owner.alphas_cumprod(from_i)
                to_ac = owner.alphas_cumprod(to_i)
                stepped, h = dpm_pp_2m_update(
                    latents, denoised, prev_x0, prev_h,
                    jnp.sqrt(from_ac), jnp.sqrt(1.0 - from_ac),
                    jnp.sqrt(to_ac), jnp.sqrt(1.0 - to_ac),
                    i == 0,
                )
                return (stepped, denoised, h, key), None
            if stochastic:
                key, noise_key = jax.random.split(key)
                noise = jax.random.normal(
                    noise_key, latents.shape, latents.dtype
                )
            else:
                noise = jnp.zeros_like(latents)
            latents = ddim_update(
                latents, eps, denoised, owner.alphas_cumprod(from_i),
                owner.alphas_cumprod(to_i), eta, noise,
            )
            return (latents, key), None

        steps = (jnp.arange(pairs.shape[0]), pairs)
        if method == "dpm++":
            # prev_h carry matches h's broadcast shape (alphas_cumprod
            # returns (1,1,1,1)) so the scan carry structure is stable
            carry0 = (latents, jnp.zeros_like(latents),
                      jnp.ones_like(owner.alphas_cumprod(pairs[0, 0])), key)
            (latents, *_), _ = jax.lax.scan(body, carry0, steps)
        else:
            (latents, _), _ = jax.lax.scan(body, (latents, key), steps)
        final_i = pairs[-1, 1]
        denoised = denoise(latents, final_i, eps_fn(latents, final_i))
        return decode(params, denoised)

    return run
