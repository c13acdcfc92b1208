"""Shared DDIM update for the LDM-family fused samplers.

The same index-space DDIM formula appears in the reference's Text2Image
(:110-144), Face, and SuperResolution step() methods; the fused samplers
(one lax.scan per family) share it here with a traced eta.
"""

from __future__ import annotations

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
