"""GroupNorm and fused GroupNorm-SiLU.

The GroupNorm -> SiLU -> conv chain is the body of every ResNet block in
the SD/ADM/LDM UNets and VAEs (reference uses torch GroupNorm + SiLU,
e.g. diffusers ResnetBlock2D and guided_diffusion/unet.py:141). On TPU
the profitable fusion — normalization statistics, affine, and SiLU in
one HBM pass fused into the following conv's input — is exactly what XLA
does when the chain is expressed as one jit region, so this op is a
composite (stats in fp32 regardless of compute dtype, matching the
reference's autocast behavior) rather than a hand-written kernel: the
surrounding convs dominate these blocks and XLA already fuses the
elementwise chain, so a Pallas kernel would duplicate the compiler.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def group_norm(
    x: jax.Array,
    num_groups: int = 32,
    scale: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    eps: float = 1e-5,
    channel_axis: int = -1,
) -> jax.Array:
    """GroupNorm over (..., C) or (N, C, ...) arrays.

    Statistics are computed in fp32 per (batch, group) over all spatial
    positions and the group's channels; scale/bias are per-channel.
    """
    channel_axis = channel_axis % x.ndim
    c = x.shape[channel_axis]
    if c % num_groups:
        raise ValueError(f"{c} channels not divisible by {num_groups} groups")

    # move channels last, reshape to (N, ..., G, C/G)
    perm = [i for i in range(x.ndim) if i != channel_axis] + [channel_axis]
    inv = [perm.index(i) for i in range(x.ndim)]
    xt = x.transpose(perm)
    shape = xt.shape
    grouped = xt.reshape(shape[0], -1, num_groups, c // num_groups)

    g32 = grouped.astype(jnp.float32)
    mean = g32.mean(axis=(1, 3), keepdims=True)
    var = g32.var(axis=(1, 3), keepdims=True)
    normed = (g32 - mean) * jax.lax.rsqrt(var + eps)
    normed = normed.reshape(shape).astype(x.dtype)

    if scale is not None:
        normed = normed * scale.astype(x.dtype)
    if bias is not None:
        normed = normed + bias.astype(x.dtype)
    return normed.transpose(inv)


def group_norm_silu(
    x: jax.Array,
    num_groups: int = 32,
    scale: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    eps: float = 1e-5,
    channel_axis: int = -1,
) -> jax.Array:
    """GroupNorm followed by SiLU, one fused jit region."""
    h = group_norm(x, num_groups, scale, bias, eps, channel_axis)
    return h * jax.nn.sigmoid(h)
