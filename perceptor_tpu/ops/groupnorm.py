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

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


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


# -- fused custom-VJP GroupNorm+SiLU (NHWC) ----------------------------------
#
# Autodiff through the composite stores fp32 intermediates (the cast input,
# the normalized activations) and emits several separate reduce fusions in
# the backward pass — on the 512px guided-step profile the GroupNorm-related
# reduce fusions total ~28 ms/step, several of them 3x off the HBM roofline.
# The custom VJP stores only (x, mean, rstd) and recomputes everything else,
# so the backward pass is exactly two roofline passes over (x, dy): one
# producing the four reductions (dscale, dbias and the two per-group means),
# one producing dx. All statistics in fp32.


def _group_sum(per_channel, num_groups: int):
    """(N, C) per-channel partials -> (N, G). Tiny; layout-free."""
    n, c = per_channel.shape
    return per_channel.reshape(n, num_groups, c // num_groups).sum(axis=-1)


def _gn_stats(x, num_groups: int, eps: float):
    """All BIG reductions are per-channel over (H, W) — C stays on the lane
    dim and the array is never reshaped (a (N, HW, G, per) reshape forces a
    relayout of the whole map; measured 3x off the HBM roofline on the
    512px profile). The per-group finish runs on the tiny (N, C) partials.
    """
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    m = (h * w) * (c // num_groups)
    sum_c = xf.sum(axis=(1, 2))                      # (N, C)
    sq_c = jnp.square(xf).sum(axis=(1, 2))           # (N, C)
    mean = _group_sum(sum_c, num_groups) / m         # (N, G)
    var = _group_sum(sq_c, num_groups) / m - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    return mean, rstd


def _gn_normalize(x, mean, rstd, num_groups: int):
    n, h, w, c = x.shape
    per = c // num_groups
    mean_c = jnp.repeat(mean, per, axis=1).reshape(n, 1, 1, c)
    rstd_c = jnp.repeat(rstd, per, axis=1).reshape(n, 1, 1, c)
    return (x.astype(jnp.float32) - mean_c) * rstd_c


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_group_norm_silu(x, scale, bias, num_groups=32, eps=1e-5,
                          out_dtype=None):
    """silu(group_norm(x) * scale + bias) over NHWC, fused fwd/bwd.

    Numerically identical to `group_norm` (fp32 stats) followed by fp32
    SiLU, cast to `out_dtype` (default: x.dtype).
    """
    mean, rstd = _gn_stats(x, num_groups, eps)
    xhat = _gn_normalize(x, mean, rstd, num_groups)
    h = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    y = h * jax.nn.sigmoid(h)
    return y.astype(out_dtype or x.dtype)


def _fused_gn_silu_fwd(x, scale, bias, num_groups, eps, out_dtype):
    mean, rstd = _gn_stats(x, num_groups, eps)
    xhat = _gn_normalize(x, mean, rstd, num_groups)
    h = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    y = h * jax.nn.sigmoid(h)
    return y.astype(out_dtype or x.dtype), (x, scale, bias, mean, rstd)


def _fused_gn_silu_bwd(num_groups, eps, out_dtype, residuals, dy):
    x, scale, bias, mean, rstd = residuals
    n, hh, ww, c = x.shape
    per = c // num_groups
    m = hh * ww * per

    xhat = _gn_normalize(x, mean, rstd, num_groups)
    h = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    s = jax.nn.sigmoid(h)
    dh = dy.astype(jnp.float32) * (s * (1.0 + h * (1.0 - s)))
    dxhat = dh * scale.astype(jnp.float32)

    # ALL big reductions are per-channel over (N, H, W) / (H, W): C stays
    # on the lane dim, no relayout (see _gn_stats). XLA fuses these with
    # the elementwise chain above into one pass over (x, dy).
    dh_nc = dh.sum(axis=(1, 2))                        # (N, C)
    dhx_nc = (dh * xhat).sum(axis=(1, 2))              # (N, C)
    dscale = jnp.sum(dhx_nc, axis=0).astype(scale.dtype)
    dbias = jnp.sum(dh_nc, axis=0).astype(bias.dtype)

    # per-(N, G) means for the normalization backward, finished on the
    # tiny (N, C) partials (dxhat = dh * scale channel-wise)
    scale_f = scale.astype(jnp.float32)[None]          # (1, C)
    a = _group_sum(dh_nc * scale_f, num_groups) / m    # (N, G)
    b = _group_sum(dhx_nc * scale_f, num_groups) / m   # (N, G)
    a_c = jnp.repeat(a, per, axis=1).reshape(n, 1, 1, c)
    b_c = jnp.repeat(b, per, axis=1).reshape(n, 1, 1, c)
    rstd_c = jnp.repeat(rstd, per, axis=1).reshape(n, 1, 1, c)

    dx = (rstd_c * (dxhat - a_c - xhat * b_c)).astype(x.dtype)
    return dx, dscale, dbias


fused_group_norm_silu.defvjp(_fused_gn_silu_fwd, _fused_gn_silu_bwd)


class GroupNormSiLU(nn.Module):
    """Drop-in for `nn.GroupNorm(...)` + SiLU with the fused custom VJP.

    Param names (scale, bias) match nn.GroupNorm so converters are
    unaffected.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    out_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", lambda k, s: jnp.ones(s, jnp.float32), (c,))
        bias = self.param("bias", lambda k, s: jnp.zeros(s, jnp.float32), (c,))
        return fused_group_norm_silu(
            x, scale, bias, min(self.num_groups, c), self.epsilon,
            self.out_dtype,
        )
