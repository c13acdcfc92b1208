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


def _affine_bc(v):
    """(C,) or (N, C) affine -> broadcastable (1|N, 1, 1, C) fp32."""
    v = v.astype(jnp.float32)
    if v.ndim == 1:
        return v[None, None, None, :]
    return v[:, None, None, :]


_SQRT_2PI = 2.5066282746310002


def _apply_act(h, activation: str):
    if activation == "silu":
        return h * jax.nn.sigmoid(h)
    if activation == "relu":
        return jnp.maximum(h, 0.0)
    if activation == "gelu":
        return jax.nn.gelu(h, approximate=False)
    if activation == "none":
        return h
    raise ValueError(f"unsupported activation {activation!r}")


def _act_grad(h, activation: str):
    if activation == "silu":
        s = jax.nn.sigmoid(h)
        return s * (1.0 + h * (1.0 - s))
    if activation == "relu":
        return (h > 0.0).astype(h.dtype)
    if activation == "gelu":
        # d/dh [h * Phi(h)] = Phi(h) + h * phi(h)
        return jax.scipy.stats.norm.cdf(h) + h * jnp.exp(-0.5 * h * h) / _SQRT_2PI
    if activation == "none":
        return jnp.ones_like(h)
    raise ValueError(f"unsupported activation {activation!r}")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_group_norm_act(x, scale, bias, num_groups=32, eps=1e-5,
                         out_dtype=None, activation="silu"):
    """act(group_norm(x) * scale + bias) over NHWC, fused fwd/bwd.

    `scale`/`bias` may be per-channel (C,) or per-sample (N, C) — the
    latter covers scale-shift conditioning (ADM, AdaGN, velocity's
    modulate: fold the GN affine and the emb-derived affine into one
    (N, C) pair outside; AD chains through the fold). `activation` is one
    of "silu" | "relu" | "gelu" (exact) | "none". Numerically identical
    to `group_norm` (fp32 stats) + fp32 activation, cast to `out_dtype`
    (default: x.dtype).
    """
    mean, rstd = _gn_stats(x, num_groups, eps)
    xhat = _gn_normalize(x, mean, rstd, num_groups)
    h = xhat * _affine_bc(scale) + _affine_bc(bias)
    return _apply_act(h, activation).astype(out_dtype or x.dtype)


def fused_group_norm_silu(x, scale, bias, num_groups=32, eps=1e-5,
                          out_dtype=None):
    """silu(group_norm(x) * scale + bias) — see fused_group_norm_act."""
    return fused_group_norm_act(x, scale, bias, num_groups, eps, out_dtype,
                                "silu")


def _fused_gn_act_fwd(x, scale, bias, num_groups, eps, out_dtype, activation):
    mean, rstd = _gn_stats(x, num_groups, eps)
    xhat = _gn_normalize(x, mean, rstd, num_groups)
    h = xhat * _affine_bc(scale) + _affine_bc(bias)
    y = _apply_act(h, activation)
    return y.astype(out_dtype or x.dtype), (x, scale, bias, mean, rstd)


def _fused_gn_act_bwd(num_groups, eps, out_dtype, activation, residuals, dy):
    x, scale, bias, mean, rstd = residuals
    n, hh, ww, c = x.shape
    per = c // num_groups
    m = hh * ww * per

    xhat = _gn_normalize(x, mean, rstd, num_groups)
    h = xhat * _affine_bc(scale) + _affine_bc(bias)
    dh = dy.astype(jnp.float32) * _act_grad(h, activation)
    dxhat = dh * _affine_bc(scale)

    # ALL big reductions are per-channel over (H, W) [+ N for 1-D affine]:
    # C stays on the lane dim, no relayout (see _gn_stats). XLA fuses them
    # with the elementwise chain above into one pass over (x, dy).
    dh_nc = dh.sum(axis=(1, 2))                        # (N, C)
    dhx_nc = (dh * xhat).sum(axis=(1, 2))              # (N, C)
    if scale.ndim == 1:
        dscale = jnp.sum(dhx_nc, axis=0).astype(scale.dtype)
        dbias = jnp.sum(dh_nc, axis=0).astype(bias.dtype)
    else:
        dscale = dhx_nc.astype(scale.dtype)
        dbias = dh_nc.astype(bias.dtype)

    # per-(N, G) means for the normalization backward, finished on the
    # tiny (N, C) partials (dxhat = dh * scale channel-wise, so the
    # spatial sum of dxhat is dh_nc * scale whether scale is (C,) or (N, C))
    scale_f = scale.astype(jnp.float32)
    scale_f = scale_f[None] if scale_f.ndim == 1 else scale_f
    a = _group_sum(dh_nc * scale_f, num_groups) / m    # (N, G)
    b = _group_sum(dhx_nc * scale_f, num_groups) / m   # (N, G)
    a_c = jnp.repeat(a, per, axis=1).reshape(n, 1, 1, c)
    b_c = jnp.repeat(b, per, axis=1).reshape(n, 1, 1, c)
    rstd_c = jnp.repeat(rstd, per, axis=1).reshape(n, 1, 1, c)

    dx = (rstd_c * (dxhat - a_c - xhat * b_c)).astype(x.dtype)
    return dx, dscale, dbias


fused_group_norm_act.defvjp(_fused_gn_act_fwd, _fused_gn_act_bwd)


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


class ScaleShiftGroupNormSiLU(nn.Module):
    """silu(group_norm(x) * (1 + scale) + shift) with scale/shift (N, C)
    from a conditioning embedding — ADM's use_scale_shift_norm (reference
    guided_diffusion unet.py:222-229), one fused custom-VJP op.

    The GN affine and the emb-derived affine fold into one (N, C) pair;
    param names (scale, bias) match nn.GroupNorm so converters are
    unaffected.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    out_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, scale_nc, shift_nc):
        c = x.shape[-1]
        g_s = self.param("scale", lambda k, s: jnp.ones(s, jnp.float32), (c,))
        g_b = self.param("bias", lambda k, s: jnp.zeros(s, jnp.float32), (c,))
        one_plus = 1.0 + scale_nc.astype(jnp.float32)
        a = g_s[None] * one_plus
        b = g_b[None] * one_plus + shift_nc.astype(jnp.float32)
        return fused_group_norm_silu(
            x, a, b, min(self.num_groups, c), self.epsilon, self.out_dtype
        )
