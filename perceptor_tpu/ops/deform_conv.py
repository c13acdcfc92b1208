"""Deformable convolution v1 (torchvision `deform_conv2d` semantics).

The reference's deep-image-prior HQ skip net wraps every 3x3 conv in a
`torchvision.ops.DeformConv2d` whose offset map comes from a side branch
(reference perceptor/models/deep_image_prior/common.py:92-219,
get_hq_skip_net.py:72-118 with offset_groups=4). The CUDA kernel there
is a per-sample gather; the TPU formulation decomposes over the K*K
kernel taps: for each tap, bilinearly sample the input at
(out_pos * stride - padding + tap * dilation + offset) — one vectorized
4-corner gather per tap — then contract the sampled stack against the
tap's weight slice on the MXU. K*K is static (9 for 3x3), so XLA sees a
flat fused program with 4*K*K gathers and one matmul per tap.

Offset layout matches torchvision: (batch, 2 * offset_groups * K_h * K_w,
H_out, W_out), interleaved (dy, dx) per (group, tap); input channels are
split evenly over offset groups; samples outside the input are zero
(bilinear corners blend with zeros at the border).

Everything is plain differentiable JAX: gradients flow to the input, the
offsets (through the bilinear weights), the kernel, and the bias.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

IntOrPair = Union[int, Tuple[int, int]]


def _pair(v: IntOrPair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def _bilinear_sample(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample img (C, H, W) at float coords ys/xs (...,) -> (C, ...).

    Out-of-range samples are zero; border samples blend with zeros, the
    deform-conv convention (NOT grid_sample's border clamping).

    TPU formulation: the naive `img[:, yc, xc]` is a pointwise 2D gather
    (scalar-granularity on TPU). Instead the image is laid out as an
    (H*W, C) table and each corner becomes `jnp.take(table, flat_idx,
    axis=0)` — per-pixel CONTIGUOUS row reads of C lanes. Measured on
    the DIP HQ mode fwd+VJP (round 4): 618 -> 568 ms (-8%); the
    remaining cost is the VJP's scatter-add into the table (the image
    gradient), which no gather layout removes — see the deform study in
    docs/PERFORMANCE.md.
    """
    c, h, w = img.shape
    table = img.reshape(c, h * w).T  # (HW, C): rows are channel vectors
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    shape = ys.shape

    out = None
    for dy, wy in ((0, (1.0 - (ys - y0))), (1, ys - y0)):
        for dx, wx in ((0, (1.0 - (xs - x0))), (1, xs - x0)):
            yi = y0 + dy
            xi = x0 + dx
            valid = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
            yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            idx = (yc * w + xc).reshape(-1)
            v = jnp.take(table, idx, axis=0)  # (P, C) row gathers
            weight = (wy * wx * valid).reshape(-1, 1)
            contrib = v * weight
            out = contrib if out is None else out + contrib
    return out.T.reshape(c, *shape)


def deform_conv2d(
    x: jax.Array,
    offsets: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: IntOrPair = 1,
    padding: IntOrPair = 0,
    dilation: IntOrPair = 1,
) -> jax.Array:
    """Deformable conv: x (B, C, H, W), offsets (B, 2*G*Kh*Kw, Ho, Wo),
    weight (O, C, Kh, Kw), NCHW -> (B, O, Ho, Wo).

    The offset-group count G is inferred from the offset channel dim; C
    must divide by G. Padding is virtual (a coordinate shift into the
    zero-outside sampler), so no padded copy is materialized.
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    b, c, h, w = x.shape
    oc, ic, kh, kw = weight.shape
    if ic != c:
        raise ValueError(f"weight expects {ic} input channels, got {c}")
    n_off = offsets.shape[1]
    if n_off % (2 * kh * kw):
        raise ValueError(
            f"offset channels {n_off} not divisible by 2*Kh*Kw={2 * kh * kw}"
        )
    groups = n_off // (2 * kh * kw)
    if c % groups:
        raise ValueError(f"{c} channels not divisible by {groups} offset groups")

    h_out = (h + 2 * ph - (dh * (kh - 1) + 1)) // sh + 1
    w_out = (w + 2 * pw - (dw * (kw - 1) + 1)) // sw + 1
    if offsets.shape[2:] != (h_out, w_out):
        raise ValueError(
            f"offsets spatial shape {offsets.shape[2:]} != output ({h_out}, {w_out})"
        )

    dtype = x.dtype
    # (B, G, Kh, Kw, 2, Ho, Wo) — torchvision channel order
    off = offsets.reshape(b, groups, kh, kw, 2, h_out, w_out).astype(jnp.float32)
    base_y = (jnp.arange(h_out, dtype=jnp.float32) * sh - ph)[:, None]
    base_x = (jnp.arange(w_out, dtype=jnp.float32) * sw - pw)[None, :]

    xg = x.reshape(b, groups, c // groups, h, w)
    # vmap the (C, H, W) sampler over batch then offset groups
    sample = jax.vmap(jax.vmap(_bilinear_sample))

    out = jnp.zeros((b, oc, h_out, w_out), jnp.float32)
    wg = weight.reshape(oc, groups, c // groups, kh, kw).astype(jnp.float32)
    for i in range(kh):
        for j in range(kw):
            ys = base_y + i * dh + off[:, :, i, j, 0]  # (B, G, Ho, Wo)
            xs = base_x + j * dw + off[:, :, i, j, 1]
            sampled = sample(xg.astype(jnp.float32), ys, xs)  # (B, G, Cg, Ho, Wo)
            out = out + jnp.einsum(
                "bgchw,ogc->bohw", sampled, wg[:, :, :, i, j]
            )
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :, None, None]
    return out.astype(dtype)
