"""Fused nearest-2x-upsample + 3x3 conv via phase decomposition.

The SD UNet and VAE decoder upsample with `resize(nearest, 2x)` followed
by a 3x3 conv (diffusers Upsample2D). Profiling the fused guided step
showed these upsampler convs as the largest remaining ops (~13 ms/step
fwd+bwd at 512px across UNet+VAE): the conv runs at (2H, 2W) over
*duplicated* pixels, so 9-tap windows only ever see 2x2 distinct values.

Decomposition: output pixel (2i+py, 2j+px) reads input rows {i-1, i}
(py=0) or {i, i+1} (py=1), with row taps merged as
    py=0: [k0, k1+k2]        py=1: [k0+k1, k2]
(and the same per column). So the whole op is FOUR (H, W) convs with
2x2 kernels — 16 MACs per input pixel instead of 36 (2.25x fewer FLOPs)
— interleaved back to (2H, 2W). Exact: same sums, fewer redundant
multiplies.

Measured on v5e (bf16): 25-40% faster than resize+conv as a STANDALONE
jit program at SD shapes (e.g. 256²x512 fwd+bwd 22.3 -> 13.4 ms), but
~2.5% SLOWER inside the fully fused guided step, where XLA already folds
the nearest-upsample into the conv's input window reads and this form's
phase-interleave adds real copies. The SD/ADM model trees therefore keep
plain resize+conv; use this op for standalone upsampling pipelines
(decode-only loops, SR preprocessing) where it wins.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def nearest_upsample_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x upsample, NHWC, as broadcast + reshape.

    Exactly `jax.image.resize(method="nearest")` at integer 2x — but its
    VJP is a reshape + sum over the 2x2 phase axes (one fast fused reduce),
    where jax.image.resize's VJP lowers to a scatter-add (measured on the
    512px guided-step profile as a hot copy/scatter in the VAE decoder
    backward).
    """
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def upsample2x_nearest_conv3x3(
    x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array] = None
) -> jax.Array:
    """x (N, H, W, C), kernel (3, 3, C, F) HWIO -> (N, 2H, 2W, F).

    Equals conv3x3(pad=1)(nearest_upsample_2x(x)) exactly.
    """
    if kernel.shape[:2] != (3, 3):
        raise ValueError(f"expected 3x3 kernel, got {kernel.shape[:2]}")
    n, h, w, c = x.shape
    k = kernel
    # row-merged taps: (2, 3, C, F) per row phase
    rows = {
        0: jnp.stack([k[0], k[1] + k[2]], axis=0),
        1: jnp.stack([k[0] + k[1], k[2]], axis=0),
    }
    phases = []
    for py in (0, 1):
        r = rows[py]
        for px in (0, 1):
            if px == 0:
                k2 = jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1)
            else:
                k2 = jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1)
            pad_y = (1, 0) if py == 0 else (0, 1)
            pad_x = (1, 0) if px == 0 else (0, 1)
            out = jax.lax.conv_general_dilated(
                x,
                k2,
                window_strides=(1, 1),
                padding=(pad_y, pad_x),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            phases.append(out)
    o00, o01, o10, o11 = phases
    row0 = jnp.stack([o00, o01], axis=3)  # (N, H, W, 2, F)
    row1 = jnp.stack([o10, o11], axis=3)
    y = jnp.stack([row0, row1], axis=2)  # (N, H, 2, W, 2, F)
    y = y.reshape(n, 2 * h, 2 * w, kernel.shape[-1])
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
