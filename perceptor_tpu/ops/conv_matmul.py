"""3x3 conv as explicit MXU matmuls, for shapes XLA won't strip-mine.

Profiled on the 512px VAE decode (docs/PERFORMANCE.md): XLA's TPU conv
emitter space-to-batch-rewrites large-spatial convs into strips that run
at ~193 TFLOP/s (98% of v5e bf16 peak), but batch-1 convs at 64x64 and
128x128 spatial with C>=512 are NOT rewritten and run at 23-25 TFLOP/s
with a pathological {3,0,2,1:T(2,128)} layout. Lowering those convs to
matmuls lets the MXU tile them like any other GEMM. Two lowerings:

- "shifts" (the default, `conv3x3_as_shifts`): 9 dot_generals over
  shifted NHWC windows of the padded input, partials accumulated in
  f32 — no patch buffer is ever materialized.
- "im2col" (`conv3x3_as_matmul`): pad -> 9-shift concat -> ONE
  (N*H*W, 9*C) x (9*C, Cout) matmul. Kept for A/B comparison; the 9x
  patch-buffer write+reread made it measurably slower than "shifts" at
  every policy shape (scripts/ab_conv3x3.py).

The reference hits the same problem class with cuDNN algorithm selection;
here the fix is an explicit lowering choice, applied by `Conv3x3`'s
shape policy.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def conv3x3_as_matmul(
    x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array] = None
) -> jax.Array:
    """SAME-padded 3x3 conv, NHWC x (3, 3, Cin, Cout), via one matmul.

    Exactly nn.Conv(padding=1) including dtype behavior (accumulate per
    the inputs' dtypes; XLA matmul accumulates bf16 inputs in fp32).
    """
    n, h, w, c = x.shape
    kh, kw, cin, cout = kernel.shape
    if (kh, kw) != (3, 3) or cin != c:
        raise ValueError(f"kernel {kernel.shape} does not fit input {x.shape}")
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # ky-major, kx, then channel — matches kernel.reshape(9 * cin, cout)
    patches = jnp.concatenate(
        [
            xp[:, ky : ky + h, kx : kx + w, :]
            for ky in range(3)
            for kx in range(3)
        ],
        axis=-1,
    )
    out = jax.lax.dot_general(
        patches.reshape(n * h * w, 9 * c),
        kernel.reshape(9 * cin, cout),
        (((1,), (0,)), ((), ())),
    )
    out = out.reshape(n, h, w, cout)
    if bias is not None:
        out = out + bias
    return out


# which matmul lowering Conv3x3 uses when its shape policy fires:
# "im2col" (9-shift concat, one big matmul) or "shifts" (9 dots, no
# patch buffer). Module-level so A/B scripts can flip it globally.
MATMUL_LOWERING = "shifts"


def conv3x3_as_shifts(
    x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array] = None
) -> jax.Array:
    """SAME-padded 3x3 conv as a sum of 9 shifted dot_generals.

    Same MXU-matmul lowering idea as `conv3x3_as_matmul`, but without
    materializing the 9x im2col patch buffer: each tap contracts a
    shifted NHWC window of the padded input directly against its
    (Cin, Cout) kernel slice, and the 9 partial products accumulate in
    f32 (matching the single-matmul accumulation numerics to bf16
    rounding). Measured faster than im2col at every policy shape
    (scripts/ab_conv3x3.py) because the concat write+reread of 9x the
    input bytes disappears.
    """
    n, h, w, c = x.shape
    kh, kw, cin, cout = kernel.shape
    if (kh, kw) != (3, 3) or cin != c:
        raise ValueError(f"kernel {kernel.shape} does not fit input {x.shape}")
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for ky in range(3):
        for kx in range(3):
            xs = jax.lax.slice(xp, (0, ky, kx, 0), (n, ky + h, kx + w, c))
            contrib = jax.lax.dot_general(
                xs,
                kernel[ky, kx],
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out = contrib if out is None else out + contrib
    out = out.astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


class Conv3x3(nn.Module):
    """Drop-in for nn.Conv(features, (3, 3), padding=1): same param
    names/shapes (kernel HWIO, bias), but lowered to MXU matmuls (the
    module-level `MATMUL_LOWERING` variant — "shifts" by default) when
    the shape falls in XLA's slow-conv regime (see module docstring).

    `as_matmul=None` applies the measured policy: batch*H*W <= 16384
    (<= 128x128 at batch 1) and Cin >= 256. True/False force the path.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    as_matmul: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, c, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        use_matmul = self.as_matmul
        if use_matmul is None:
            use_matmul = n * h * w <= 16384 and c >= 256
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        if use_matmul:
            lower = (
                conv3x3_as_shifts
                if MATMUL_LOWERING == "shifts"
                else conv3x3_as_matmul
            )
            return lower(x, kernel, bias)
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
