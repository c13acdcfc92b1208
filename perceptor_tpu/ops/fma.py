"""Broadcast-aware fused multiply-add: ``fma(a, b, c) == a * b + c``.

TPU-native equivalent of the reference's custom-autograd FMA
(perceptor/models/stylegan_xl/torch_utils/ops/fma.py:15-60).  The torch
version exists because `torch.addcmul` has slow gradients and because
the backward must un-broadcast `dout` back to each operand's shape.  On
TPU neither problem exists: XLA fuses the multiply-add into one VPU
instruction and JAX AD inserts the reduce-sum un-broadcast automatically,
so this is the plain expression — kept as a named op so the StyleGAN-XL
toolbox surface matches the reference 1:1.
"""

from __future__ import annotations

import jax


def fma(a: jax.Array, b: jax.Array, c: jax.Array) -> jax.Array:
    """a * b + c with numpy broadcasting; gradients un-broadcast exactly."""
    return a * b + c
