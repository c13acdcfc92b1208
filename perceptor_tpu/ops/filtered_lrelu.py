"""filtered_lrelu: FIR-upsample -> bias + leaky ReLU + clamp -> FIR-downsample.

TPU-native equivalent of the reference's 1.9k-LoC hand-tuned CUDA kernel
(perceptor/models/stylegan_xl/torch_utils/ops/filtered_lrelu.cu); the
functional spec is its reference implementation
(torch_utils/ops/filtered_lrelu.py:121-157). The composition here runs as
two depthwise dilated convs (ops/upfirdn2d, on the MXU conv path) with the
elementwise middle fused by XLA; the exact adjoint (the CUDA version needs
a sign buffer) falls out of XLA AD.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Union

import jax

from perceptor_tpu.ops.bias_act import bias_act
from perceptor_tpu.ops.upfirdn import upfirdn2d


def _parse_padding(padding) -> tuple:
    if isinstance(padding, int):
        return padding, padding, padding, padding
    padding = list(padding)
    if len(padding) == 2:
        px, py = padding
        return px, px, py, py
    return tuple(padding)


def filtered_lrelu(
    x: jax.Array,
    fu: Optional[jax.Array] = None,
    fd: Optional[jax.Array] = None,
    b: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding: Union[int, Sequence[int]] = 0,
    gain: float = math.sqrt(2),
    slope: float = 0.2,
    clamp: Optional[float] = None,
    flip_filter: bool = False,
) -> jax.Array:
    """(N, C, H, W) -> (N, C, H', W'), reference semantics exactly
    (filtered_lrelu.py:121-157): bias, upfirdn up (gain up^2), lrelu with
    `slope`/`gain`/`clamp`, upfirdn down."""
    px0, px1, py0, py1 = _parse_padding(padding)
    x = bias_act(x, b)
    if fu is not None or up > 1:
        import jax.numpy as jnp

        f = fu if fu is not None else jnp.ones((1, 1), dtype=x.dtype)
        x = upfirdn2d(
            x, f, up=up, padding=(px0, px1, py0, py1), gain=up**2,
            flip_filter=flip_filter,
        )
    else:
        import jax.numpy as jnp

        x = jnp.pad(x, ((0, 0), (0, 0), (py0, py1), (px0, px1)))
    x = bias_act(x, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    if fd is not None or down > 1:
        import jax.numpy as jnp

        f = fd if fd is not None else jnp.ones((1, 1), dtype=x.dtype)
        x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
    return x
