"""conv2d fused with FIR up/downsampling (StyleGAN toolbox op).

TPU-native equivalent of the reference's
perceptor/models/stylegan_xl/torch_utils/ops/conv2d_resample.py:46-143:
``downsample(conv2d(upsample(pad(x), f), w), f)`` with the padding applied
once up front, expressed relative to the *upsampled* image.

The torch original dispatches across five cudnn-specific fast paths
(conv_transpose reorderings, stride folding) because zero-inserted
upsampling is slow on cudnn.  On TPU none of that is needed: upfirdn2d
lowers to one `lax.conv_general_dilated` whose `lhs_dilation` /
`window_strides` ARE the up/down factors, XLA fuses the chain, and AD
provides the exact adjoint.  So this is the reference's generic fallback
path (its functional spec, :138-143), which all its fast paths refactor.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

from perceptor_tpu.ops.upfirdn import upfirdn2d

_IDENTITY = None  # lazily-built 1x1 identity filter


def _parse_padding(padding) -> tuple:
    """Reference upfirdn2d._parse_padding convention: int, (x, y), or
    (x0, x1, y0, y1), where x = width axis."""
    if isinstance(padding, int):
        return padding, padding, padding, padding
    padding = tuple(int(p) for p in padding)
    if len(padding) == 2:
        px, py = padding
        return px, px, py, py
    px0, px1, py0, py1 = padding
    return px0, px1, py0, py1


def _filter_size(f) -> tuple:
    if f is None:
        return 1, 1
    if f.ndim == 1:
        return int(f.shape[0]), int(f.shape[0])
    return int(f.shape[1]), int(f.shape[0])  # (fw, fh)


def conv2d_resample(
    x: jax.Array,
    w: jax.Array,
    f: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding: Union[int, Sequence[int]] = 0,
    groups: int = 1,
    flip_weight: bool = True,
    flip_filter: bool = False,
) -> jax.Array:
    """2D convolution with optional FIR up/downsampling.

    Args:
        x: (N, C_in, H, W) input.
        w: (C_out, C_in // groups, kh, kw) weights.
        f: low-pass FIR filter taps (1D separable or 2D), normalized via
            `ops.upfirdn.setup_filter`; None = identity.
        up / down: integer resampling factors applied before / after the conv.
        padding: relative to the upsampled image (int, (x, y), or
            (x0, x1, y0, y1)); may be negative (crop).
        groups: grouped convolution.
        flip_weight: True = correlation (torch `conv2d` semantics),
            False = true convolution (weights flipped).
        flip_filter: same toggle for the FIR taps.
    """
    if x.ndim != 4 or w.ndim != 4:
        raise ValueError(f"need 4D x and w, got {x.shape=} {w.shape=}")
    if f is not None:
        f = jnp.asarray(f, jnp.float32)
    fw, fh = _filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)

    # Center the FIR taps around the up/downsampling grid (reference :85-95).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    identity = jnp.ones((1, 1), jnp.float32)
    up_filter = f if (up > 1 and f is not None) else identity
    x = upfirdn2d(
        x,
        up_filter,
        up=up,
        padding=(px0, px1, py0, py1),
        gain=up * up,
        flip_filter=flip_filter,
    )

    wk = w.astype(x.dtype)
    if not flip_weight and (w.shape[2] > 1 or w.shape[3] > 1):
        wk = wk[:, :, ::-1, ::-1]
    x = jax.lax.conv_general_dilated(
        x,
        wk,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        precision=jax.lax.Precision.HIGHEST,
    )

    if down > 1:
        x = upfirdn2d(x, identity if f is None else f, down=down,
                      flip_filter=flip_filter)
    return x
