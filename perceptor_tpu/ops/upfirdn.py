"""upfirdn2d: upsample -> FIR filter -> downsample, plus FIR resamplers.

TPU-native equivalent of the reference's CUDA upfirdn2d
(perceptor/models/stylegan_xl/torch_utils/ops/upfirdn2d.py:118, ref impl
:167-214) and of k-diffusion's fixed-blur Downsample2d/Upsample2d
(perceptor/models/monster_diffusion/base/layers.py:186-230).

Implementation: one depthwise `lax.conv_general_dilated` — zero-insertion
upsampling is `lhs_dilation`, downsampling is `window_strides`, so XLA maps
the whole op onto the MXU convolution path with no intermediate HBM
round-trips. The adjoint (a flipped-filter upfirdn, reference
upfirdn2d.py:217-274) falls out of XLA AD automatically — conv transpose
of a dilated conv IS the flipped-filter upfirdn — so no custom VJP is
needed for exactness.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

# k-diffusion fixed kernels (reference monster_diffusion/base/layers.py:186-205)
FIR_KERNELS = {
    "linear": [1 / 8, 3 / 8, 3 / 8, 1 / 8],
    "cubic": [
        -0.01171875, -0.03515625, 0.11328125, 0.43359375,
        0.43359375, 0.11328125, -0.03515625, -0.01171875,
    ],
    "lanczos3": [
        0.003689131001010537, 0.015056144446134567, -0.03399861603975296,
        -0.066637322306633, 0.13550527393817902, 0.44638532400131226,
        0.44638532400131226, 0.13550527393817902, -0.066637322306633,
        -0.03399861603975296, 0.015056144446134567, 0.003689131001010537,
    ],
}
FIR_KERNELS["bilinear"] = FIR_KERNELS["linear"]
FIR_KERNELS["bicubic"] = FIR_KERNELS["cubic"]


def setup_filter(
    f, normalize: bool = True, gain: float = 1.0, separable=None
) -> jnp.ndarray:
    """Filter setup matching reference upfirdn2d.py:70-115: accepts scalar,
    1D (outer-product to 2D), or 2D taps; normalizes to unit sum."""
    f = np.asarray(f, dtype=np.float64)
    if f.ndim == 0:
        f = f[None]
    if f.ndim == 1:
        f = np.outer(f, f)
    if normalize:
        f = f / f.sum()
    f = f * gain
    return jnp.asarray(f, dtype=jnp.float32)


def _as_tuple(v, n=2) -> Tuple[int, ...]:
    if isinstance(v, int):
        return (v,) * n
    return tuple(v)


def upfirdn2d(
    x: jax.Array,
    kernel: jax.Array,
    up: Union[int, Sequence[int]] = 1,
    down: Union[int, Sequence[int]] = 1,
    padding: Union[int, Sequence[int]] = 0,
    gain: float = 1.0,
    flip_filter: bool = False,
) -> jax.Array:
    """(N, C, H, W) -> upsample(up) -> pad -> FIR -> downsample(down).

    `padding` is (px0, px1, py0, py1) in reference convention (x = width).
    Matches reference upfirdn2d ref impl (upfirdn2d.py:167-214): gain is
    applied exactly as given, filtering is correlation (flip_filter=False).
    """
    upx, upy = _as_tuple(up)
    downx, downy = _as_tuple(down)
    if isinstance(padding, int):
        px0 = px1 = py0 = py1 = padding
    else:
        px0, px1, py0, py1 = padding

    kernel = jnp.asarray(kernel, dtype=jnp.float32)
    n, c, h, w = x.shape
    in_dtype = x.dtype
    x = x.astype(jnp.float32)

    if kernel.ndim == 1:
        # Separable path: a 1D kernel means the 2D filter is its outer
        # product, and the whole op factors into two independent 1D
        # upfirdn passes (per-axis up/pad/FIR/down all commute across
        # axes — the same split StyleGAN3's CUDA kernels use). k+k taps
        # per pixel instead of k*k.
        ky = kernel if flip_filter else kernel[::-1]
        y = _depthwise_fir(
            x, (ky * gain), axis=2, up=upy, down=downy, pad=(py0, py1)
        )
        y = _depthwise_fir(y, ky, axis=3, up=upx, down=downx, pad=(px0, px1))
        return y.astype(in_dtype)

    if not flip_filter:
        # lax conv computes correlation with a flipped kernel; the reference
        # default (flip_filter=False) is correlation with the raw kernel.
        kernel = kernel[::-1, ::-1]
    kh, kw = kernel.shape

    # gain semantics match the reference exactly: applied as given (callers
    # like filtered_lrelu pass up**2 themselves, upfirdn2d.py:146)
    kernel = (kernel * gain).astype(jnp.float32)

    # depthwise kernel: (kh, kw, 1, C) in HWIO
    dw_kernel = jnp.broadcast_to(kernel[:, :, None, None], (kh, kw, 1, c))

    # lhs_dilation inserts zeros BETWEEN samples only; the reference
    # (upfirdn2d.py:167-214) also appends up-1 trailing zeros per sample,
    # so the high-side padding absorbs them.
    y = jax.lax.conv_general_dilated(
        x,
        dw_kernel,
        window_strides=(downy, downx),
        padding=((py0, py1 + (upy - 1)), (px0, px1 + (upx - 1))),
        lhs_dilation=(upy, upx),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.astype(in_dtype)


def _depthwise_fir(x, kernel1d, axis: int, up: int, down: int, pad):
    """1D up/FIR/down along H (axis=2) or W (axis=3) of NCHW, depthwise.

    `kernel1d` must already be flipped for lax correlation semantics.
    """
    c = x.shape[1]
    k = kernel1d.shape[0]
    if axis == 2:
        dw = jnp.broadcast_to(kernel1d[:, None, None, None], (k, 1, 1, c))
        strides = (down, 1)
        padding = ((pad[0], pad[1] + (up - 1)), (0, 0))
        dilation = (up, 1)
    else:
        dw = jnp.broadcast_to(kernel1d[None, :, None, None], (1, k, 1, c))
        strides = (1, down)
        padding = ((0, 0), (pad[0], pad[1] + (up - 1)))
        dilation = (1, up)
    return jax.lax.conv_general_dilated(
        x,
        dw.astype(jnp.float32),
        window_strides=strides,
        padding=padding,
        lhs_dilation=dilation,
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def filter2d(x, kernel, gain: float = 1.0, flip_filter: bool = False):
    """Same-size FIR filtering (reference upfirdn2d.py:277-311)."""
    kernel = jnp.asarray(kernel)
    if kernel.ndim == 1:
        kernel = jnp.outer(kernel, kernel)
    kh, kw = kernel.shape
    pad = ((kw - 1) // 2, kw // 2, (kh - 1) // 2, kh // 2)
    return upfirdn2d(x, kernel, padding=pad, gain=gain, flip_filter=flip_filter)


def upsample2d(x, kernel, up: int = 2, gain: float = 1.0):
    """FIR upsample (reference upfirdn2d.py:313-351)."""
    kernel = jnp.asarray(kernel)
    if kernel.ndim == 1:
        kernel = jnp.outer(kernel, kernel)
    kh, kw = kernel.shape
    px = (kw + up - 1) // 2
    px1 = (kw - up) // 2
    py = (kh + up - 1) // 2
    py1 = (kh - up) // 2
    return upfirdn2d(
        x, kernel, up=up, padding=(px, px1, py, py1), gain=gain * up * up
    )


def downsample2d(x, kernel, down: int = 2, gain: float = 1.0):
    """FIR downsample (reference upfirdn2d.py:353-389)."""
    kernel = jnp.asarray(kernel)
    if kernel.ndim == 1:
        kernel = jnp.outer(kernel, kernel)
    kh, kw = kernel.shape
    px = (kw - down + 1) // 2
    px1 = (kw - down) // 2
    py = (kh - down + 1) // 2
    py1 = (kh - down) // 2
    return upfirdn2d(x, kernel, down=down, padding=(px, px1, py, py1), gain=gain)


# -- k-diffusion fixed-blur resamplers (monster diffusion) -----------------------


def fir_downsample_2x(x, kernel: str = "linear", pad_mode: str = "reflect"):
    """Reference monster_diffusion/base/layers.py:208-218: reflect-pad then
    stride-2 depthwise blur. NCHW."""
    taps = np.asarray(FIR_KERNELS[kernel], dtype=np.float32)
    pad = len(taps) // 2 - 1
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode=pad_mode)
    return upfirdn2d(x, jnp.asarray(np.outer(taps, taps)), down=2)


def fir_upsample_2x(x, kernel: str = "linear", pad_mode: str = "reflect"):
    """Reference monster_diffusion/base/layers.py:221-230: reflect-pad,
    zero-insert upsample, blur with the 2x-gain kernel. NCHW."""
    taps = np.asarray(FIR_KERNELS[kernel], dtype=np.float32) * 2
    k = len(taps)
    pad = k // 2 - 1
    x = jnp.pad(
        x, ((0, 0), (0, 0), ((pad + 1) // 2,) * 2, ((pad + 1) // 2,) * 2),
        mode=pad_mode,
    )
    # conv_transpose(stride 2, padding=pad*2+1) == reference upfirdn with
    # pad (k-1-P, k-1-P-(up-1)) per axis (the trailing up-1 zeros are part
    # of upfirdn's upsampling convention)
    conv_pad = k - 1 - (pad * 2 + 1)
    return upfirdn2d(
        x,
        jnp.asarray(np.outer(taps, taps)),
        up=2,
        padding=(conv_pad, conv_pad - 1, conv_pad, conv_pad - 1),
        flip_filter=True,  # torch conv_transpose2d correlates with flipped taps
    )
