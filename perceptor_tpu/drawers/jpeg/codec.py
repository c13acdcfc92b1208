"""Differentiable JPEG codec (DiffJPEG lineage) in pure jnp.

Functional spec: reference perceptor/drawers/jpeg/compression.py:9-187 and
decompression.py:9-189 — RGB<->YCbCr, 2x chroma subsampling, 8x8 block
DCT/iDCT (precomputed cosine tensors), quantization against the standard
luma/chroma tables with the pseudo-differentiable rounding
round(x) + (x - round(x))^3 (jpeg/utils.py).

TPU notes: the DCT is an einsum against an (8,8,8,8) constant — XLA lowers
it to a single MXU matmul per block batch; everything is jit/grad-safe.
"""

from __future__ import annotations

import itertools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Y_TABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float32,
).T

C_TABLE = np.full((8, 8), 99, dtype=np.float32)
C_TABLE[:4, :4] = np.array(
    [[17, 18, 24, 47], [18, 21, 26, 66], [24, 26, 56, 99], [47, 66, 99, 99]],
    dtype=np.float32,
).T

_RGB2YCBCR = np.array(
    [[0.299, 0.587, 0.114], [-0.168736, -0.331264, 0.5], [0.5, -0.418688, -0.081312]],
    dtype=np.float32,
).T
_YCBCR2RGB = np.array(
    [[1.0, 0.0, 1.402], [1.0, -0.344136, -0.714136], [1.0, 1.772, 0.0]],
    dtype=np.float32,
).T


def _dct_tensor() -> Tuple[np.ndarray, np.ndarray]:
    tensor = np.zeros((8, 8, 8, 8), dtype=np.float32)
    for x, y, u, v in itertools.product(range(8), repeat=4):
        tensor[x, y, u, v] = np.cos((2 * x + 1) * u * np.pi / 16) * np.cos(
            (2 * y + 1) * v * np.pi / 16
        )
    alpha = np.array([1.0 / np.sqrt(2)] + [1.0] * 7)
    return tensor, np.outer(alpha, alpha).astype(np.float32)


_DCT_TENSOR, _DCT_ALPHA = _dct_tensor()


def _idct_tensor() -> np.ndarray:
    tensor = np.zeros((8, 8, 8, 8), dtype=np.float32)
    for x, y, u, v in itertools.product(range(8), repeat=4):
        tensor[x, y, u, v] = np.cos((2 * u + 1) * x * np.pi / 16) * np.cos(
            (2 * v + 1) * y * np.pi / 16
        )
    return tensor


_IDCT_TENSOR = _idct_tensor()


def diff_round(x):
    """round(x) + (x - round(x))^3 (reference jpeg/utils.py:36-43)."""
    rounded = jnp.round(x)
    return rounded + (x - rounded) ** 3


def quality_to_factor(quality: float) -> float:
    """(reference jpeg/utils.py:46-57)."""
    if quality < 50:
        quality = 5000.0 / quality
    else:
        quality = 200.0 - quality * 2
    return quality / 100.0


def _block_split(channel):
    """(N, H, W) -> (N, H*W/64, 8, 8)."""
    n, h, w = channel.shape
    blocks = channel.reshape(n, h // 8, 8, w // 8, 8)
    return blocks.transpose(0, 1, 3, 2, 4).reshape(n, -1, 8, 8)


def _block_merge(blocks, height, width):
    n = blocks.shape[0]
    image = blocks.reshape(n, height // 8, width // 8, 8, 8)
    return image.transpose(0, 1, 3, 2, 4).reshape(n, height, width)


def _dct(blocks):
    blocks = blocks - 128.0
    return _DCT_ALPHA * 0.25 * jnp.tensordot(blocks, jnp.asarray(_DCT_TENSOR), axes=2)


def _idct(blocks):
    blocks = blocks * jnp.asarray(_DCT_ALPHA)
    return 0.25 * jnp.tensordot(blocks, jnp.asarray(_IDCT_TENSOR), axes=2) + 128.0


def compress_jpeg(images, factor: float = 1.0, rounding=diff_round):
    """(N, 3, H, W) in [0,1] -> (y, cb, cr) quantized DCT blocks
    (reference compression.py:159-187)."""
    x = images.transpose(0, 2, 3, 1) * 255.0
    ycbcr = x @ jnp.asarray(_RGB2YCBCR) + jnp.asarray([0.0, 128.0, 128.0])
    y = ycbcr[..., 0]
    # 2x2 mean chroma subsampling
    n, h, w, _ = ycbcr.shape
    chroma = ycbcr[..., 1:].reshape(n, h // 2, 2, w // 2, 2, 2).mean(axis=(2, 4))
    cb, cr = chroma[..., 0], chroma[..., 1]

    out = []
    for channel, table in ((y, Y_TABLE), (cb, C_TABLE), (cr, C_TABLE)):
        coeffs = _dct(_block_split(channel))
        out.append(rounding(coeffs / (jnp.asarray(table) * factor)))
    return tuple(out)


def decompress_jpeg(y, cb, cr, height: int, width: int, factor: float = 1.0):
    """(y, cb, cr) blocks -> (N, 3, H, W) in [0,1]
    (reference decompression.py:150-189)."""
    channels = []
    for blocks, table, (h, w) in (
        (y, Y_TABLE, (height, width)),
        (cb, C_TABLE, (height // 2, width // 2)),
        (cr, C_TABLE, (height // 2, width // 2)),
    ):
        dequantized = blocks * (jnp.asarray(table) * factor)
        channels.append(_block_merge(_idct(dequantized), h, w))
    y_full, cb_small, cr_small = channels
    cb_full = jnp.repeat(jnp.repeat(cb_small, 2, axis=1), 2, axis=2)
    cr_full = jnp.repeat(jnp.repeat(cr_small, 2, axis=1), 2, axis=2)
    ycbcr = jnp.stack([y_full, cb_full, cr_full], axis=-1)
    rgb = (ycbcr + jnp.asarray([0.0, -128.0, -128.0])) @ jnp.asarray(_YCBCR2RGB)
    rgb = jnp.clip(rgb, 0.0, 255.0) / 255.0
    return rgb.transpose(0, 3, 1, 2)
