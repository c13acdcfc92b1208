"""NCHW [0,1] array -> PIL image (batch stacked vertically).

Mirrors reference perceptor/utils/pil_image.py:6-18.
"""

from __future__ import annotations

import warnings

import numpy as np


def pil_image(images):
    """Convert an (N, C, H, W) array in [0, 1] to a single PIL image.

    Batch items are stacked vertically, matching the reference behavior.
    """
    from PIL import Image

    images = np.asarray(images, dtype=np.float32)
    if images.ndim != 4:
        raise ValueError(f"expected NCHW, got shape {images.shape}")
    if images.max() > 1 or images.min() < 0:
        warnings.warn("images are not in range [0, 1]")
    n, c, h, w = images.shape
    stacked = images.transpose(0, 2, 3, 1).reshape(n * h, w, c)
    stacked = np.clip(stacked, 0.0, 1.0)
    array = (stacked * 255).round().astype(np.uint8)
    if c == 1:
        return Image.fromarray(array[..., 0], mode="L")
    return Image.fromarray(array)
