"""Differentiable random cutouts for guidance ensembles, TPU-first.

The reference leaves cutouts to user scripts (the classic ``MakeCutouts``
module every CLIP-guidance notebook built on perceptor-style libraries
carries: per cutout, draw ``size ~ U(0,1)**cut_pow`` scaled into
[cut_size, min(H, W)], slice a random square, ``adaptive_avg_pool2d`` it to
``cut_size``, and concatenate). That pattern is hostile to XLA twice over:
the slice sizes are data-dependent shapes, and the pooling is a gather.

TPU-first design: an axis-aligned crop-resize is a *separable linear map*,
so each cutout is two dense matmuls with on-the-fly weight matrices —

    out[n, b, c, i, j] = sum_h sum_w Wy[n, i, h] * x[b, c, h, w] * Wx[n, j, w]

exactly the ``ops/resize.py`` formulation, except the weights are built
*inside* the traced program from the (traced) random boxes, so one compiled
program serves every draw. The triangle kernel is stretched by the
per-cutout scale (antialiased minification — the role avg-pooling plays in
the torch pattern), shapes are static, everything runs on the MXU, and the
adjoint back to the source image is just the transposed matmuls (exact
under ``jax.grad``, no custom VJP).

Randomness is an explicit PRNG key (jit-safe); the cutout axis is plain
batch data, so guidance ensembles shard over the mesh ``data`` axis
(docs/PARALLELISM.md) with zero extra code.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _axis_weights(starts, sizes, in_size: int, out_size: int):
    """Antialiased triangle-kernel interpolation weights for 1D crop-resize.

    starts/sizes: (n,) crop origin and extent in source pixels (float,
    traced). Returns (n, out_size, in_size) row-stochastic weights mapping
    source pixels to output pixels of the [start, start+size) window.
    """
    starts = jnp.asarray(starts, jnp.float32)
    sizes = jnp.asarray(sizes, jnp.float32)
    scale = sizes / out_size  # source pixels per output pixel, (n,)
    o = jnp.arange(out_size, dtype=jnp.float32) + 0.5  # output pixel centers
    centers = starts[:, None] + o[None, :] * scale[:, None] - 0.5  # (n, out)
    # antialias: stretch the triangle support by the scale when minifying
    # (same rule as ResizeRight / ops/resize.py), plain bilinear otherwise
    support = jnp.maximum(scale, 1.0)[:, None, None]  # (n, 1, 1)
    src = jnp.arange(in_size, dtype=jnp.float32)  # (in,)
    dist = (src[None, None, :] - centers[..., None]) / support  # (n, out, in)
    weights = jnp.maximum(0.0, 1.0 - jnp.abs(dist))
    # normalize: taps falling outside the image are renormalized away,
    # which reproduces the reference resize's boundary handling
    return weights / jnp.maximum(weights.sum(-1, keepdims=True), 1e-12)


@partial(jax.jit, static_argnums=(2,))
def crop_and_resize(images: jax.Array, boxes: jax.Array, out_size: int):
    """Antialiased differentiable crop-resize of normalized boxes.

    images: (B, C, H, W); boxes: (n, 4) normalized (y0, x0, y1, x1) in
    [0, 1] (each box is applied to every batch member). Returns
    (n * B, C, out_size, out_size), cut-major (cut0 over the batch, then
    cut1, ...) — the ``torch.cat`` order of the MakeCutouts pattern.

    Boxes are traced values: one compiled program serves every draw.
    Gradients flow to ``images`` exactly (transposed matmuls); ``boxes``
    gradients exist but are not the intended use.
    """
    if boxes.ndim != 2 or boxes.shape[-1] != 4:
        raise ValueError(f"boxes must be (n, 4), got {boxes.shape}")
    b, c, h, w = images.shape
    n = boxes.shape[0]
    y0, x0, y1, x1 = (boxes[:, i] for i in range(4))
    wy = _axis_weights(y0 * h, (y1 - y0) * h, h, out_size)
    wx = _axis_weights(x0 * w, (x1 - x0) * w, w, out_size)
    # two MXU contractions; HIGHEST so bf16-default TPUs keep image numerics
    rows = jnp.einsum(
        "nih,bchw->nbciw", wy, images, precision=jax.lax.Precision.HIGHEST
    )
    out = jnp.einsum(
        "njw,nbciw->nbcij", wx, rows, precision=jax.lax.Precision.HIGHEST
    )
    return out.reshape(n * b, c, out_size, out_size).astype(images.dtype)


def random_cutout_boxes(
    key: jax.Array,
    image_size,
    n_cutouts: int,
    cut_size: int = 224,
    cut_pow: float = 1.0,
):
    """Draw the MakeCutouts box distribution: square side
    ``U(0,1)**cut_pow`` scaled into [min(cut_size, S), S] with S =
    min(H, W), placed uniformly inside the image. Returns (n, 4)
    normalized (y0, x0, y1, x1). jit-safe (explicit key, static shapes).
    """
    h, w = image_size
    max_size = float(min(h, w))
    min_size = float(min(h, w, cut_size))
    ku, ky, kx = jax.random.split(key, 3)
    u = jax.random.uniform(ku, (n_cutouts,))
    sizes = u**cut_pow * (max_size - min_size) + min_size
    oy = jax.random.uniform(ky, (n_cutouts,)) * (h - sizes)
    ox = jax.random.uniform(kx, (n_cutouts,)) * (w - sizes)
    return jnp.stack(
        [oy / h, ox / w, (oy + sizes) / h, (ox + sizes) / w], axis=-1
    )


def random_cutouts(
    images: jax.Array,
    key: jax.Array,
    n_cutouts: int,
    cut_size: int = 224,
    cut_pow: float = 1.0,
):
    """Random guidance cutouts: (B, C, H, W) -> (n_cutouts * B, C,
    cut_size, cut_size), differentiable in ``images``.

    The standard use is a guidance ensemble: encode the cutouts with a
    CLIP-family loss and mean the distances — the cutout axis is data,
    so it shards over the mesh ``data`` axis for free.
    """
    boxes = random_cutout_boxes(
        key, images.shape[-2:], n_cutouts, cut_size=cut_size, cut_pow=cut_pow
    )
    return crop_and_resize(images, boxes, cut_size)
