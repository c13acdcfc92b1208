"""MidasDepth loss — depth-consistency guidance.

The reference README advertises `losses.MidasDepth` (README.md:64) but
the package never shipped it (no `perceptor/losses/midas_depth.py`
exists; only the model wrapper `perceptor/models/midas_depth/`). This
fills that documented gap, following the package's loss conventions
(builder methods + `forward(images) -> scalar`).

Semantics: scale/shift-invariant depth matching — MiDaS predictions are
affine-ambiguous (the models are trained with a scale/shift-invariant
loss), so both predicted and target depth maps are aligned per-image by
the standard MiDaS protocol (subtract the median, divide by the mean
absolute deviation) before an MSE. Targets can come from images (depth
estimated once, gradient-free) or be supplied directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from perceptor_tpu.losses.interface import LossInterface
from perceptor_tpu.models.midas_depth import MidasDepth as MidasDepthModel


def align_depths(depths: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Per-image median/MAD alignment (the MiDaS SSI normalization).

    depths: (N, 1, H, W) -> same shape, median 0 / mean-abs-dev 1 per
    image, making the comparison invariant to the affine ambiguity of
    monocular depth predictions.
    """
    flat = depths.reshape(depths.shape[0], -1)
    median = jnp.median(flat, axis=1, keepdims=True)
    dev = jnp.mean(jnp.abs(flat - median), axis=1, keepdims=True)
    aligned = (flat - median) / jnp.maximum(dev, eps)
    return aligned.reshape(depths.shape)


class MidasDepth(LossInterface):
    def __init__(self, name: str = "dpt_large"):
        self.model = MidasDepthModel(name)
        self.target_depths = None

    def add_images_(self, images) -> "MidasDepth":
        """Estimate depth of `images` once (no gradient) and use it as
        the target."""
        depths = jax.lax.stop_gradient(self.model(images))
        return self.add_depths_(depths)

    def add_depths_(self, depths) -> "MidasDepth":
        """Use `depths` (N, 1, H, W) as the target; any affine scale and
        shift per image is ignored (see `align_depths`)."""
        self.target_depths = jax.lax.stop_gradient(
            align_depths(jnp.asarray(depths))
        )
        return self

    def forward(self, images) -> jnp.ndarray:
        """Mean squared error between aligned predicted and target depth."""
        if self.target_depths is None:
            raise ValueError(
                "MidasDepth loss has no target; call add_images_ or add_depths_"
            )
        depths = align_depths(self.model.forward_fn(self.model.params, images))
        if depths.shape[-2:] != self.target_depths.shape[-2:]:
            raise ValueError(
                f"target depth {self.target_depths.shape} does not match "
                f"predicted {depths.shape}; targets must be built at the "
                "model's native resolution"
            )
        return jnp.mean(jnp.square(depths - self.target_depths.astype(depths.dtype)))
