"""Memorability loss (reference perceptor/losses/memorability.py:7-24).

torchvision-transform semantics reproduced differentiably:
``Resize(256)`` scales the SHORT side to 256 preserving aspect ratio,
``CenterCrop(227)`` takes the middle 227x227 window, then the frozen
ResMem scorer (models/resmem.py) runs and the loss is
``prediction.mean() * 0.05`` -- maximizing memorability needs a negative
weight, exactly like the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from perceptor_tpu.losses.interface import LossInterface
from perceptor_tpu.models.resmem import ResMem
from perceptor_tpu.ops.resize import resize


def _recenter(images, short_side: int, crop: int):
    """Differentiable Resize(short_side) + CenterCrop(crop), NCHW."""
    h, w = images.shape[-2:]
    scale = short_side / min(h, w)
    out_h, out_w = max(round(h * scale), crop), max(round(w * scale), crop)
    images = resize(images, out_shape=(out_h, out_w))
    top = (out_h - crop) // 2
    left = (out_w - crop) // 2
    return images[..., top : top + crop, left : left + crop]


class Memorability(LossInterface):
    def __init__(self, name: str = "resmem"):
        self.model = ResMem(name)
        # reference recenter: Resize(256) + CenterCrop(227); the tiny test
        # variant scales both correspondingly
        self.short_side = 256 if name == "resmem" else self.model.crop_size + 5

    def forward(self, images) -> jax.Array:
        recentered = _recenter(images, self.short_side, self.model.crop_size)
        prediction = self.model.predict(recentered)
        return jnp.mean(prediction) * 0.05

    # -- pure path (engine) --

    @property
    def loss_params(self):
        return {"model": self.model.params}

    def apply(self, loss_params, images) -> jax.Array:
        recentered = _recenter(images, self.short_side, self.model.crop_size)
        prediction = self.model.predict_fn(loss_params["model"], recentered)
        return jnp.mean(prediction) * 0.05
