"""Simulacra aesthetic loss (reference perceptor/losses/simulacra_aesthetic.py:8-41)."""

from __future__ import annotations

import jax.numpy as jnp

from perceptor_tpu.losses.interface import LossInterface
from perceptor_tpu.models.simulacra_aesthetic import SimulacraAesthetic as Model


class SimulacraAesthetic(LossInterface):
    def __init__(self, model_name: str = "ViT-L-14", aesthetic_target: float = 10):
        self.aesthetic_target = float(aesthetic_target)
        self.model = Model(model_name)
        # per-model multiplier (reference :32-35)
        self.multiplier = 1e-5 if model_name in ("ViT-L-14", "ViT-L-14-336") else 1e-3

    def forward(self, images):
        predicted = self.model(images)
        return self.multiplier * jnp.square(
            predicted - self.aesthetic_target
        ).mean()
