"""CLIP guidance loss (reference perceptor/losses/clip/clip.py:10-99)."""

from __future__ import annotations

import json
import os

import jax.numpy as jnp

from perceptor_tpu import models
from perceptor_tpu.losses.prompt_bank import PromptBankLoss

_TEXTOFF_PATH = os.path.join(os.path.dirname(__file__), "vectors", "textoff.json")


class CLIP(PromptBankLoss):
    def __init__(self, name="ViT-B-32", precision=None, jit=False, **kwargs):
        """
        Args:
            name: CLIP model name (ViT-B-32, ViT-B-16, ViT-L-14, ViT-L-14-336, ...)
        """
        # per-model multiplier, reference losses/clip/clip.py:31-34
        multiplier = 0.01 if name in ("ViT-L-14", "ViT-L-14-336") else 1.0
        super().__init__(
            models.CLIP(name, precision=precision, jit=jit, **kwargs),
            multiplier=multiplier,
        )
        self.name = name

    def add_text_off_(self, weight=None):
        """Precomputed per-arch "textoff" embedding (reference :50-58)."""
        if not os.path.exists(_TEXTOFF_PATH):
            raise ValueError(
                f"textoff vectors not available (expected {_TEXTOFF_PATH})"
            )
        textoff_json = json.loads(open(_TEXTOFF_PATH).read())
        if self.name not in textoff_json:
            raise ValueError(f"There is no textoff for this model: {self.name}")
        return self.add_encodings_(
            jnp.asarray(textoff_json[self.name], dtype=jnp.float32), weight
        )
