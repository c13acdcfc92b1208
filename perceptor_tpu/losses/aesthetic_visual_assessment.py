"""AVA aesthetic loss: CLIP ViT-B-16 + 10-way linear head.

Rebuild of reference perceptor/losses/aesthetic_visual_assessment.py:10-51
with the three loss modes (logit / expected / probability).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from perceptor_tpu import models
from perceptor_tpu.losses.interface import LossInterface
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict


class AestheticVisualAssessment(LossInterface):
    def __init__(self, aesthetic_target: int = 10, mode: str = "expected"):
        if mode not in ("logit", "expected", "probability"):
            raise ValueError(f"Unknown mode: {mode}")
        self.aesthetic_target = aesthetic_target
        self.mode = mode
        self.model = models.CLIP("ViT-B-16")
        path = find_checkpoint("ava_vit_b_16", "ava_vit_b_16_full")
        if path is not None:
            from perceptor_tpu.models.clip.convert import _np

            state = load_state_dict(path)
            self.weight = jnp.asarray(_np(state["weight"]).T)
            self.bias = jnp.asarray(_np(state["bias"]))
        else:
            rng = np.random.default_rng(0)
            dim = self.model.config.embed_dim
            self.weight = jnp.asarray(
                rng.normal(0, dim**-0.5, (dim, 10)).astype(np.float32)
            )
            self.bias = jnp.zeros((10,))

    def forward(self, images):
        encodings = self.model.encode_images(images, normalize=False)
        log_probs = encodings @ self.weight + self.bias
        if self.mode == "logit":
            return -log_probs[..., self.aesthetic_target - 1].mean() * 0.01
        if self.mode == "expected":
            expected = jax.nn.softmax(log_probs, axis=-1) * jnp.arange(1, 11)
            return jnp.square(expected - self.aesthetic_target).mean() * 0.01
        return -jax.nn.softmax(log_probs, axis=-1)[
            ..., self.aesthetic_target - 1
        ].mean()
