"""Simulacra aesthetic model: linear probe on CLIP image embeddings.

Rebuild of reference perceptor/models/simulacra_aesthetic/simulacra_aesthetic.py:26-65:
rating = Linear(normalize(clip_image_embedding) * sqrt(dim)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from perceptor_tpu import models, utils
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict

MODEL_NAMES = (
    "ViT-B-32", "ViT-B-16", "ViT-L-14", "RN50", "RN101", "RN50x4",
    "RN50x16", "RN50x64", "ViT-L-14-336",
)


@utils.cache
class SimulacraAesthetic:
    def __init__(self, model_name: str = "ViT-B-32"):
        self.clip_model = models.CLIP(model_name)
        embed_dim = self.clip_model.config.embed_dim
        path = find_checkpoint(f"simulacra_{model_name}")
        if path is not None:
            from perceptor_tpu.models.clip.convert import _np

            state = load_state_dict(path)
            self.weight = jnp.asarray(_np(state["linear.weight"]).T)  # (D, 1)
            self.bias = jnp.asarray(_np(state["linear.bias"]))
        else:
            rng = np.random.default_rng(0)
            self.weight = jnp.asarray(
                rng.normal(0, embed_dim**-0.5, (embed_dim, 1)).astype(np.float32)
            )
            self.bias = jnp.zeros((1,))

    def rating_fn(self, clip_params, images):
        encodings = self.clip_model.encode_images_fn(clip_params, images)
        encodings = encodings / jnp.maximum(
            jnp.linalg.norm(encodings, axis=-1, keepdims=True), 1e-12
        )
        scaled = encodings * jnp.sqrt(encodings.shape[-1] * 1.0)
        return scaled @ self.weight + self.bias

    def __call__(self, images):
        return self.rating_fn(self.clip_model.params, images)

    forward = __call__
