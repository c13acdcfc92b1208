"""Simulacra aesthetic model: linear probe on CLIP image embeddings.

Rebuild of reference perceptor/models/simulacra_aesthetic/simulacra_aesthetic.py:26-65:
rating = Linear(normalize(clip_image_embedding) * sqrt(dim)).

The reference downloads the probe `.pth` per CLIP backbone (its
CHECKPOINT_URLS table, simulacra_aesthetic.py:12-22) and ships six of
them in-repo under models/simulacra_aesthetic/weights/. Resolution here:
the standard cache dirs under `simulacra_{model_name}`, then an optional
distribution directory (``PERCEPTOR_TPU_SIMULACRA_DIR``) using the
reference's own file naming, so a checkout of the reference weights dir
serves directly.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from perceptor_tpu import models, utils
from perceptor_tpu.utils.checkpoints import (
    find_checkpoint,
    load_state_dict,
    native_params,
)

MODEL_NAMES = (
    "ViT-B-32", "ViT-B-16", "ViT-L-14", "RN50", "RN101", "RN50x4",
    "RN50x16", "RN50x64", "ViT-L-14-336",
)

# reference file naming (simulacra_aesthetic.py:16-22): {name}.pth except
# the 336px ViT which carries a "px" suffix on disk.
_DIST_FILENAMES = {"ViT-L-14-336": "ViT-L-14-336px"}


def distribution_path(model_name: str) -> str:
    """Probe filename inside a reference-layout weights directory."""
    weights_dir = os.environ.get("PERCEPTOR_TPU_SIMULACRA_DIR", "")
    if not weights_dir:
        return ""
    filename = _DIST_FILENAMES.get(model_name, model_name) + ".pth"
    return os.path.join(weights_dir, filename)


@utils.cache
class SimulacraAesthetic:
    def __init__(self, model_name: str = "ViT-B-32"):
        self.clip_model = models.CLIP(model_name)
        embed_dim = self.clip_model.config.embed_dim
        path = find_checkpoint(
            f"simulacra_{model_name}", distribution_path(model_name)
        )
        if path is not None:
            from perceptor_tpu.models.clip.convert import _np

            state = load_state_dict(path)
            native = native_params(state)
            if native is not None:  # pre-converted artifact (convert CLI)
                self.weight = jnp.asarray(native["linear"]["weight"])
                self.bias = jnp.asarray(native["linear"]["bias"])
            else:  # torch layout: linear.weight (1, D), linear.bias (1,)
                self.weight = jnp.asarray(_np(state["linear.weight"]).T)
                self.bias = jnp.asarray(_np(state["linear.bias"]))
            if self.weight.shape != (embed_dim, 1):
                raise ValueError(
                    f"simulacra probe for {model_name} has weight shape "
                    f"{self.weight.shape}, expected ({embed_dim}, 1)"
                )
        else:
            rng = np.random.default_rng(0)
            self.weight = jnp.asarray(
                rng.normal(0, embed_dim**-0.5, (embed_dim, 1)).astype(np.float32)
            )
            self.bias = jnp.zeros((1,))

    @property
    def params(self):
        """The probe's native param tree (convert-CLI artifact layout)."""
        return {
            "linear": {
                "weight": np.asarray(self.weight),
                "bias": np.asarray(self.bias),
            }
        }

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
