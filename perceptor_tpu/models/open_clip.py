"""OpenCLIP wrapper: uniform text/image encoder API.

Rebuild of reference perceptor/models/open_clip.py:12-140:
  - `encode_images(images)`: differentiable resize to the tower's native
    resolution (reference :110-123) + CLIP-normalize + vision tower,
    L2-normalized output.
  - `encode_texts(texts)`: BPE tokenize + text tower, L2-normalized.
  - `spherical_distance(a, b)`: pairwise (2*arcsin(|a-b|/2))^2 style
    distance (reference :125-137).

TPU-first: the tower runs in bf16 on the MXU (the analogue of the
reference's fp16-on-cuda policy, :56-63); encode_images is pure and
jit-safe so it can live inside a fused guidance step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from perceptor_tpu import utils
from perceptor_tpu.models.clip import configs as clip_configs
from perceptor_tpu.models.clip import convert as clip_convert
from perceptor_tpu.models.clip.model import CLIP as CLIPModule
from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer, tokenize
from perceptor_tpu.ops.resize import resize
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


@utils.cache
class OpenCLIP:
    def __init__(
        self,
        architecture: str = "ViT-H-14",
        weights: str = "laion2b_s32b_b79k",
        precision: Optional[str] = None,
        config: Optional["clip_configs.CLIPConfig"] = None,
        checkpoint_path: Optional[str] = None,
        tokenizer: Optional[SimpleTokenizer] = None,
    ):
        """Args mirror the reference wrapper (open_clip.py:13-45); weights are
        resolved from the local checkpoint cache (zero-egress environment)."""
        self.architecture = architecture
        self.weights = weights
        self.config = config or clip_configs.get_config(architecture, weights)
        dtype = jnp.bfloat16 if precision in (None, "fp16", "bf16") else jnp.float32
        self.module = CLIPModule(self.config, dtype=dtype)
        self._tokenizer = tokenizer

        path = checkpoint_path or find_checkpoint(
            f"open_clip_{architecture}_{weights}",
            f"{architecture}-{weights}",
        )
        if path is not None:
            from perceptor_tpu.utils.checkpoints import native_params

            state_dict = load_state_dict(path)
            native = native_params(state_dict)
            if native is not None:
                params = native
            elif any(k.startswith("vision_model.") for k in state_dict):
                params = clip_convert.from_hf(state_dict, self.config)
            else:
                params = clip_convert.from_openclip(state_dict, self.config)
            self.params = jax.tree.map(jnp.asarray, params)
        else:
            # Deterministic random init: keeps the full pipeline runnable
            # (and benchmarkable) without weight files.
            from perceptor_tpu.core.init import init_on_cpu

            self.params = init_on_cpu(
                self.module.init,
                jax.random.PRNGKey(0),
                jnp.zeros((1, 3, *self.config.image_size), jnp.float32),
                jnp.zeros((1, self.config.context_length), jnp.int32),
            )["params"]

        self._encode_image = jax.jit(
            lambda params, images: self.module.apply(
                {"params": params}, images, method=CLIPModule.encode_image
            )
        )
        self._encode_text = jax.jit(
            lambda params, tokens: self.module.apply(
                {"params": params}, tokens, method=CLIPModule.encode_text
            )
        )

    @property
    def tokenizer(self) -> SimpleTokenizer:
        if self._tokenizer is None:
            self._tokenizer = SimpleTokenizer()
        return self._tokenizer

    @property
    def image_size(self):
        return self.config.image_size

    def encode_texts(self, text_prompts, normalize: bool = True) -> jax.Array:
        tokens = tokenize(
            text_prompts, self.config.context_length, tokenizer=self.tokenizer
        )
        encodings = self._encode_text(self.params, jnp.asarray(tokens))
        if normalize:
            return _l2_normalize(encodings)
        return encodings

    def encode_tokens(self, tokens, normalize: bool = True) -> jax.Array:
        encodings = self.module.apply(
            {"params": self.params}, tokens, method=CLIPModule.encode_text
        )
        if normalize:
            return _l2_normalize(encodings)
        return encodings

    def encode_images(self, images, normalize: bool = True) -> jax.Array:
        """Differentiable: resize -> normalize -> tower. (N,C,H,W) in [0,1]."""
        encodings = self.encode_images_fn(self.params, images)
        if normalize:
            return _l2_normalize(encodings)
        return encodings

    def encode_images_fn(self, params, images) -> jax.Array:
        """Pure-function form for use inside fused jitted guidance steps."""
        if images.shape[-2:] != tuple(self.config.image_size):
            images = resize(images, out_shape=self.config.image_size)
        mean = CLIP_MEAN.reshape(1, 3, 1, 1)
        std = CLIP_STD.reshape(1, 3, 1, 1)
        images = (images - mean) / std
        return self.module.apply(
            {"params": params}, images, method=CLIPModule.encode_image
        )

    @staticmethod
    def spherical_distance(encodings_a, encodings_b) -> jax.Array:
        """Pairwise squared spherical distance (reference open_clip.py:125-137)."""
        diff_norm = jnp.linalg.norm(
            encodings_a[:, None] - encodings_b[None, :], axis=2
        )
        return jnp.square(jnp.arcsin(diff_norm / 2)) * 2


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)
