"""The canonical prompt-bank loss pattern.

The reference repeats this 8x across encoder losses (SURVEY §2.6; e.g.
reference perceptor/losses/clip/clip.py:44-99): mutable builder methods
`add_texts_/add_images_/add_encodings_` concatenate L2-normalized target
encodings + weights, then `forward(images)` computes the weighted mean of
squared spherical distances between image encodings and the bank.

Builders run on the host (they encode prompts eagerly — fine, encoders are
frozen); `forward` is pure and jit-safe: the bank is a constant pytree by
the time the guidance step traces.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from perceptor_tpu.losses.interface import LossInterface


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def spherical_distance_squared(encodings_a, encodings_b) -> jax.Array:
    """Pairwise (arcsin(|a-b|/2))^2 * 2 (reference losses/clip/clip.py:91-99)."""
    diff_norm = jnp.linalg.norm(encodings_a[:, None] - encodings_b[None, :], axis=2)
    return jnp.square(jnp.arcsin(jnp.clip(diff_norm / 2, 0.0, 1.0))) * 2


class PromptBankLoss(LossInterface):
    """Base for encoder losses with text/image prompt banks.

    Subclasses provide a `model` with `encode_texts` and `encode_images`.
    """

    def __init__(self, model, multiplier: float = 1.0):
        self.model = model
        self.encodings: Optional[jax.Array] = None
        self.bank_weights: Optional[jax.Array] = None
        self.multiplier = multiplier

    def mul_(self, multiplier: float):
        self.multiplier *= multiplier
        return self

    def add_texts_(self, texts: Sequence[str], weights=None):
        return self.add_encodings_(self.model.encode_texts(texts), weights)

    def add_images_(self, images, weights=None):
        return self.add_encodings_(self.model.encode_images(images), weights)

    def add_encodings_(self, encodings, weights=None):
        encodings = jnp.asarray(encodings)
        if encodings.ndim == 1:
            encodings = encodings[None]
        if isinstance(weights, (list, tuple)):
            weights = jnp.asarray(weights, dtype=jnp.float32)
        elif weights is None:
            weights = jnp.ones((encodings.shape[0],), dtype=jnp.float32)
        else:
            weights = jnp.broadcast_to(
                jnp.asarray(weights, dtype=jnp.float32), (encodings.shape[0],)
            )
        normalized = _l2_normalize(encodings)
        if self.encodings is None:
            self.encodings = normalized
            self.bank_weights = weights
        else:
            self.encodings = jnp.concatenate([self.encodings, normalized])
            self.bank_weights = jnp.concatenate([self.bank_weights, weights])
        return self

    def image_encodings(self, images) -> jax.Array:
        return self.model.encode_images(images)

    def forward(self, images) -> jax.Array:
        if self.encodings is None:
            raise ValueError(
                "empty prompt bank: call add_texts_/add_images_/add_encodings_ first"
            )
        image_encodings = self.image_encodings(images)
        distances = spherical_distance_squared(image_encodings, self.encodings)
        return jnp.mean(distances * self.bank_weights) * self.multiplier

    # -- pure path (engine): params threaded as jit args, never closed
    # over, so an outer jit doesn't bake the tower weights as constants --

    @property
    def loss_params(self):
        """Pytree of everything `apply` reads: tower weights + the bank.

        The multiplier rides here (as a traced scalar) rather than being
        read off `self` at trace time, so `mul_()` between calls takes
        effect even when the caller memoizes the compiled program
        (engine.guided_sample does)."""
        return {
            "model": getattr(self.model, "params", None),
            "encodings": self.encodings,
            "weights": self.bank_weights,
            "multiplier": jnp.float32(self.multiplier),
        }

    def apply(self, loss_params, images) -> jax.Array:
        """Pure loss: like `forward` but reading state from `loss_params`."""
        encode = getattr(self.model, "encode_images_fn", None)
        if encode is not None and loss_params["model"] is not None:
            # encode_images_fn returns pre-normalization encodings
            image_encodings = _l2_normalize(encode(loss_params["model"], images))
        else:
            image_encodings = self.image_encodings(images)
        distances = spherical_distance_squared(
            image_encodings, loss_params["encodings"]
        )
        return jnp.mean(distances * loss_params["weights"]) * loss_params["multiplier"]
