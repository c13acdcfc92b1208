"""OWL-ViT detection loss (reference perceptor/losses/owlvit.py:9-89):
object-count-aware -log_softmax over the top-k patch logits per label."""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from perceptor_tpu.losses.interface import LossInterface
from perceptor_tpu.models.owlvit import OWLViT as OWLViTModel, OWLViTEncodings


class OWLViT(LossInterface):
    def __init__(self, **kwargs):
        self.model = OWLViTModel(**kwargs)
        self.encodings = None
        self.weights = None

    def add_texts_(self, texts: List[str], weights=None):
        return self.add_encodings_(self.model.encode_texts([texts]), weights)

    def add_images_(self, images, weights=None):
        raise NotImplementedError()

    def add_encodings_(self, encodings: OWLViTEncodings, weights=None):
        if self.encodings is not None:
            raise ValueError("OWLViT can only have one set of encodings")
        n_labels = encodings.tokens.shape[0]
        if weights is None:
            weights = jnp.ones((n_labels,))
        else:
            weights = jnp.asarray(weights, dtype=jnp.float32)
        self.encodings = encodings
        self.weights = weights
        return self

    def forward(self, images, top_k: int = 5):
        """(reference :64-79)."""
        if self.encodings is None:
            raise ValueError("call add_texts_ first")
        predictions = self.model(images, self.encodings)
        log_probs = jax.nn.log_softmax(
            predictions.logits.reshape(images.shape[0], -1, self.weights.shape[0]),
            axis=1,
        )
        top = jnp.sort(log_probs, axis=1)[:, -top_k:]  # (N, k, labels)
        per_label = top.mean(axis=(0, 1))
        return -(per_label * self.weights).sum() * 0.01
