"""CLIP text encoder for SD conditioning — full hidden-state sequence.

Functional spec: reference perceptor/models/stable_diffusion/stable_diffusion.py:295-323
runs HF CLIPTokenizer + CLIPTextModel (ViT-L/14 text tower) and conditions
the UNet on `last_hidden_state` (the (N, 77, 768) sequence after the final
LayerNorm — NOT the pooled/projected embedding the CLIP loss uses).

Reuses the pre-LN transformer from models/clip/model.py (same tower, same
weights; convert.py maps the HF text_model state_dict onto it).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from perceptor_tpu.models.clip.model import Transformer
from perceptor_tpu.models.stable_diffusion.config import TextConfig
from perceptor_tpu.ops.attention import causal_mask


class CLIPTextEncoder(nn.Module):
    config: TextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        """tokens (N, S) int32 -> hidden states (N, S, width) fp32."""
        cfg = self.config
        token_embedding = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.width),
        )
        positional = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width),
        )
        x = token_embedding[tokens].astype(self.dtype)
        x = x + positional[: tokens.shape[1]].astype(self.dtype)
        x = Transformer(
            cfg.width,
            cfg.layers,
            cfg.heads,
            quick=True,  # SD v1.x text tower is the openai quick-gelu CLIP
            dtype=self.dtype,
            name="transformer",
        )(x, causal_mask(tokens.shape[1]))
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x)
        return x.astype(jnp.float32)
