"""CLIP vision + text towers (flax.linen), weights-compatible with
open_clip and HF `transformers` CLIP checkpoints via models/clip/convert.py.

Functional spec: the towers wrapped by reference
perceptor/models/open_clip.py:12-140 and
perceptor/models/transformers_openai_clip.py:25 (same computation, two
weight layouts). Pre-LN transformer, class-token ViT with convolutional
patch embedding, causal text transformer pooled at the EOT token.

TPU notes: attention uses perceptor_tpu.ops.attention (head_dim 64/80 —
lane-aligned); all matmuls run in the policy compute dtype (bf16) with
LayerNorm/softmax in fp32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from perceptor_tpu.models.clip.configs import CLIPConfig
from perceptor_tpu.ops.attention import attention, causal_mask


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class MLP(nn.Module):
    width: int
    quick: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="fc1")(x)
        h = quick_gelu(h) if self.quick else jax.nn.gelu(h, approximate=False)
        return nn.Dense(self.width, dtype=self.dtype, name="fc2")(h)


class MultiHeadAttention(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        b, s, _ = x.shape
        head_dim = self.width // self.heads

        def split(name):
            h = nn.Dense(self.width, dtype=self.dtype, name=name)(x)
            return h.reshape(b, s, self.heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split("q_proj"), split("k_proj"), split("v_proj")
        out = attention(q, k, v, mask=mask)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, self.width)
        return nn.Dense(self.width, dtype=self.dtype, name="out_proj")(out)


class ResidualBlock(nn.Module):
    width: int
    heads: int
    quick: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x)
        x = x + MultiHeadAttention(
            self.width, self.heads, dtype=self.dtype, name="attn"
        )(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x)
        x = x + MLP(self.width, self.quick, dtype=self.dtype, name="mlp")(h)
        return x


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    quick: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        for i in range(self.layers):
            x = ResidualBlock(
                self.width, self.heads, self.quick, dtype=self.dtype, name=f"resblocks_{i}"
            )(x, mask)
        return x


class VisionTransformer(nn.Module):
    config: CLIPConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        """images: (N, C, H, W) already resized + normalized."""
        cfg = self.config
        x = images.astype(self.dtype)
        # conv patch embed, stride=kernel=patch, no bias (open_clip conv1);
        # einsum form so the input-VJP stays on the MXU (models/patch_embed.py)
        from perceptor_tpu.models.patch_embed import PatchEmbed

        x = PatchEmbed(
            cfg.vision_width,
            cfg.patch_size,
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x.transpose(0, 2, 3, 1))
        n, gh, gw, w = x.shape
        x = x.reshape(n, gh * gw, w)

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.vision_width,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(class_embedding, (n, 1, w)).astype(self.dtype), x],
            axis=1,
        )
        positional = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (gh * gw + 1, cfg.vision_width),
        )
        x = x + positional.astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(x)
        x = Transformer(
            cfg.vision_width,
            cfg.vision_layers,
            cfg.vision_heads,
            cfg.quick_gelu,
            dtype=self.dtype,
            name="transformer",
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(x[:, 0])
        proj = self.param(
            "proj",
            nn.initializers.normal(cfg.vision_width**-0.5),
            (cfg.vision_width, cfg.embed_dim),
        )
        return (x.astype(self.dtype) @ proj.astype(self.dtype)).astype(jnp.float32)


class TextTransformer(nn.Module):
    config: CLIPConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        """tokens: (N, context_length) int32. Pools at argmax token (EOT)."""
        cfg = self.config
        token_embedding = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.text_width),
        )
        positional = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.context_length, cfg.text_width),
        )
        x = token_embedding[tokens].astype(self.dtype)
        x = x + positional[: tokens.shape[1]].astype(self.dtype)
        mask = causal_mask(tokens.shape[1])
        x = Transformer(
            cfg.text_width,
            cfg.text_layers,
            cfg.text_heads,
            cfg.quick_gelu,
            dtype=self.dtype,
            name="transformer",
        )(x, mask)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        text_projection = self.param(
            "text_projection",
            nn.initializers.normal(cfg.text_width**-0.5),
            (cfg.text_width, cfg.embed_dim),
        )
        return (
            pooled.astype(self.dtype) @ text_projection.astype(self.dtype)
        ).astype(jnp.float32)


class CLIP(nn.Module):
    config: CLIPConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.config.is_resnet:
            from perceptor_tpu.models.clip.resnet import ModifiedResNet

            self.visual = ModifiedResNet(
                layers=tuple(self.config.vision_layers),
                width=self.config.vision_width,
                heads=self.config.vision_heads,
                output_dim=self.config.embed_dim,
                dtype=self.dtype,
            )
        else:
            self.visual = VisionTransformer(self.config, dtype=self.dtype)
        self.text = TextTransformer(self.config, dtype=self.dtype)
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(2.6592), ()
        )

    def encode_image(self, images):
        return self.visual(images)

    def encode_text(self, tokens):
        return self.text(tokens)

    def __call__(self, images, tokens):
        image_features = self.encode_image(images)
        text_features = self.encode_text(tokens)
        return image_features, text_features, self.logit_scale
