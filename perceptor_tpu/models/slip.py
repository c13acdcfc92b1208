"""SLIP (MIT) dual encoder in flax: timm ViT vision + CLIP text tower.

Functional spec: reference perceptor/models/slip/ — slip.py:9-38 wrapper
(L2-normalized towers), models.py: timm vision_transformer backbone
(vit_small/base/large_patch16_224, fused-qkv pre-norm blocks, final norm,
mean of CLS token) with a linear image_projection, and an OpenAI-style
causal text transformer with text_projection. Checkpoint keys are
"module.visual.*" (timm naming) / "module.transformer.*" etc.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from perceptor_tpu import utils
from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.models.clip.configs import CLIPConfig
from perceptor_tpu.models.clip.convert import _layernorm, _linear, _np, _openclip_block
from perceptor_tpu.models.clip.model import TextTransformer
from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer, tokenize
from perceptor_tpu.models.open_clip import _l2_normalize
from perceptor_tpu.ops.attention import attention
from perceptor_tpu.ops.resize import resize
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict


@dataclasses.dataclass(frozen=True)
class SLIPConfig:
    embed_dim: int = 512
    image_size: int = 224
    patch_size: int = 16
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    context_length: int = 77
    vocab_size: int = 49408
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12


_VIT = {
    "S": dict(vision_width=384, vision_layers=12, vision_heads=6),
    "B": dict(vision_width=768, vision_layers=12, vision_heads=12),
    "L": dict(vision_width=1024, vision_layers=24, vision_heads=16),
}

MODEL_CONFIGS = {
    "SLIP_VITS16": SLIPConfig(**_VIT["S"]),
    "SLIP_VITB16": SLIPConfig(**_VIT["B"]),
    "SLIP_VITL16": SLIPConfig(**_VIT["L"]),
    "CLIP_VITS16": SLIPConfig(**_VIT["S"]),
    "CLIP_VITB16": SLIPConfig(**_VIT["B"]),
    "CLIP_VITL16": SLIPConfig(**_VIT["L"]),
    "SLIP_CC3M": SLIPConfig(**_VIT["B"]),
    "SLIP_CC12M": SLIPConfig(**_VIT["B"]),
    "tiny": SLIPConfig(
        embed_dim=16, image_size=32, patch_size=16, vision_width=32,
        vision_layers=2, vision_heads=2, context_length=16, vocab_size=64,
        text_width=32, text_heads=2, text_layers=2,
    ),
}

IMAGE_MEAN = (0.485, 0.456, 0.406)  # timm/ImageNet normalization
IMAGE_STD = (0.229, 0.224, 0.225)


class TimmViT(nn.Module):
    """timm vision_transformer (pre-norm, fused qkv, CLS pooling). NCHW in."""

    width: int
    layers: int
    heads: int
    patch_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        from perceptor_tpu.models.patch_embed import PatchEmbed

        x = PatchEmbed(
            self.width, self.patch_size, dtype=self.dtype,
            name="patch_embed",
        )(images.transpose(0, 2, 3, 1).astype(self.dtype))
        n, gh, gw, w = x.shape
        x = x.reshape(n, gh * gw, w)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.width))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (n, 1, w)), x], axis=1
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, gh * gw + 1, self.width),
        )
        x = x + pos[0].astype(self.dtype)
        head_dim = self.width // self.heads
        for i in range(self.layers):
            h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=f"norm1_{i}")(x)
            qkv = nn.Dense(self.width * 3, dtype=self.dtype, name=f"qkv_{i}")(
                h.astype(self.dtype)
            )
            qkv = qkv.reshape(n, -1, 3, self.heads, head_dim)
            q, k, v = (qkv[:, :, j].transpose(0, 2, 1, 3) for j in range(3))
            attn = attention(q, k, v)
            attn = attn.transpose(0, 2, 1, 3).reshape(n, -1, self.width)
            x = x + nn.Dense(self.width, dtype=self.dtype, name=f"attn_proj_{i}")(attn)
            h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=f"norm2_{i}")(x)
            h = nn.Dense(self.width * 4, dtype=self.dtype, name=f"fc1_{i}")(
                h.astype(self.dtype)
            )
            h = jax.nn.gelu(h, approximate=False)
            x = x + nn.Dense(self.width, dtype=self.dtype, name=f"fc2_{i}")(h)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        return x[:, 0].astype(jnp.float32)  # CLS


def convert_slip(state_dict: Dict, cfg: SLIPConfig) -> Dict:
    """SLIP checkpoint ("module."-prefixed) -> {visual, image_projection,
    text, ...} flax params."""
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }
    visual = {
        "patch_embed": {
            "kernel": _np(sd["visual.patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd["visual.patch_embed.proj.bias"]),
        },
        "cls_token": _np(sd["visual.cls_token"]),
        "pos_embed": _np(sd["visual.pos_embed"]),
        "norm": _layernorm(sd, "visual.norm"),
    }
    for i in range(cfg.vision_layers):
        p = f"visual.blocks.{i}"
        visual[f"norm1_{i}"] = _layernorm(sd, f"{p}.norm1")
        visual[f"norm2_{i}"] = _layernorm(sd, f"{p}.norm2")
        visual[f"qkv_{i}"] = _linear(sd, f"{p}.attn.qkv")
        visual[f"attn_proj_{i}"] = _linear(sd, f"{p}.attn.proj")
        visual[f"fc1_{i}"] = _linear(sd, f"{p}.mlp.fc1")
        visual[f"fc2_{i}"] = _linear(sd, f"{p}.mlp.fc2")
    text = {
        "token_embedding": _np(sd["token_embedding.weight"]),
        "positional_embedding": _np(sd["positional_embedding"]),
        "ln_final": _layernorm(sd, "ln_final"),
        "text_projection": _np(sd["text_projection"]),
        "transformer": {
            f"resblocks_{i}": _openclip_block(sd, f"transformer.resblocks.{i}")
            for i in range(cfg.text_layers)
        },
    }
    return {
        "visual": visual,
        "image_projection": _np(sd["image_projection"]),
        "text": text,
    }


@utils.cache
class SLIP:
    def __init__(self, name: str = "SLIP_VITB16",
                 tokenizer: Optional[SimpleTokenizer] = None):
        """(reference slip.py:10-23)."""
        if name not in MODEL_CONFIGS:
            raise ValueError(f"unknown slip model: {name}")
        self.name = name
        cfg = MODEL_CONFIGS[name]
        self.config = cfg
        self.visual = TimmViT(
            cfg.vision_width, cfg.vision_layers, cfg.vision_heads, cfg.patch_size,
            dtype=jnp.bfloat16,
        )
        clip_cfg = CLIPConfig(
            embed_dim=cfg.embed_dim, image_size=(cfg.image_size, cfg.image_size),
            vision_layers=1, vision_width=64, vision_heads=1, patch_size=16,
            context_length=cfg.context_length, vocab_size=cfg.vocab_size,
            text_width=cfg.text_width, text_heads=cfg.text_heads,
            text_layers=cfg.text_layers, quick_gelu=False,
        )
        self.text = TextTransformer(clip_cfg, dtype=jnp.bfloat16)
        self._tokenizer = tokenizer

        path = find_checkpoint(f"slip_{name}", name)
        if path is not None:
            self.params = jax.device_put(
                convert_slip(load_state_dict(path), cfg), jax.devices()[0]
            )
        else:
            key = jax.random.PRNGKey(0)
            import numpy as np

            rng = np.random.default_rng(0)
            self.params = {
                "visual": init_by_shape(
                    self.visual.init, key,
                    jnp.zeros((1, 3, cfg.image_size, cfg.image_size)),
                )["params"],
                "image_projection": jnp.asarray(
                    rng.normal(0, cfg.vision_width**-0.5,
                               (cfg.vision_width, cfg.embed_dim)).astype("float32")
                ),
                "text": init_by_shape(
                    self.text.init, key,
                    jnp.zeros((1, cfg.context_length), jnp.int32),
                )["params"],
            }
        self._jit_text = jax.jit(
            lambda params, tokens: self.text.apply({"params": params["text"]}, tokens)
        )
        self._jit_image = jax.jit(self.encode_images_fn)

    @property
    def tokenizer(self) -> SimpleTokenizer:
        if self._tokenizer is None:
            self._tokenizer = SimpleTokenizer()
        return self._tokenizer

    def encode_texts(self, text_prompts) -> jax.Array:
        tokens = tokenize(
            text_prompts, self.config.context_length, tokenizer=self.tokenizer
        )
        return _l2_normalize(self._jit_text(self.params, jnp.asarray(tokens)))

    def encode_images_fn(self, params, images) -> jax.Array:
        size = (self.config.image_size, self.config.image_size)
        if images.shape[-2:] != size:
            images = resize(images, out_shape=size)
        mean = jnp.asarray(IMAGE_MEAN).reshape(1, 3, 1, 1)
        std = jnp.asarray(IMAGE_STD).reshape(1, 3, 1, 1)
        features = self.visual.apply(
            {"params": params["visual"]}, (images - mean) / std
        )
        return _l2_normalize(features @ params["image_projection"])

    def encode_images(self, images) -> jax.Array:
        return self._jit_image(self.params, images)
