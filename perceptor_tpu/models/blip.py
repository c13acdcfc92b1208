"""BLIP ITM (Salesforce) dual encoder in flax.

Functional spec: reference perceptor/models/blip/ — blip.py:46-123 wrapper
(8 checkpoints, ViT base/large at 224/384px, CLIP-normalize, ITC
projections with double L2-normalization, spherical ITC distance
:115-123); vit.py (timm-style ViT, eps 1e-6, fused qkv) and med.py
(BERT-base "med" text encoder in text mode: post-LN BERT with wordpiece
tokens, CLS pooling).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from perceptor_tpu import utils
from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.models.latent_diffusion.bert import BERTTokenizer
from perceptor_tpu.models.open_clip import CLIP_MEAN, CLIP_STD, _l2_normalize
from perceptor_tpu.models.slip import TimmViT
from perceptor_tpu.ops.attention import dot_product_attention
from perceptor_tpu.ops.resize import resize
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict


@dataclasses.dataclass(frozen=True)
class BLIPConfig:
    image_size: int = 384
    patch_size: int = 16
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    embed_dim: int = 256
    text_width: int = 768
    text_layers: int = 12
    text_heads: int = 12
    vocab_size: int = 30524  # bert-base-uncased + [DEC]/[ENC] tokens
    max_text_length: int = 35


_BASE = dict(vision_width=768, vision_layers=12, vision_heads=12)
_LARGE = dict(vision_width=1024, vision_layers=24, vision_heads=16)

MODEL_CONFIGS = {
    "model_base_retrieval_coco": BLIPConfig(**_BASE),
    "model_large_retrieval_coco": BLIPConfig(**_LARGE),
    "model_base_retrieval_flickr": BLIPConfig(**_BASE),
    "model_large_retrieval_flickr": BLIPConfig(**_LARGE),
    "model_large": BLIPConfig(**_LARGE),
    "model*_base": BLIPConfig(**_BASE),
    "model_base": BLIPConfig(image_size=224, **_BASE),
    "model_base_capfilt_large": BLIPConfig(**_BASE),
    "tiny": BLIPConfig(
        image_size=32, patch_size=16, vision_width=32, vision_layers=2,
        vision_heads=2, embed_dim=16, text_width=32, text_layers=2,
        text_heads=2, vocab_size=64, max_text_length=16,
    ),
}


class BertTextEncoder(nn.Module):
    """Post-LN BERT encoder (med.py BertModel in mode="text")."""

    config: BLIPConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, attention_mask):
        cfg = self.config
        word = self.param(
            "word_embeddings", nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.text_width),
        )
        position = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (512, cfg.text_width),
        )
        x = word[tokens] + position[: tokens.shape[1]][None]
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="embeddings_norm")(x)
        x = x.astype(self.dtype)

        # additive key mask (BERT extended_attention_mask semantics)
        key_mask = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e10)
        head_dim = cfg.text_width // cfg.text_heads
        b, s, _ = x.shape
        for i in range(cfg.text_layers):
            def proj(name, h):
                out = nn.Dense(cfg.text_width, dtype=self.dtype, name=name)(h)
                return out.reshape(b, s, cfg.text_heads, head_dim).transpose(
                    0, 2, 1, 3
                )

            q = proj(f"q_{i}", x)
            k = proj(f"k_{i}", x)
            v = proj(f"v_{i}", x)
            attn = dot_product_attention(q, k, v, mask=key_mask)
            attn = attn.transpose(0, 2, 1, 3).reshape(b, s, cfg.text_width)
            attn = nn.Dense(cfg.text_width, dtype=self.dtype, name=f"attn_out_{i}")(attn)
            x = nn.LayerNorm(
                epsilon=1e-12, dtype=jnp.float32, name=f"attn_norm_{i}"
            )(x + attn).astype(self.dtype)
            h = nn.Dense(cfg.text_width * 4, dtype=self.dtype, name=f"ff_in_{i}")(x)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.Dense(cfg.text_width, dtype=self.dtype, name=f"ff_out_{i}")(h)
            x = nn.LayerNorm(
                epsilon=1e-12, dtype=jnp.float32, name=f"ff_norm_{i}"
            )(x + h).astype(self.dtype)
        return x.astype(jnp.float32)


def convert_blip(state_dict: Dict, cfg: BLIPConfig) -> Dict:
    """BLIP checkpoint -> flax params (visual_encoder timm-naming,
    text_encoder HF-BERT naming, vision_proj/text_proj linears)."""
    from perceptor_tpu.models.clip.convert import _layernorm, _linear, _np

    sd = state_dict.get("model") or state_dict
    visual = {
        "patch_embed": {
            "kernel": _np(
                sd["visual_encoder.patch_embed.proj.weight"]
            ).transpose(2, 3, 1, 0),
            "bias": _np(sd["visual_encoder.patch_embed.proj.bias"]),
        },
        "cls_token": _np(sd["visual_encoder.cls_token"]),
        "pos_embed": _np(sd["visual_encoder.pos_embed"]),
        "norm": _layernorm(sd, "visual_encoder.norm"),
    }
    for i in range(cfg.vision_layers):
        p = f"visual_encoder.blocks.{i}"
        visual[f"norm1_{i}"] = _layernorm(sd, f"{p}.norm1")
        visual[f"norm2_{i}"] = _layernorm(sd, f"{p}.norm2")
        visual[f"qkv_{i}"] = _linear(sd, f"{p}.attn.qkv")
        visual[f"attn_proj_{i}"] = _linear(sd, f"{p}.attn.proj")
        visual[f"fc1_{i}"] = _linear(sd, f"{p}.mlp.fc1")
        visual[f"fc2_{i}"] = _linear(sd, f"{p}.mlp.fc2")

    te = "text_encoder.bert" if "text_encoder.bert.embeddings.word_embeddings.weight" in sd else "text_encoder"
    text = {
        "word_embeddings": _np(sd[f"{te}.embeddings.word_embeddings.weight"]),
        "position_embeddings": _np(sd[f"{te}.embeddings.position_embeddings.weight"]),
        "embeddings_norm": _layernorm(sd, f"{te}.embeddings.LayerNorm"),
    }
    for i in range(cfg.text_layers):
        p = f"{te}.encoder.layer.{i}"
        text[f"q_{i}"] = _linear(sd, f"{p}.attention.self.query")
        text[f"k_{i}"] = _linear(sd, f"{p}.attention.self.key")
        text[f"v_{i}"] = _linear(sd, f"{p}.attention.self.value")
        text[f"attn_out_{i}"] = _linear(sd, f"{p}.attention.output.dense")
        text[f"attn_norm_{i}"] = _layernorm(sd, f"{p}.attention.output.LayerNorm")
        text[f"ff_in_{i}"] = _linear(sd, f"{p}.intermediate.dense")
        text[f"ff_out_{i}"] = _linear(sd, f"{p}.output.dense")
        text[f"ff_norm_{i}"] = _layernorm(sd, f"{p}.output.LayerNorm")
    return {
        "visual": visual,
        "text": text,
        "vision_proj": _linear(sd, "vision_proj"),
        "text_proj": _linear(sd, "text_proj"),
    }


@utils.cache
class BLIP:
    def __init__(self, name: str = "model_base_retrieval_flickr",
                 tokenizer: Optional[BERTTokenizer] = None):
        """(reference blip.py:47-80)."""
        if name not in MODEL_CONFIGS:
            raise ValueError(f"unknown blip model: {name}")
        self.name = name
        cfg = MODEL_CONFIGS[name]
        self.config = cfg
        self.image_size = cfg.image_size
        self.visual = TimmViT(
            cfg.vision_width, cfg.vision_layers, cfg.vision_heads, cfg.patch_size,
            dtype=jnp.bfloat16,
        )
        self.text = BertTextEncoder(cfg, dtype=jnp.bfloat16)
        self._tokenizer = tokenizer

        path = find_checkpoint(f"blip_{name}", name)
        if path is not None:
            self.params = jax.device_put(
                convert_blip(load_state_dict(path), cfg), jax.devices()[0]
            )
        else:
            import numpy as np

            key = jax.random.PRNGKey(0)
            rng = np.random.default_rng(0)
            self.params = {
                "visual": init_by_shape(
                    self.visual.init, key,
                    jnp.zeros((1, 3, cfg.image_size, cfg.image_size)),
                )["params"],
                "text": init_by_shape(
                    self.text.init, key,
                    jnp.zeros((1, cfg.max_text_length), jnp.int32),
                    jnp.ones((1, cfg.max_text_length), jnp.int32),
                )["params"],
                "vision_proj": {
                    "kernel": jnp.asarray(rng.normal(
                        0, cfg.vision_width**-0.5,
                        (cfg.vision_width, cfg.embed_dim)).astype("float32")),
                    "bias": jnp.zeros((cfg.embed_dim,)),
                },
                "text_proj": {
                    "kernel": jnp.asarray(rng.normal(
                        0, cfg.text_width**-0.5,
                        (cfg.text_width, cfg.embed_dim)).astype("float32")),
                    "bias": jnp.zeros((cfg.embed_dim,)),
                },
            }
        self._jit_text = jax.jit(self._encode_tokens)
        self._jit_image = jax.jit(self.encode_images_fn)

    @property
    def tokenizer(self) -> BERTTokenizer:
        if self._tokenizer is None:
            self._tokenizer = BERTTokenizer(max_length=self.config.max_text_length)
        return self._tokenizer

    def _encode_tokens(self, params, tokens, attention_mask):
        hidden = self.text.apply({"params": params["text"]}, tokens, attention_mask)
        cls = hidden[:, 0]
        proj = cls @ params["text_proj"]["kernel"] + params["text_proj"]["bias"]
        # the reference double-normalizes (blip.py:96-101)
        return _l2_normalize(_l2_normalize(proj))

    def encode_texts(self, texts) -> jax.Array:
        tokens = self.tokenizer(list(texts))
        attention_mask = (tokens != self.tokenizer.pad).astype("int32")
        return self._jit_text(
            self.params, jnp.asarray(tokens), jnp.asarray(attention_mask)
        )

    def encode_images_fn(self, params, images) -> jax.Array:
        size = (self.image_size, self.image_size)
        if images.shape[-2:] != size:
            images = resize(images, out_shape=size)
        mean = jnp.asarray(CLIP_MEAN).reshape(1, 3, 1, 1)
        std = jnp.asarray(CLIP_STD).reshape(1, 3, 1, 1)
        cls = self.visual.apply({"params": params["visual"]}, (images - mean) / std)
        proj = cls @ params["vision_proj"]["kernel"] + params["vision_proj"]["bias"]
        return _l2_normalize(_l2_normalize(proj))

    def encode_images(self, images) -> jax.Array:
        return self._jit_image(self.params, images)

    @staticmethod
    def image_text_contrastive_spherical_distance(encodings_a, encodings_b):
        """(reference blip.py:115-123)."""
        norm = jnp.linalg.norm(
            encodings_a[None, :] - encodings_b[:, None], axis=-1
        )
        return jnp.square(jnp.arcsin(jnp.clip(norm / 2, 0.0, 1.0))) * 2
