"""CLOOB (crowsonkb cloob-training, ViT-B/16 LAION-400M) in flax.

Functional spec: reference perceptor/models/cloob/ — cloob.py:9-51 wrapper
(resize to 224 + CLIP-normalize + L2-normalized towers) and model_pt.py:
pre-norm transformer WITHOUT a final LayerNorm, pooled at token 0 for both
towers; text uses an EOT-derived padding mask (model_pt.py:110-113);
tanh-approximate GELU in the feed-forwards... (model_pt.py:19-29 defines an
approximate GELU but FeedForward uses exact nn.GELU, :64).
Config: pretrained_configs/cloob_laion_400m_vit_b_16_*.json.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from perceptor_tpu import utils
from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer, tokenize
from perceptor_tpu.models.open_clip import CLIP_MEAN, CLIP_STD, _l2_normalize
from perceptor_tpu.ops.attention import dot_product_attention
from perceptor_tpu.ops.resize import resize
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict


@dataclasses.dataclass(frozen=True)
class CLOOBConfig:
    d_embed: int = 512
    image_size: int = 224
    patch_size: int = 16
    vision_layers: int = 12
    vision_width: int = 768
    vision_heads: int = 12
    text_layers: int = 12
    text_width: int = 512
    text_heads: int = 8
    text_size: int = 77
    vocab_size: int = 49408


TINY = CLOOBConfig(
    d_embed=16, image_size=32, patch_size=16, vision_layers=2, vision_width=32,
    vision_heads=2, text_layers=2, text_width=32, text_heads=2, text_size=16,
    vocab_size=64,
)
CONFIGS = {"16-epochs": CLOOBConfig(), "32-epochs": CLOOBConfig(), "tiny": TINY}


class EncoderLayer(nn.Module):
    """Pre-norm block: x + attn(norm(x)), x + ff(norm(x))
    (model_pt.py:76-86)."""

    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None):
        d = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="attn_norm")(x)
        h = h.astype(self.dtype)
        b, s, _ = h.shape
        head_dim = d // self.heads

        def split(name):
            out = nn.Dense(d, dtype=self.dtype, name=name)(h)
            return out.reshape(b, s, self.heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split("query"), split("key"), split("value")
        mask = None
        if padding_mask is not None:
            # (model_pt.py:50-53): the reference masks QUERY positions
            # (padding_mask[:, None, :, None] over "...htT" logits) — padded
            # queries get uniform attention, keys are never masked. Matched
            # exactly for weight compatibility.
            mask = jnp.where(padding_mask[:, None, :, None], 0.0, -1e30)
        attn = dot_product_attention(q, k, v, mask=mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="out")(attn)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ff_norm")(x)
        h = nn.Dense(d * 4, dtype=self.dtype, name="linear_0")(h.astype(self.dtype))
        h = jax.nn.gelu(h, approximate=False)
        return x + nn.Dense(d, dtype=self.dtype, name="linear_1")(h)


class CLOOBTextEncoder(nn.Module):
    config: CLOOBConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        cfg = self.config
        eot = cfg.vocab_size - 1
        eot_mask = tokens == eot
        # attendable: positions up to and including the first EOT
        padding_mask = (jnp.cumsum(eot_mask, axis=-1) == 0) | eot_mask
        embed = self.param(
            "embed", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.text_width)
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(1.0), (cfg.text_size, cfg.text_width)
        )
        x = embed[tokens].astype(self.dtype) + pos[: tokens.shape[1]].astype(self.dtype)
        for i in range(cfg.text_layers):
            x = EncoderLayer(cfg.text_heads, self.dtype, name=f"layer_{i}")(
                x, padding_mask
            )
        x = x[:, 0]  # token-0 pooling (model_pt.py:115-118)
        x = nn.Dense(cfg.d_embed, dtype=self.dtype, name="proj")(x)
        return _l2_normalize(x.astype(jnp.float32))


class CLOOBImageEncoder(nn.Module):
    config: CLOOBConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        """images NCHW, already normalized."""
        cfg = self.config
        from perceptor_tpu.models.patch_embed import PatchEmbed

        x = PatchEmbed(
            cfg.vision_width,
            cfg.patch_size,
            use_bias=False,
            dtype=self.dtype,
            name="embed",
        )(images.transpose(0, 2, 3, 1).astype(self.dtype))
        n, gh, gw, w = x.shape
        x = x.reshape(n, gh * gw, w)
        class_embed = self.param(
            "class_embed",
            nn.initializers.normal(cfg.vision_width**-0.5),
            (cfg.vision_width,),
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(class_embed, (n, 1, w)).astype(self.dtype), x], axis=1
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(1.0),
            (gh * gw + 1, cfg.vision_width),
        )
        x = x + pos.astype(self.dtype)
        for i in range(cfg.vision_layers):
            x = EncoderLayer(cfg.vision_heads, self.dtype, name=f"layer_{i}")(x)
        x = x[:, 0]
        x = nn.Dense(cfg.d_embed, dtype=self.dtype, name="proj")(x)
        return _l2_normalize(x.astype(jnp.float32))


def convert_cloob(state_dict: Dict, cfg: CLOOBConfig) -> Dict:
    """model_pt torch state_dict -> {image, text} flax params."""
    from perceptor_tpu.models.clip.convert import _np

    def linear(prefix):
        return {
            "kernel": _np(state_dict[f"{prefix}.weight"]).T,
            "bias": _np(state_dict[f"{prefix}.bias"]),
        }

    def norm(prefix):
        return {
            "scale": _np(state_dict[f"{prefix}.weight"]),
            "bias": _np(state_dict[f"{prefix}.bias"]),
        }

    def layers(tower, n):
        out = {}
        for i in range(n):
            p = f"{tower}.layers.{i}"
            out[f"layer_{i}"] = {
                "attn_norm": norm(f"{p}.attn.norm"),
                "query": linear(f"{p}.attn.query"),
                "key": linear(f"{p}.attn.key"),
                "value": linear(f"{p}.attn.value"),
                "out": linear(f"{p}.attn.out"),
                "ff_norm": norm(f"{p}.ff.norm"),
                "linear_0": linear(f"{p}.ff.linear_0"),
                "linear_1": linear(f"{p}.ff.linear_1"),
            }
        return out

    image = {
        "embed": {
            "kernel": _np(state_dict["image_encoder.embed.weight"]).transpose(
                2, 3, 1, 0
            )
        },
        "class_embed": _np(state_dict["image_encoder.class_embed"]),
        "pos_embed": _np(state_dict["image_encoder.pos_embed.weight"]),
        "proj": linear("image_encoder.proj"),
        **layers("image_encoder", cfg.vision_layers),
    }
    text = {
        "embed": _np(state_dict["text_encoder.embed.weight"]),
        "pos_embed": _np(state_dict["text_encoder.pos_embed.weight"]),
        "proj": linear("text_encoder.proj"),
        **layers("text_encoder", cfg.text_layers),
    }
    return {"image": image, "text": text}


@utils.cache
class CLOOB:
    def __init__(self, name: str = "16-epochs",
                 tokenizer: Optional[SimpleTokenizer] = None):
        """(reference cloob.py:17-32)."""
        if name not in CONFIGS:
            raise ValueError(f"unknown cloob model: {name}")
        self.name = name
        self.config = CONFIGS[name]
        self.image_size = (self.config.image_size, self.config.image_size)
        self.image_encoder = CLOOBImageEncoder(self.config, dtype=jnp.bfloat16)
        self.text_encoder = CLOOBTextEncoder(self.config, dtype=jnp.bfloat16)
        self._tokenizer = tokenizer

        path = find_checkpoint(f"cloob_{name}", name)
        if path is not None:
            self.params = jax.device_put(
                convert_cloob(load_state_dict(path), self.config), jax.devices()[0]
            )
        else:
            key = jax.random.PRNGKey(0)
            self.params = {
                "image": init_by_shape(
                    self.image_encoder.init, key,
                    jnp.zeros((1, 3, *self.image_size)),
                )["params"],
                "text": init_by_shape(
                    self.text_encoder.init, key,
                    jnp.zeros((1, self.config.text_size), jnp.int32),
                )["params"],
            }
        self._jit_text = jax.jit(
            lambda params, tokens: self.text_encoder.apply(
                {"params": params["text"]}, tokens
            )
        )
        self._jit_image = jax.jit(self.encode_images_fn)

    @property
    def tokenizer(self) -> SimpleTokenizer:
        if self._tokenizer is None:
            self._tokenizer = SimpleTokenizer()
        return self._tokenizer

    def encode_texts(self, text_prompts) -> jax.Array:
        tokens = tokenize(
            text_prompts, self.config.text_size, tokenizer=self.tokenizer
        )
        return self._jit_text(self.params, jnp.asarray(tokens))

    def encode_images_fn(self, params, images) -> jax.Array:
        """(reference cloob.py:41-51): resize + CLIP-normalize + tower."""
        if images.shape[-2:] != self.image_size:
            images = resize(images, out_shape=self.image_size)
        mean = jnp.asarray(CLIP_MEAN).reshape(1, 3, 1, 1)
        std = jnp.asarray(CLIP_STD).reshape(1, 3, 1, 1)
        return self.image_encoder.apply(
            {"params": params["image"]}, (images - mean) / std
        )

    def encode_images(self, images) -> jax.Array:
        return self._jit_image(self.params, images)
