"""LiT (Locked-image Tuning) dual encoder in flax.

Functional spec: reference perceptor/losses/lit.py:10-81 wraps the external
`pytorch-zero-lit` package's `lit.LiT(name, cache_dir)` with
`encode_texts` / `encode_images` / `image_size`, names "LiT-B16B_2" and
"LiT-L16L".  Those checkpoints are the published Google LiT models
(Zhai et al., CVPR 2022, google-research/vision_transformer):

- image tower: a LOCKED AugReg ViT (B/16 or L/16, 224px) — timm-style
  pre-LN transformer with CLS pooling; the frozen pre-logits CLS feature
  *is* the shared embedding space (no image head in LiT),
- text tower: a BERT encoder (base or large, uncased WordPiece vocab,
  16-token context) with a learned linear head mapping the CLS state into
  the image feature space,
- preprocessing: images scaled to [-1, 1] (big_vision "value_range(-1,1)").

Both towers already exist in this package (TimmViT from models/slip,
BertTextEncoder from models/blip); this module composes them and carries
the weight converter.  Zero-egress: without a cached checkpoint the towers
are random-init (same shapes/FLOPs), and tower parity is tested against
locally-built torch twins like every other encoder here.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from perceptor_tpu import utils
from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.models.blip import BertTextEncoder
from perceptor_tpu.models.latent_diffusion.bert import BERTTokenizer
from perceptor_tpu.models.open_clip import _l2_normalize
from perceptor_tpu.models.slip import TimmViT
from perceptor_tpu.ops.resize import resize
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict


@dataclasses.dataclass(frozen=True)
class LiTConfig:
    image_size: int = 224
    patch_size: int = 16
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    # text (field names match BertTextEncoder's expectations)
    text_width: int = 768
    text_layers: int = 12
    text_heads: int = 12
    vocab_size: int = 30522
    max_text_length: int = 16

    @property
    def embed_dim(self) -> int:
        # the locked image tower defines the space; the text head maps into it
        return self.vision_width


MODEL_CONFIGS = {
    # ViT-B/16 + BERT-base
    "LiT-B16B_2": LiTConfig(),
    # ViT-L/16 + BERT-large
    "LiT-L16L": LiTConfig(
        vision_width=1024, vision_layers=24, vision_heads=16,
        text_width=1024, text_layers=24, text_heads=16,
    ),
    "tiny": LiTConfig(
        image_size=32, patch_size=16, vision_width=32, vision_layers=2,
        vision_heads=2, text_width=32, text_layers=2, text_heads=2,
        vocab_size=64, max_text_length=16,
    ),
}


def convert_lit(state_dict: Dict, cfg: LiTConfig) -> Dict:
    """torch LiT state_dict -> flax params.

    Expects timm naming for the image tower (`image_tower.` prefix:
    patch_embed.proj, cls_token, pos_embed, blocks.N.{norm1,attn.qkv,
    attn.proj,norm2,mlp.fc1,mlp.fc2}, norm) and HF-BERT naming for the text
    tower (`text_tower.` prefix) plus `text_head.{weight,bias}`.  BERT
    token_type embeddings (single-segment: always type 0) are folded into
    the word embeddings, which is exact.
    """
    from perceptor_tpu.models.clip.convert import _layernorm, _linear, _np

    sd = state_dict.get("state_dict") or state_dict
    im = "image_tower"
    visual = {
        "patch_embed": {
            "kernel": _np(sd[f"{im}.patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[f"{im}.patch_embed.proj.bias"]),
        },
        "cls_token": _np(sd[f"{im}.cls_token"]),
        "pos_embed": _np(sd[f"{im}.pos_embed"]),
        "norm": _layernorm(sd, f"{im}.norm"),
    }
    for i in range(cfg.vision_layers):
        p = f"{im}.blocks.{i}"
        visual[f"norm1_{i}"] = _layernorm(sd, f"{p}.norm1")
        visual[f"norm2_{i}"] = _layernorm(sd, f"{p}.norm2")
        visual[f"qkv_{i}"] = _linear(sd, f"{p}.attn.qkv")
        visual[f"attn_proj_{i}"] = _linear(sd, f"{p}.attn.proj")
        visual[f"fc1_{i}"] = _linear(sd, f"{p}.mlp.fc1")
        visual[f"fc2_{i}"] = _linear(sd, f"{p}.mlp.fc2")

    te = "text_tower"
    word = _np(sd[f"{te}.embeddings.word_embeddings.weight"])
    if f"{te}.embeddings.token_type_embeddings.weight" in sd:
        word = word + _np(sd[f"{te}.embeddings.token_type_embeddings.weight"])[0]
    text = {
        "word_embeddings": word,
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
        "text_head": _linear(sd, "text_head"),
    }


@utils.cache
class LiT:
    def __init__(self, name: str = "LiT-L16L",
                 tokenizer: Optional[BERTTokenizer] = None):
        """LiT image-text dual encoder (reference losses/lit.py:24)."""
        if name not in MODEL_CONFIGS:
            raise ValueError(
                f"unknown LiT model: {name}; known: {sorted(MODEL_CONFIGS)}"
            )
        self.name = name
        cfg = MODEL_CONFIGS[name]
        self.config = cfg
        self.image_size = (cfg.image_size, cfg.image_size)
        self.visual = TimmViT(
            cfg.vision_width, cfg.vision_layers, cfg.vision_heads,
            cfg.patch_size, dtype=jnp.bfloat16,
        )
        self.text = BertTextEncoder(cfg, dtype=jnp.bfloat16)
        self._tokenizer = tokenizer

        path = find_checkpoint(f"lit_{name}", name)
        if path is not None:
            self.params = jax.device_put(
                convert_lit(load_state_dict(path), cfg), jax.devices()[0]
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
                "text_head": {
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
        proj = cls @ params["text_head"]["kernel"] + params["text_head"]["bias"]
        return _l2_normalize(proj)

    def encode_texts(self, texts) -> jax.Array:
        tokens = self.tokenizer(list(texts))
        attention_mask = (tokens != self.tokenizer.pad).astype("int32")
        return self._jit_text(
            self.params, jnp.asarray(tokens), jnp.asarray(attention_mask)
        )

    def encode_images_fn(self, params, images) -> jax.Array:
        if images.shape[-2:] != self.image_size:
            images = resize(images, out_shape=self.image_size)
        # big_vision value_range(-1, 1) preprocessing
        images = images * 2.0 - 1.0
        return self.visual.apply({"params": params["visual"]}, images)

    def encode_images(self, images) -> jax.Array:
        return _l2_normalize(self._jit_image(self.params, images))
