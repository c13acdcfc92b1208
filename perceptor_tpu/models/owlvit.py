"""OWL-ViT zero-shot text-conditioned detection in flax.

Functional spec: reference perceptor/models/owlvit/owlvit.py:40-117 (wrapper:
768px differentiable resize + normalize, OWLViTEncodings/OWLViTPredictions
value objects) over the vendored HF modeling_owlvit (CLIP-style towers;
image_embedder merges patch tokens with the class token by elementwise
product + LayerNorm; class head computes normalized query-image logits with
learned shift/scale; box head is a GELU MLP with grid-position bias).

Parity target: transformers.OwlViTForObjectDetection (installed locally).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from perceptor_tpu import utils
from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.core.pytree import Functional, static_field
from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer, tokenize
from perceptor_tpu.ops.attention import attention, causal_mask
from perceptor_tpu.ops.resize import resize
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict

IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class OWLViTConfig:
    image_size: int = 768
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    vocab_size: int = 49408
    context_length: int = 16
    embed_dim: int = 512  # text hidden size == class-head out_dim


TINY = OWLViTConfig(
    image_size=64, patch_size=32, vision_width=32, vision_layers=2,
    vision_heads=2, text_width=32, text_heads=2, text_layers=2, vocab_size=64,
    context_length=8, embed_dim=32,
)
CONFIGS = {"google/owlvit-base-patch32": OWLViTConfig(), "tiny": TINY}


class _CLIPLayer(nn.Module):
    """HF CLIP encoder layer (pre-LN, quick-gelu)."""

    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        b, s, _ = x.shape
        head_dim = self.width // self.heads
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm1")(x)
        h = h.astype(self.dtype)

        def split(name):
            out = nn.Dense(self.width, dtype=self.dtype, name=name)(h)
            return out.reshape(b, s, self.heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split("q_proj"), split("k_proj"), split("v_proj")
        out = attention(q, k, v, mask=mask)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, self.width)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="out_proj")(out)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm2")(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="fc1")(h.astype(self.dtype))
        h = h * jax.nn.sigmoid(1.702 * h)  # quick_gelu
        return x + nn.Dense(self.width, dtype=self.dtype, name="fc2")(h)


class OWLViTVision(nn.Module):
    """Returns the post-LN sequence of image embeddings (cls + patches)."""

    config: OWLViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        cfg = self.config
        from perceptor_tpu.models.patch_embed import PatchEmbed

        x = PatchEmbed(
            cfg.vision_width, cfg.patch_size, use_bias=False,
            dtype=self.dtype, name="patch_embedding",
        )(images.transpose(0, 2, 3, 1).astype(self.dtype))
        n, gh, gw, w = x.shape
        x = x.reshape(n, gh * gw, w)
        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.vision_width,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(class_embedding, (n, 1, w)).astype(self.dtype), x],
            axis=1,
        )
        position = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (gh * gw + 1, cfg.vision_width),
        )
        x = x + position.astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="pre_layernorm")(x)
        x = x.astype(self.dtype)
        for i in range(cfg.vision_layers):
            x = _CLIPLayer(
                cfg.vision_width, cfg.vision_heads, self.dtype, name=f"layer_{i}"
            )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="post_layernorm")(x)
        return x.astype(jnp.float32)


class OWLViTText(nn.Module):
    """CLIP text tower -> projected query embedding (argmax pooling)."""

    config: OWLViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        cfg = self.config
        token_embedding = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.text_width),
        )
        position = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (cfg.context_length, cfg.text_width),
        )
        x = token_embedding[tokens].astype(self.dtype)
        x = x + position[: tokens.shape[1]].astype(self.dtype)
        mask = causal_mask(tokens.shape[1])
        for i in range(cfg.text_layers):
            x = _CLIPLayer(
                cfg.text_width, cfg.text_heads, self.dtype, name=f"layer_{i}"
            )(x, mask)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_layer_norm")(x)
        pooled = x[jnp.arange(x.shape[0]), jnp.argmax(tokens, axis=-1)]
        return nn.Dense(
            cfg.embed_dim, use_bias=False, dtype=self.dtype, name="text_projection"
        )(pooled.astype(self.dtype)).astype(jnp.float32)


class OWLViTDetection(nn.Module):
    config: OWLViTConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.vision = OWLViTVision(cfg, dtype=self.dtype)
        self.text = OWLViTText(cfg, dtype=self.dtype)
        self.merge_norm = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, name="merge_norm"
        )
        self.class_dense0 = nn.Dense(cfg.embed_dim, name="class_dense0")
        self.logit_shift = nn.Dense(1, name="logit_shift")
        self.logit_scale = nn.Dense(1, name="logit_scale")
        self.box_dense0 = nn.Dense(cfg.vision_width, name="box_dense0")
        self.box_dense1 = nn.Dense(cfg.vision_width, name="box_dense1")
        self.box_dense2 = nn.Dense(4, name="box_dense2")

    def encode_queries(self, tokens):
        return self.text(tokens)

    def image_features(self, images):
        """Merged patch features (HF image_embedder semantics)."""
        embeds = self.vision(images)
        class_token = embeds[:, :1]
        feats = embeds[:, 1:] * class_token
        return self.merge_norm(feats)

    def _box_bias(self, n_patches: int):
        coords = (np.arange(1, n_patches + 1, dtype=np.float32)) / n_patches
        xx, yy = np.meshgrid(coords, coords, indexing="xy")
        xy = np.stack([xx, yy], axis=-1).reshape(-1, 2)
        xy = np.clip(xy, 0.0, 1.0)
        coord_bias = np.log(xy + 1e-4) - np.log1p(-xy + 1e-4)
        size = np.full_like(xy, 1.0 / n_patches)
        size_bias = np.log(size + 1e-4) - np.log1p(-size + 1e-4)
        return jnp.asarray(np.concatenate([coord_bias, size_bias], axis=-1))

    def __call__(self, images, query_tokens):
        cfg = self.config
        feats = self.image_features(images)  # (N, P, W)
        queries = self.encode_queries(query_tokens)  # (Q, E)

        class_embeds = self.class_dense0(feats)
        class_embeds = class_embeds / (
            jnp.linalg.norm(class_embeds, axis=-1, keepdims=True) + 1e-6
        )
        queries_n = queries / (
            jnp.linalg.norm(queries, axis=-1, keepdims=True) + 1e-6
        )
        logits = jnp.einsum("npd,qd->npq", class_embeds, queries_n)
        shift = self.logit_shift(feats)
        scale = jax.nn.elu(self.logit_scale(feats)) + 1
        logits = (logits + shift) * scale

        h = jax.nn.gelu(self.box_dense0(feats), approximate=False)
        h = jax.nn.gelu(self.box_dense1(h), approximate=False)
        boxes = self.box_dense2(h)
        n_patches = cfg.image_size // cfg.patch_size
        boxes = jax.nn.sigmoid(boxes + self._box_bias(n_patches))
        return logits, boxes


class OWLViTEncodings(Functional):
    """(reference owlvit.py:15-37)."""

    tokens: jax.Array  # (Q, ctx)
    texts: tuple = static_field(default=())


class OWLViTPredictions(Functional):
    """(reference owlvit.py:40-45)."""

    logits: jax.Array  # (N, K, E)
    boxes: jax.Array  # (N, K, 4) xyxy pixels
    scores: jax.Array  # (N, K)
    labels: jax.Array  # (N, K)
    texts: tuple = static_field(default=())


def convert_owlvit(state_dict: Dict, cfg: OWLViTConfig) -> Dict:
    """HF OwlViTForObjectDetection state_dict -> flax params."""
    from perceptor_tpu.models.clip.convert import _layernorm, _linear, _np

    sd = state_dict

    def tower(prefix, layers, out):
        for i in range(layers):
            p = f"{prefix}.encoder.layers.{i}"
            out[f"layer_{i}"] = {
                "layer_norm1": _layernorm(sd, f"{p}.layer_norm1"),
                "layer_norm2": _layernorm(sd, f"{p}.layer_norm2"),
                "q_proj": _linear(sd, f"{p}.self_attn.q_proj"),
                "k_proj": _linear(sd, f"{p}.self_attn.k_proj"),
                "v_proj": _linear(sd, f"{p}.self_attn.v_proj"),
                "out_proj": _linear(sd, f"{p}.self_attn.out_proj"),
                "fc1": _linear(sd, f"{p}.mlp.fc1"),
                "fc2": _linear(sd, f"{p}.mlp.fc2"),
            }
        return out

    vp = "owlvit.vision_model"
    vision = tower(vp, cfg.vision_layers, {
        "patch_embedding": {
            "kernel": _np(
                sd[f"{vp}.embeddings.patch_embedding.weight"]
            ).transpose(2, 3, 1, 0)
        },
        "class_embedding": _np(sd[f"{vp}.embeddings.class_embedding"]),
        "position_embedding": _np(
            sd[f"{vp}.embeddings.position_embedding.weight"]
        ),
        "pre_layernorm": _layernorm(sd, f"{vp}.pre_layernorm"),
        "post_layernorm": _layernorm(sd, f"{vp}.post_layernorm"),
    })
    tp = "owlvit.text_model"
    text = tower(tp, cfg.text_layers, {
        "token_embedding": _np(sd[f"{tp}.embeddings.token_embedding.weight"]),
        "position_embedding": _np(
            sd[f"{tp}.embeddings.position_embedding.weight"]
        ),
        "final_layer_norm": _layernorm(sd, f"{tp}.final_layer_norm"),
        "text_projection": {
            "kernel": _np(sd["owlvit.text_projection.weight"]).T
        },
    })
    return {
        "vision": vision,
        "text": text,
        "merge_norm": _layernorm(sd, "layer_norm"),
        "class_dense0": _linear(sd, "class_head.dense0"),
        "logit_shift": _linear(sd, "class_head.logit_shift"),
        "logit_scale": _linear(sd, "class_head.logit_scale"),
        "box_dense0": _linear(sd, "box_head.dense0"),
        "box_dense1": _linear(sd, "box_head.dense1"),
        "box_dense2": _linear(sd, "box_head.dense2"),
    }


@utils.cache
class OWLViT:
    def __init__(self, name: str = "google/owlvit-base-patch32",
                 tokenizer: Optional[SimpleTokenizer] = None):
        """(reference owlvit.py:48-60)."""
        if name not in CONFIGS:
            raise ValueError(f"unknown owlvit model: {name}")
        self.name = name
        cfg = CONFIGS[name]
        self.config = cfg
        self.size = (cfg.image_size, cfg.image_size)
        self.module = OWLViTDetection(cfg, dtype=jnp.bfloat16)
        self._tokenizer = tokenizer

        path = find_checkpoint(f"owlvit_{name.replace('/', '_')}", name)
        if path is not None:
            self.params = jax.device_put(
                convert_owlvit(load_state_dict(path), cfg), jax.devices()[0]
            )
        else:
            self.params = init_by_shape(
                self.module.init,
                jax.random.PRNGKey(0),
                jnp.zeros((1, 3, cfg.image_size, cfg.image_size)),
                jnp.zeros((1, cfg.context_length), jnp.int32),
            )["params"]
        self._jit_forward = jax.jit(self.forward_fn)

    @property
    def tokenizer(self) -> SimpleTokenizer:
        if self._tokenizer is None:
            self._tokenizer = SimpleTokenizer()
        return self._tokenizer

    def encode_texts(self, texts: List[List[str]]) -> OWLViTEncodings:
        """(reference owlvit.py:65-76): one flat query list per batch."""
        flat = [t for group in texts for t in group]
        tokens = tokenize(
            flat, self.config.context_length, tokenizer=self.tokenizer
        )
        return OWLViTEncodings(
            tokens=jnp.asarray(tokens),
            texts=tuple(tuple(group) for group in texts),
        )

    def forward_fn(self, params, images, query_tokens):
        if images.shape[-2:] != self.size:
            images = resize(images, out_shape=self.size)
        mean = jnp.asarray(IMAGE_MEAN).reshape(1, 3, 1, 1)
        std = jnp.asarray(IMAGE_STD).reshape(1, 3, 1, 1)
        return self.module.apply(
            {"params": params}, (images - mean) / std, query_tokens
        )

    def forward(self, images, encodings: OWLViTEncodings) -> OWLViTPredictions:
        """(reference owlvit.py:78-117)."""
        logits, boxes = self._jit_forward(self.params, images, encodings.tokens)
        probs = jax.nn.sigmoid(logits)
        scores = probs.max(axis=-1)
        labels = probs.argmax(axis=-1)
        # cxcywh [0,1] -> xyxy pixels (post_process semantics)
        h, w = self.size
        cx, cy, bw, bh = (boxes[..., i] for i in range(4))
        xyxy = jnp.stack(
            [(cx - bw / 2) * w, (cy - bh / 2) * h,
             (cx + bw / 2) * w, (cy + bh / 2) * h],
            axis=-1,
        )
        return OWLViTPredictions(
            logits=logits, boxes=xyxy, scores=scores, labels=labels,
            texts=encodings.texts,
        )

    __call__ = forward
