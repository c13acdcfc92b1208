"""RuCLIP (Sberbank Russian CLIP) in flax.

Functional spec: reference perceptor/models/ruclip/ — the standard OpenAI
CLIP architecture (model.py:25-230) with QuickGELU, except the text tower
pools at the first eos_id=3 token (model.py:205-226) instead of argmax;
the processor (processor.py:12-76) is a youtokentome BPE with
bos=2/eos=3/pad=0 and CLIP image normalization.

Vision tower and weight layout are identical to OpenAI CLIP, so the
existing clip modules/converter are reused.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from perceptor_tpu import utils
from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.models.clip.configs import CLIPConfig
from perceptor_tpu.models.clip.convert import from_openclip
from perceptor_tpu.models.clip.model import Transformer, VisionTransformer
from perceptor_tpu.models.open_clip import CLIP_MEAN, CLIP_STD, _l2_normalize
from perceptor_tpu.ops.attention import causal_mask
from perceptor_tpu.ops.resize import resize
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict

MODEL_CONFIGS = {
    # embed, resolution, v_layers, v_width, patch, ctx, vocab, t_width, t_heads, t_layers
    "ruclip-vit-base-patch32-224": (512, 224, 12, 768, 32, 77, 49408, 512, 8, 12),
    "ruclip-vit-base-patch16-224": (512, 224, 12, 768, 16, 77, 49408, 512, 8, 12),
    "ruclip-vit-large-patch14-224": (768, 224, 24, 1024, 14, 77, 49408, 768, 12, 12),
    "ruclip-vit-large-patch14-336": (768, 336, 24, 1024, 14, 77, 49408, 768, 12, 12),
    "ruclip-vit-base-patch32-384": (512, 384, 12, 768, 32, 77, 49408, 512, 8, 12),
    "ruclip-vit-base-patch16-384": (512, 384, 12, 768, 16, 77, 49408, 512, 8, 12),
    "tiny": (16, 32, 2, 32, 16, 16, 64, 32, 2, 2),
}

EOS_ID = 3


class RuCLIPTextTransformer(nn.Module):
    """Same tree as clip.model.TextTransformer but pooled at eos_id
    (reference model.py:205-226)."""

    config: CLIPConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        cfg = self.config
        token_embedding = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.text_width),
        )
        positional = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (cfg.context_length, cfg.text_width),
        )
        x = token_embedding[tokens].astype(self.dtype)
        x = x + positional[: tokens.shape[1]].astype(self.dtype)
        x = Transformer(
            cfg.text_width, cfg.text_layers, cfg.text_heads, cfg.quick_gelu,
            dtype=self.dtype, name="transformer",
        )(x, causal_mask(tokens.shape[1]))
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x)
        eos = jnp.argmax((tokens == EOS_ID).astype(jnp.int32), axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eos]
        text_projection = self.param(
            "text_projection", nn.initializers.normal(cfg.text_width**-0.5),
            (cfg.text_width, cfg.embed_dim),
        )
        return (
            pooled.astype(self.dtype) @ text_projection.astype(self.dtype)
        ).astype(jnp.float32)


@utils.cache
class RuCLIP:
    def __init__(self, name: str = "ruclip-vit-base-patch32-224",
                 tokenizer: Optional[Callable] = None):
        """(reference ruclip.py:9-42). `tokenizer(texts) -> (N, ctx) int ids`
        must produce youtokentome ids with bos=2/eos=3/pad=0; the bpe.model
        file itself is resolved from the checkpoint cache."""
        if name not in MODEL_CONFIGS:
            raise ValueError(f"unknown ruclip model: {name}")
        self.name = name
        (embed, res, v_layers, v_width, patch, ctx, vocab, t_width, t_heads,
         t_layers) = MODEL_CONFIGS[name]
        self.config = CLIPConfig(
            embed_dim=embed, image_size=(res, res), vision_layers=v_layers,
            vision_width=v_width, vision_heads=max(1, v_width // 64),
            patch_size=patch,
            context_length=ctx, vocab_size=vocab, text_width=t_width,
            text_heads=t_heads, text_layers=t_layers, quick_gelu=True,
        )
        self.visual = VisionTransformer(self.config, dtype=jnp.bfloat16)
        self.text = RuCLIPTextTransformer(self.config, dtype=jnp.bfloat16)
        self._tokenizer = tokenizer

        path = find_checkpoint(f"ruclip_{name}", name)
        if path is not None:
            converted = from_openclip(load_state_dict(path), self.config)
            self.params = jax.device_put(
                {"visual": converted["visual"], "text": converted["text"]},
                jax.devices()[0],
            )
        else:
            key = jax.random.PRNGKey(0)
            self.params = {
                "visual": init_by_shape(
                    self.visual.init, key, jnp.zeros((1, 3, res, res))
                )["params"],
                "text": init_by_shape(
                    self.text.init, key, jnp.zeros((1, ctx), jnp.int32)
                )["params"],
            }
        self._jit_text = jax.jit(
            lambda params, tokens: self.text.apply({"params": params["text"]}, tokens)
        )
        self._jit_image = jax.jit(self.encode_images_fn)

    def tokenize(self, texts: Sequence[str]) -> np.ndarray:
        if self._tokenizer is None:
            raise ValueError(
                "RuCLIP tokenization needs the youtokentome bpe.model; pass "
                "tokenizer= (a callable texts -> (N, ctx) int ids)"
            )
        return np.asarray(self._tokenizer(list(texts)), dtype=np.int32)

    def encode_texts(self, text_prompts) -> jax.Array:
        tokens = self.tokenize(text_prompts)
        return _l2_normalize(self._jit_text(self.params, jnp.asarray(tokens)))

    def encode_images_fn(self, params, images) -> jax.Array:
        size = self.config.image_size
        if images.shape[-2:] != tuple(size):
            images = resize(images, out_shape=size)
        mean = jnp.asarray(CLIP_MEAN).reshape(1, 3, 1, 1)
        std = jnp.asarray(CLIP_STD).reshape(1, 3, 1, 1)
        encodings = self.visual.apply(
            {"params": params["visual"]}, (images - mean) / std
        )
        return _l2_normalize(encodings)

    def encode_images(self, images) -> jax.Array:
        return self._jit_image(self.params, images)
