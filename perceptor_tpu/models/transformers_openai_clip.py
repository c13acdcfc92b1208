"""TransformersOpenAICLIP: the HF-layout CLIP variant.

Functional spec: reference perceptor/models/transformers_openai_clip.py:25-171:
same computation as OpenCLIP with openai weights (the reference keeps both
wrappers and a parity test between them, :155-171) but loads HF
`transformers` CLIPModel checkpoints (split q/k/v, fc1/fc2 naming) and runs
bfloat16. The multilingual M-CLIP text variants are accepted as names but
need their XLM-R text towers' weights; the vision path works identically.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from perceptor_tpu import utils
from perceptor_tpu.models.clip import configs as clip_configs
from perceptor_tpu.models.clip import convert as clip_convert
from perceptor_tpu.models.clip.model import CLIP as CLIPModule
from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer, tokenize
from perceptor_tpu.models.open_clip import (
    CLIP_MEAN,
    CLIP_STD,
    _l2_normalize,
)
from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.ops.resize import resize
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict

# HF model name -> open_clip architecture equivalent.  The laion ids are
# the reference's documented list (transformers_openai_clip.py:38-44);
# laion2B towers use plain GELU, the openai ones quickgelu.
NAME_TO_ARCH = {
    "openai/clip-vit-base-patch32": "ViT-B-32-quickgelu",
    "openai/clip-vit-base-patch16": "ViT-B-16-quickgelu",
    "openai/clip-vit-large-patch14": "ViT-L-14-quickgelu",
    "openai/clip-vit-large-patch14-336": "ViT-L-14-336-quickgelu",
    "laion/CLIP-ViT-H-14-laion2B-s32B-b79K": "ViT-H-14",
    "laion/CLIP-ViT-g-14-laion2B-s12B-b42K": "ViT-g-14",
    "laion/CLIP-ViT-L-14-laion2B-s32B-b82K": "ViT-L-14",
    "laion/CLIP-ViT-B-32-laion2B-s34B-b79K": "ViT-B-32",
}


@utils.cache
class TransformersOpenAICLIP:
    def __init__(self, name: str = "openai/clip-vit-large-patch14",
                 tokenizer: Optional[SimpleTokenizer] = None):
        """(reference transformers_openai_clip.py:26-60)."""
        if name not in NAME_TO_ARCH:
            raise ValueError(
                f"unknown transformers clip model: {name} "
                f"(multilingual M-CLIP variants are not yet supported)"
            )
        self.name = name
        architecture = NAME_TO_ARCH[name]
        self.config = clip_configs.get_config(architecture, "openai")
        self.module = CLIPModule(self.config, dtype=jnp.bfloat16)
        self._tokenizer = tokenizer

        path = find_checkpoint(
            f"transformers_clip_{name.replace('/', '_')}", name
        )
        if path is not None:
            self.params = jax.device_put(
                clip_convert.from_hf(load_state_dict(path), self.config),
                jax.devices()[0],
            )
        else:
            self.params = init_by_shape(
                self.module.init,
                jax.random.PRNGKey(0),
                jnp.zeros((1, 3, *self.config.image_size)),
                jnp.zeros((1, self.config.context_length), jnp.int32),
            )["params"]
        self._jit_text = jax.jit(
            lambda params, tokens: self.module.apply(
                {"params": params}, tokens, method=CLIPModule.encode_text
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
            text_prompts, self.config.context_length, tokenizer=self.tokenizer
        )
        return _l2_normalize(self._jit_text(self.params, jnp.asarray(tokens)))

    def encode_images_fn(self, params, images) -> jax.Array:
        if images.shape[-2:] != tuple(self.config.image_size):
            images = resize(images, out_shape=self.config.image_size)
        mean = jnp.asarray(CLIP_MEAN).reshape(1, 3, 1, 1)
        std = jnp.asarray(CLIP_STD).reshape(1, 3, 1, 1)
        encodings = self.module.apply(
            {"params": params}, (images - mean) / std,
            method=CLIPModule.encode_image,
        )
        return _l2_normalize(encodings)

    def encode_images(self, images) -> jax.Array:
        return self._jit_image(self.params, images)
