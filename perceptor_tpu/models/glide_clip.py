"""GLIDE noise-aware CLIP in flax.

Functional spec: reference perceptor/models/glide_clip/ — glide_clip.py:15-60
wrapper (encodes DIFFUSED images at timestep t), encoders.py: text tower
(token+pos embedding, pre-LN blocks with biasless K projections, causal
dense attention, features taken at position len-1) and image tower (patch
conv with CLIP channel means/stds on [0,255] input, timestep embedding as
the start token, post-embedding LayerNorm, dense attention, token-0
features), config.yml (64px, patch 4, 512 embd, 12 blocks, timestep-aware).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from perceptor_tpu import utils
from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer
from perceptor_tpu.models.open_clip import _l2_normalize
from perceptor_tpu.ops.attention import causal_mask, dot_product_attention
from perceptor_tpu.ops.resize import resize
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict

CHANNEL_MEANS = (122.77093945, 116.74601272, 104.09373519)
CHANNEL_STDS = (68.50053285, 66.63215831, 70.32316309)


@dataclasses.dataclass(frozen=True)
class GlideCLIPConfig:
    image_size: int = 64
    patch_size: int = 4
    n_vocab: int = 65536
    max_text_len: int = 77
    n_embd: int = 512
    text_heads: int = 8
    text_blocks: int = 12
    image_heads: int = 12
    image_blocks: int = 12
    head_state: int = 64
    n_timestep: int = 1000
    logit_scale: float = 100.0


TINY = GlideCLIPConfig(
    image_size=32, patch_size=16, n_vocab=64, max_text_len=16, n_embd=16,
    text_heads=2, text_blocks=2, image_heads=2, image_blocks=2, head_state=8,
    n_timestep=10,
)
CONFIGS = {"default": GlideCLIPConfig(), "tiny": TINY}


class _GlideBlock(nn.Module):
    """Pre-LN block: attention (K has no bias) + GELU MLP
    (encoders.py:147-315)."""

    heads: int
    causal: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, s, d = x.shape
        head_dim = d // self.heads
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="attn_ln")(x)
        h = h.astype(self.dtype)

        def proj(name, bias):
            out = nn.Dense(d, use_bias=bias, dtype=self.dtype, name=name)(h)
            return out.reshape(b, s, self.heads, head_dim).transpose(0, 2, 1, 3)

        q = proj("f_q", True)
        k = proj("f_k", False)
        v = proj("f_v", True)
        mask = causal_mask(s) if self.causal else None
        attn = dot_product_attention(q, k, v, mask=mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="f_c")(attn)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="mlp_ln")(x)
        h = nn.Dense(d * 4, dtype=self.dtype, name="f_1")(h.astype(self.dtype))
        h = jax.nn.gelu(h, approximate=False)
        return x + nn.Dense(d, dtype=self.dtype, name="f_2")(h)


class GlideTextEncoder(nn.Module):
    config: GlideCLIPConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, text_lens):
        cfg = self.config
        n_state = cfg.text_heads * cfg.head_state
        w_voc = self.param(
            "w_voc", nn.initializers.normal(0.02), (cfg.n_vocab, n_state)
        )
        w_pos = self.param(
            "w_pos", nn.initializers.normal(0.01), (cfg.max_text_len, n_state)
        )
        x = w_voc[tokens].astype(self.dtype) + w_pos[None].astype(self.dtype)
        for i in range(cfg.text_blocks):
            x = _GlideBlock(
                cfg.text_heads, causal=True, dtype=self.dtype, name=f"block_{i}"
            )(x)
        # feature at position len-1 (encoders.py TextFeatureExtractor)
        pooled = x[jnp.arange(x.shape[0]), text_lens - 1]
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="out_ln")(pooled)
        return nn.Dense(
            cfg.n_embd, use_bias=False, dtype=self.dtype, name="out_proj"
        )(pooled.astype(self.dtype)).astype(jnp.float32)


class GlideImageEncoder(nn.Module):
    config: GlideCLIPConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, timesteps):
        """images (N,3,H,W) in [0,255]; timesteps (N,) int."""
        cfg = self.config
        n_state = cfg.image_heads * cfg.head_state
        means = jnp.asarray(CHANNEL_MEANS).reshape(1, 3, 1, 1)
        stds = jnp.asarray(CHANNEL_STDS).reshape(1, 3, 1, 1)
        x = (images - means) / stds
        from perceptor_tpu.models.patch_embed import PatchEmbed

        x = PatchEmbed(
            n_state, cfg.patch_size, use_bias=False,
            dtype=self.dtype, name="patch_proj",
        )(x.transpose(0, 2, 3, 1).astype(self.dtype))
        n, gh, gw, _ = x.shape
        x = x.reshape(n, gh * gw, n_state)
        w_t = self.param(
            "w_t", nn.initializers.normal(n_state**-0.5),
            (cfg.n_timestep, n_state),
        )
        sot = w_t[timesteps][:, None].astype(self.dtype)
        w_pos = self.param(
            "w_pos", nn.initializers.normal(n_state**-0.5),
            (1 + gh * gw, n_state),
        )
        x = jnp.concatenate([sot, x], axis=1) + w_pos[None].astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="embed_ln")(x)
        x = x.astype(self.dtype)
        for i in range(cfg.image_blocks):
            x = _GlideBlock(
                cfg.image_heads, causal=False, dtype=self.dtype, name=f"block_{i}"
            )(x)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="out_ln")(x[:, 0])
        return nn.Dense(
            cfg.n_embd, use_bias=False, dtype=self.dtype, name="out_proj"
        )(pooled.astype(self.dtype)).astype(jnp.float32)


def _convert_tower(sd: Dict, prefix: str, n_blocks: int) -> Dict:
    from perceptor_tpu.models.clip.convert import _np

    def linear(name, bias=True):
        out = {"kernel": _np(sd[f"{name}.w"]).T if f"{name}.w" in sd else
               _np(sd[f"{name}.weight"]).T}
        key_b = f"{name}.b" if f"{name}.b" in sd else f"{name}.bias"
        if bias and key_b in sd:
            out["bias"] = _np(sd[key_b])
        return out

    def ln(name):
        g = f"{name}.g" if f"{name}.g" in sd else f"{name}.weight"
        b = f"{name}.b" if f"{name}.b" in sd else f"{name}.bias"
        return {"scale": _np(sd[g]), "bias": _np(sd[b])}

    params: Dict = {}
    for i in range(n_blocks):
        bp = f"{prefix}blocks.block_{i}"
        params[f"block_{i}"] = {
            "attn_ln": ln(f"{bp}.f_attn.ln"),
            "f_q": linear(f"{bp}.f_attn.f_q"),
            "f_k": linear(f"{bp}.f_attn.f_k", bias=False),
            "f_v": linear(f"{bp}.f_attn.f_v"),
            "f_c": linear(f"{bp}.f_attn.f_c"),
            "mlp_ln": ln(f"{bp}.f_mlp.ln"),
            "f_1": linear(f"{bp}.f_mlp.f_1"),
            "f_2": linear(f"{bp}.f_mlp.f_2"),
        }
    params["out_ln"] = ln(f"{prefix}blocks.output.ln")
    params["out_proj"] = linear(f"{prefix}blocks.output.f", bias=False)
    return params


def convert_glide_text(sd: Dict, cfg: GlideCLIPConfig) -> Dict:
    from perceptor_tpu.models.clip.convert import _np

    params = _convert_tower(sd, "", cfg.text_blocks)
    params["w_voc"] = _np(sd["blocks.input.w_voc"])
    params["w_pos"] = _np(sd["blocks.input.w_pos"])
    return params


def convert_glide_image(sd: Dict, cfg: GlideCLIPConfig) -> Dict:
    from perceptor_tpu.models.clip.convert import _np

    params = _convert_tower(sd, "", cfg.image_blocks)
    params["patch_proj"] = {
        "kernel": _np(sd["blocks.input.patch_proj"]).transpose(2, 3, 1, 0)
    }
    params["w_pos"] = _np(sd["blocks.input.w_pos"])
    params["w_t"] = _np(sd["blocks.input.w_t"])
    params["embed_ln"] = {
        "scale": _np(sd["blocks.input.ln.g"]),
        "bias": _np(sd["blocks.input.ln.b"]),
    }
    return params


@utils.cache
class GlideCLIP:
    def __init__(self, name: str = "default",
                 tokenizer: Optional[SimpleTokenizer] = None):
        """(reference glide_clip.py:16-37). CLIP model trained on noisy
        images: encode_images takes (diffused, ts)."""
        if name not in CONFIGS:
            raise ValueError(f"unknown glide clip config: {name}")
        cfg = CONFIGS[name]
        self.config = cfg
        self.logit_scale = cfg.logit_scale
        self.text_encoder = GlideTextEncoder(cfg, dtype=jnp.bfloat16)
        self.image_encoder = GlideImageEncoder(cfg, dtype=jnp.bfloat16)
        self._tokenizer = tokenizer

        text_path = find_checkpoint("glide_clip_text_enc", "clip_text_enc")
        image_path = find_checkpoint("glide_clip_image_enc", "clip_image_enc")
        key = jax.random.PRNGKey(0)
        if text_path is not None and image_path is not None:
            self.params = jax.device_put(
                {
                    "text": convert_glide_text(load_state_dict(text_path), cfg),
                    "image": convert_glide_image(load_state_dict(image_path), cfg),
                },
                jax.devices()[0],
            )
        else:
            self.params = {
                "text": init_by_shape(
                    self.text_encoder.init, key,
                    jnp.zeros((1, cfg.max_text_len), jnp.int32),
                    jnp.ones((1,), jnp.int32),
                )["params"],
                "image": init_by_shape(
                    self.image_encoder.init, key,
                    jnp.zeros((1, 3, cfg.image_size, cfg.image_size)),
                    jnp.zeros((1,), jnp.int32),
                )["params"],
            }
        self._jit_text = jax.jit(
            lambda params, tokens, lens: self.text_encoder.apply(
                {"params": params["text"]}, tokens, lens
            )
        )
        self._jit_image = jax.jit(self.encode_images_fn)

    @property
    def tokenizer(self) -> SimpleTokenizer:
        if self._tokenizer is None:
            self._tokenizer = SimpleTokenizer()
        return self._tokenizer

    def encode_texts(self, text_prompts: List[str]) -> jax.Array:
        """(reference glide_clip.py:43-45 + model_creation.py:32-48):
        pooled at the last token position."""
        cfg = self.config
        rows, lens = [], []
        for prompt in text_prompts:
            ids = self.tokenizer.encode(prompt)[: cfg.max_text_len]
            lens.append(max(len(ids), 1))
            rows.append(ids + [0] * (cfg.max_text_len - len(ids)))
        encodings = self._jit_text(
            self.params,
            jnp.asarray(np.asarray(rows, np.int32) % cfg.n_vocab),
            jnp.asarray(lens, jnp.int32),
        )
        return _l2_normalize(encodings)

    def encode_images_fn(self, params, diffused, ts):
        """(reference glide_clip.py:47-58): diffused [0,1] -> x-space ->
        [0,255] tower input."""
        size = (self.config.image_size, self.config.image_size)
        if diffused.shape[-2:] != size:
            diffused = resize(diffused, out_shape=size)
        images = (diffused * 2.0 - 1.0 + 1.0) * 127.5
        encodings = self.image_encoder.apply(
            {"params": params["image"]}, images, ts.astype(jnp.int32)
        )
        return _l2_normalize(encodings)

    def encode_images(self, diffused, ts) -> jax.Array:
        return self._jit_image(self.params, diffused, jnp.atleast_1d(jnp.asarray(ts)))
