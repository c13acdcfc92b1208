"""AutoencoderKL (Stable Diffusion first stage) in flax.linen.

Functional spec: the VAE wrapped at reference
perceptor/models/stable_diffusion/stable_diffusion.py:82-84 (scale 0.18215,
encode :176-192 samples the diagonal posterior, decode :194-198) with the
optional sd-vae-ft-mse decoder swap (:36). Architecture semantics are the
CompVis Encoder/Decoder (reference
models/latent_diffusion/ldm/modules/diffusionmodules/model.py Encoder/Decoder).

Same TPU layout policy as unet.py: NCHW boundary, NHWC internals, bf16
compute with fp32 norms; diffusers state_dict naming for convert.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from perceptor_tpu.models.stable_diffusion.config import VAEConfig
from perceptor_tpu.ops.attention import attention
from perceptor_tpu.ops.conv_matmul import Conv3x3
from perceptor_tpu.ops.groupnorm import GroupNormSiLU
from perceptor_tpu.ops.upsample_conv import nearest_upsample_2x
from perceptor_tpu.parallel.plan import shard_spatial


def group_norm(x, name: str):
    # 32 groups (diffusers norm_num_groups); adapt for tiny test configs.
    return nn.GroupNorm(
        num_groups=min(32, x.shape[-1]), epsilon=1e-6, dtype=jnp.float32, name=name
    )(x)


class ResnetBlock(nn.Module):
    """VAE residual block (no time embedding). NHWC."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupNormSiLU(epsilon=1e-6, out_dtype=self.dtype, name="norm1")(x)
        h = Conv3x3(self.out_channels, dtype=self.dtype, name="conv1")(
            h
        )
        h = GroupNormSiLU(epsilon=1e-6, out_dtype=self.dtype, name="norm2")(h)
        h = Conv3x3(self.out_channels, dtype=self.dtype, name="conv2")(
            h
        )
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x.astype(self.dtype))
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention at the bottleneck (spec:
    reference attention.py:23-118 AttentionBlock with num_head_channels=None)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        x = group_norm(x, "group_norm").astype(self.dtype)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)
        out = attention(q[:, None], k[:, None], v[:, None])[:, 0]
        out = nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)
        return out.reshape(b, h, w, c) + residual


class MidBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32
    use_attention: bool = True

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock(self.channels, dtype=self.dtype, name="resnets_0")(x)
        if self.use_attention:
            x = AttnBlock(dtype=self.dtype, name="attentions_0")(x)
        return ResnetBlock(self.channels, dtype=self.dtype, name="resnets_1")(x)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        channels = cfg.block_channels
        x = Conv3x3(channels[0], dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(channels):
            for j in range(cfg.n_res_blocks):
                x = ResnetBlock(
                    ch, dtype=self.dtype, name=f"down_blocks_{i}_resnets_{j}"
                )(x)
                if i in cfg.encoder_attn_levels:
                    x = AttnBlock(
                        dtype=self.dtype, name=f"down_blocks_{i}_attentions_{j}"
                    )(x)
            if i < len(channels) - 1:
                x = nn.Conv(
                    ch, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)),
                    dtype=self.dtype,
                    name=f"down_blocks_{i}_downsamplers_0_conv",
                )(x)
        x = MidBlock(
            channels[-1], dtype=self.dtype, use_attention=cfg.mid_attention,
            name="mid_block",
        )(x)
        x = GroupNormSiLU(epsilon=1e-6, out_dtype=self.dtype, name="conv_norm_out")(x)
        out_ch = (2 if cfg.double_z else 1) * cfg.latent_channels
        return Conv3x3(out_ch, dtype=self.dtype, name="conv_out"
        )(x.astype(self.dtype))


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        channels = cfg.block_channels
        x = Conv3x3(channels[-1], dtype=self.dtype, name="conv_in")(x)
        x = MidBlock(
            channels[-1], dtype=self.dtype, use_attention=cfg.mid_attention,
            name="mid_block",
        )(x)
        for i, ch in enumerate(reversed(channels)):
            for j in range(cfg.n_res_blocks + 1):
                x = ResnetBlock(
                    ch, dtype=self.dtype, name=f"up_blocks_{i}_resnets_{j}"
                )(x)
                if i in cfg.decoder_attn_levels:
                    x = AttnBlock(
                        dtype=self.dtype, name=f"up_blocks_{i}_attentions_{j}"
                    )(x)
            if i < len(channels) - 1:
                x = nearest_upsample_2x(x)
                x = Conv3x3(ch, dtype=self.dtype,
                    name=f"up_blocks_{i}_upsamplers_0_conv",
                )(x)
        x = GroupNormSiLU(epsilon=1e-6, out_dtype=self.dtype, name="conv_norm_out")(x)
        return Conv3x3(cfg.in_channels, dtype=self.dtype, name="conv_out"
        )(x.astype(self.dtype))


class AutoencoderKL(nn.Module):
    """KL-VAE. Public boundary NCHW in [0,1] image space; latents are
    pre-scaled by `scaling_factor` exactly as the reference exposes them
    (stable_diffusion.py:176-198)."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(
            self.config.latent_channels, (1, 1), name="post_quant_conv"
        )

    def moments(self, images):
        """images NCHW [0,1] -> (mean, logvar) of the latent posterior."""
        x = (images * 2.0 - 1.0).transpose(0, 2, 3, 1).astype(self.dtype)
        x = shard_spatial(x)  # context-parallel plan: spatial sharding
        h = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(h.transpose(0, 3, 1, 2).astype(jnp.float32), 2, axis=1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, images, key=None):
        """Sample (or take the mode when key is None) of the posterior,
        scaled (reference stable_diffusion.py:176-192)."""
        mean, logvar = self.moments(images)
        if key is not None:
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                key, mean.shape, mean.dtype
            )
        return mean * self.config.scaling_factor

    def decode(self, latents):
        """latents NCHW (scaled) -> images NCHW [0,1]
        (reference stable_diffusion.py:194-198)."""
        x = (latents / self.config.scaling_factor).transpose(0, 2, 3, 1)
        x = shard_spatial(x)  # context-parallel plan: spatial sharding
        x = self.post_quant_conv(x.astype(self.dtype))
        x = self.decoder(x)
        images = (x.transpose(0, 3, 1, 2).astype(jnp.float32) + 1.0) / 2.0
        return images

    def __call__(self, images, key=None):
        return self.decode(self.encode(images, key))
