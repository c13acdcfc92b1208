"""OpenAI ADM UNet in flax.linen.

Functional spec: reference perceptor/models/guided_diffusion/unet.py:389-650
(ResBlock :141 with scale-shift GroupNorm and residual up/downsampling,
AttentionBlock :255 with QKVAttentionLegacy head-interleaved layout :355,
input/middle/output block lists with per-block skip concat).

Module names mirror the torch indices (input_blocks_{i}_{j}, ...) so the
converter is a deterministic rename. NCHW boundary, NHWC internals, bf16
compute with fp32 norms (replaces ADM's convert_to_fp16, fp16_util.py:13-31);
`remat` replaces ADM's use_checkpoint (nn.py:121-189).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from perceptor_tpu.models.attention_proj import HeadMergeProj, HeadProj
from perceptor_tpu.models.guided_diffusion.config import ADMConfig
from perceptor_tpu.models.stable_diffusion.unet import (
    SpatialTransformer,
    timestep_embedding,
)
from perceptor_tpu.ops.attention import attention, flash_route
from perceptor_tpu.ops.conv_matmul import Conv3x3
from perceptor_tpu.ops.groupnorm import GroupNormSiLU, ScaleShiftGroupNormSiLU
from perceptor_tpu.ops.upsample_conv import nearest_upsample_2x
from perceptor_tpu.parallel.plan import shard_spatial


def group_norm(x, name: str):
    """ADM normalization(): GroupNorm32, eps 1e-5, fp32. Real configs have
    channel counts divisible by 32; tiny test configs fall back to the
    largest common divisor."""
    import math

    return nn.GroupNorm(
        num_groups=math.gcd(32, x.shape[-1]), epsilon=1e-5, dtype=jnp.float32,
        name=name,
    )(x)


def _nearest_up(x):
    return nearest_upsample_2x(x)


def _avg_down(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ResBlock(nn.Module):
    """Reference unet.py:141-253. up/down move resampling inside the block
    (h path after the first norm-silu, x path in parallel)."""

    out_channels: int
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        import math as _math

        h = GroupNormSiLU(
            num_groups=_math.gcd(32, x.shape[-1]), out_dtype=self.dtype,
            name="norm1",
        )(x)
        if self.up:
            h, x = _nearest_up(h), _nearest_up(x)
        elif self.down:
            h, x = _avg_down(h), _avg_down(x)
        h = Conv3x3(self.out_channels, dtype=self.dtype, name="conv1"
        )(h)

        emb_width = self.out_channels * (2 if self.use_scale_shift_norm else 1)
        emb_out = nn.Dense(emb_width, dtype=self.dtype, name="emb_proj")(
            jax.nn.silu(emb).astype(self.dtype)
        )
        groups2 = _math.gcd(32, self.out_channels)
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = ScaleShiftGroupNormSiLU(
                num_groups=groups2, out_dtype=self.dtype, name="norm2"
            )(h, scale, shift)
        else:
            h = h + emb_out[:, None, None, :]
            h = GroupNormSiLU(
                num_groups=groups2, out_dtype=self.dtype, name="norm2"
            )(h)
        h = Conv3x3(self.out_channels, dtype=self.dtype, name="conv2"
        )(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="skip"
            )(x.astype(self.dtype))
        return x + h


class AttentionBlock(nn.Module):
    """Reference unet.py:255-300 with the Legacy head-interleaved qkv layout
    (unet.py:355-380): channels = [head0(q|k|v), head1(q|k|v), ...]."""

    n_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        d = c // self.n_heads
        y = group_norm(x, "norm")
        # Legacy head-interleaved qkv channel layout (reference
        # unet.py:355-380): channels = [head0(q|k|v), head1(q|k|v), ...]
        # emit head_dim pre-padded to the flash kernel's lane width when
        # that path will run (see stable_diffusion/unet.py CrossAttention)
        emit = d + ((-d) % 128 if flash_route(h * w, h * w) else 0)
        q, k, v = HeadProj(
            self.n_heads, d, n_proj=3, interleave="head", dtype=self.dtype,
            emit_dim=emit, name="qkv",
        )(y.reshape(n, h * w, c).astype(self.dtype))
        y = attention(q, k, v, scale=1.0 / math.sqrt(d))
        y = HeadMergeProj(
            c, self.n_heads, d, dtype=self.dtype, name="proj_out"
        )(y)
        return x + y.reshape(n, h, w, c)


class ADMUNet(nn.Module):
    """__call__(xs NCHW in [-1,1], timesteps (N,)) -> (N, out_channels, H, W)."""

    config: ADMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, timesteps, context=None):
        cfg = self.config
        if cfg.spatial_transformer and context is None:
            raise ValueError("spatial-transformer UNet needs context")
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (xs.shape[0],))

        time_dim = cfg.model_channels * 4
        emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = nn.Dense(time_dim, dtype=self.dtype, name="time_embed_0")(
            emb.astype(self.dtype)
        )
        emb = nn.Dense(time_dim, dtype=self.dtype, name="time_embed_2")(
            jax.nn.silu(emb)
        )

        res_block = nn.remat(ResBlock) if cfg.remat else ResBlock
        if cfg.spatial_transformer:
            transformer = nn.remat(SpatialTransformer) if cfg.remat else SpatialTransformer

            def attn_block(n_heads, dtype, name):
                def apply(x, channels_heads=n_heads):
                    dim_head = x.shape[-1] // channels_heads
                    return transformer(
                        channels_heads, dim_head, cfg.transformer_depth,
                        dtype=dtype, name=name,
                    )(x, context.astype(dtype))
                return apply
        else:
            _attn_cls = nn.remat(AttentionBlock) if cfg.remat else AttentionBlock

            def attn_block(n_heads, dtype, name):
                return _attn_cls(n_heads, dtype=dtype, name=name)

        x = xs.transpose(0, 2, 3, 1).astype(self.dtype)  # NCHW -> NHWC
        x = shard_spatial(x)  # context-parallel plan: pin H to the context axis
        ch = int(cfg.channel_mult[0] * cfg.model_channels)
        x = Conv3x3(ch, dtype=self.dtype, name="input_blocks_0_0")(x)
        skips = [x]
        ds = 1
        index = 1

        # -- input blocks --
        for level, mult in enumerate(cfg.channel_mult):
            out_ch = int(mult * cfg.model_channels)
            for _ in range(cfg.num_res_blocks):
                x = res_block(
                    out_ch,
                    cfg.use_scale_shift_norm,
                    dtype=self.dtype,
                    name=f"input_blocks_{index}_0",
                )(x, emb)
                if ds in cfg.attention_ds:
                    x = attn_block(
                        cfg.heads_for(out_ch), self.dtype,
                        f"input_blocks_{index}_1",
                    )(x)
                skips.append(x)
                index += 1
            if level != len(cfg.channel_mult) - 1:
                if cfg.resblock_updown:
                    x = res_block(
                        out_ch,
                        cfg.use_scale_shift_norm,
                        down=True,
                        dtype=self.dtype,
                        name=f"input_blocks_{index}_0",
                    )(x, emb)
                else:
                    x = nn.Conv(
                        out_ch,
                        (3, 3),
                        strides=(2, 2),
                        padding=1,
                        dtype=self.dtype,
                        name=f"input_blocks_{index}_0_op",
                    )(x)
                skips.append(x)
                index += 1
                ds *= 2

        # -- middle --
        ch = x.shape[-1]
        x = res_block(
            ch, cfg.use_scale_shift_norm, dtype=self.dtype, name="middle_block_0"
        )(x, emb)
        x = attn_block(cfg.heads_for(ch), self.dtype, "middle_block_1")(x)
        x = res_block(
            ch, cfg.use_scale_shift_norm, dtype=self.dtype, name="middle_block_2"
        )(x, emb)

        # -- output blocks --
        index = 0
        for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
            out_ch = int(mult * cfg.model_channels)
            for i in range(cfg.num_res_blocks + 1):
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = res_block(
                    out_ch,
                    cfg.use_scale_shift_norm,
                    dtype=self.dtype,
                    name=f"output_blocks_{index}_0",
                )(x, emb)
                sub = 1
                if ds in cfg.attention_ds:
                    x = attn_block(
                        cfg.heads_for(out_ch), self.dtype,
                        f"output_blocks_{index}_{sub}",
                    )(x)
                    sub += 1
                if level and i == cfg.num_res_blocks:
                    if cfg.resblock_updown:
                        x = res_block(
                            out_ch,
                            cfg.use_scale_shift_norm,
                            up=True,
                            dtype=self.dtype,
                            name=f"output_blocks_{index}_{sub}",
                        )(x, emb)
                    else:
                        x = _nearest_up(x)
                        x = Conv3x3(out_ch,
                            dtype=self.dtype,
                            name=f"output_blocks_{index}_{sub}_conv",
                        )(x)
                    ds //= 2
                index += 1

        import math as _math

        x = GroupNormSiLU(
            num_groups=_math.gcd(32, x.shape[-1]), out_dtype=self.dtype,
            name="out_norm",
        )(x)
        x = Conv3x3(cfg.out_channels, dtype=self.dtype, name="out_conv"
        )(x)
        return x.transpose(0, 3, 1, 2).astype(jnp.float32)
