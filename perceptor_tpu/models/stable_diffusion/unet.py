"""Stable Diffusion UNet (UNet2DConditionModel-compatible) in flax.linen.

Functional spec: the UNet wrapped at reference
perceptor/models/stable_diffusion/stable_diffusion.py:86-97 with the
vendored attention stack (stable_diffusion/attention.py:120-348:
SpatialTransformer, CrossAttention, GEGLU feed-forward) and the xformers
flash-attention monkeypatch (attention.py:285) — here replaced by
perceptor_tpu.ops.attention (Pallas flash kernel on long sequences).

TPU-native design:
  - public boundary NCHW (reference parity); internals NHWC, the native
    XLA TPU conv layout, converted exactly once at entry/exit.
  - bf16 compute / fp32 params + GroupNorm/LayerNorm/softmax (the TPU
    analogue of the reference's fp16 autocast, stable_diffusion.py:86-97).
  - optional `remat` (jax.checkpoint) per block — replaces the
    reference's attention_slicing memory workaround
    (stable_diffusion.py:102-106) when differentiating through the UNet.
  - module names mirror the diffusers state_dict layout so
    convert.py is a mechanical rename + transpose.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from perceptor_tpu.models.attention_proj import HeadMergeProj, HeadProj
from perceptor_tpu.models.stable_diffusion.config import UNetConfig
from perceptor_tpu.ops.attention import attention, flash_route
from perceptor_tpu.ops.conv_matmul import Conv3x3
from perceptor_tpu.ops.groupnorm import GroupNormSiLU
from perceptor_tpu.ops.upsample_conv import nearest_upsample_2x
from perceptor_tpu.parallel.plan import shard_spatial


def timestep_embedding(timesteps, dim: int, max_period: float = 10000.0):
    """Sinusoidal embedding, [cos | sin] order (functional spec:
    reference ldm/modules/diffusionmodules/util.py:192-212)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.pad(embedding, ((0, 0), (0, 1)))
    return embedding


class TimestepEmbedding(nn.Module):
    """2-layer SiLU MLP over the sinusoidal embedding (diffusers naming)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb):
        emb = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(emb)
        emb = jax.nn.silu(emb)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(emb)


def group_norm(x, name: str, epsilon: float = 1e-5):
    # 32 groups (diffusers norm_num_groups); tiny test configs have <32
    # channels, where one group per channel keeps the op well-defined.
    return nn.GroupNorm(
        num_groups=min(32, x.shape[-1]), epsilon=epsilon, dtype=jnp.float32, name=name
    )(x)


class ResnetBlock(nn.Module):
    """GN-SiLU-conv + time-shift + GN-SiLU-conv with skip (diffusers
    ResnetBlock2D semantics). NHWC."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        h = GroupNormSiLU(out_dtype=self.dtype, name="norm1")(x)
        h = Conv3x3(self.out_channels, dtype=self.dtype, name="conv1"
        )(h)
        emb_out = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
            jax.nn.silu(emb).astype(self.dtype)
        )
        h = h + emb_out[:, None, None, :]
        h = GroupNormSiLU(out_dtype=self.dtype, name="norm2")(h)
        h = Conv3x3(self.out_channels, dtype=self.dtype, name="conv2"
        )(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x.astype(self.dtype))
        return x + h


# projection form for CrossAttention: "einsum" folds the head
# split/merge transposes into the projection matmuls; "dense" is the
# plain nn.Dense + reshape/transpose form (kept for A/B;
# scripts/profile_sample.py showed the transposed intermediates cost
# ~0.9 ms/step at L0 as 42 TF/s add-fusions with {1,2,0} layouts).
ATTN_PROJ = "einsum"

# Emit flash-bound q/k/v with head_dim pre-padded to the 128-lane width
# from the projection weights (True, the round-2 default) or at the true
# head_dim (False: Mosaic pads kernel tiles internally; 3.2x fewer
# q/k/v HBM bytes at SD's d40 levels). A/B per resolution:
# scripts/ab_emit_pad.py.
EMIT_LANE_PAD = True


class CrossAttention(nn.Module):
    """Multi-head attention, q from x, k/v from context (self-attn when
    context is None). Spec: reference stable_diffusion/attention.py:250-299;
    the xformers call at :285 is replaced by ops.attention."""

    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.dim_head
        b, s, _ = x.shape
        sk = context.shape[1]

        if ATTN_PROJ == "einsum":
            # When the flash kernel will run (long self-attention), emit
            # head_dim already padded to its 128-lane width from the
            # projection weights: the activation-sized pad/slice copies
            # around every kernel call (q/k/v in, out back — 4 HBM
            # round-trips per site, fwd AND bwd) collapse into zero
            # weight columns/rows. Numerics identical; softmax scale uses
            # the true head_dim. EMIT_LANE_PAD=False emits the TRUE
            # head_dim instead (Mosaic pads kernel tiles internally) —
            # 3.2x fewer q/k/v HBM bytes at d40; A/B'd per resolution in
            # scripts/ab_emit_pad.py (docs/PERFORMANCE.md round-5 study).
            emit = self.dim_head
            if EMIT_LANE_PAD and flash_route(s, sk):
                emit += (-self.dim_head) % 128

            def head_proj(name):
                return HeadProj(
                    self.heads, self.dim_head, use_bias=False,
                    dtype=self.dtype, emit_dim=emit, name=name,
                )

            q = head_proj("to_q")(x)
            k = head_proj("to_k")(context)
            v = head_proj("to_v")(context)
            out = attention(q, k, v, scale=1.0 / math.sqrt(self.dim_head))
            return HeadMergeProj(
                inner, self.heads, self.dim_head, dtype=self.dtype,
                name="to_out_0",
            )(out)

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)

        def split(t, seq):
            return t.reshape(b, seq, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        out = attention(split(q, s), split(k, sk), split(v, sk))
        out = out.transpose(0, 2, 1, 3).reshape(b, s, inner)
        return nn.Dense(inner, dtype=self.dtype, name="to_out_0")(out)


class FeedForward(nn.Module):
    """GEGLU feed-forward (spec: reference attention.py:301-348)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = nn.Dense(self.dim * 8, dtype=self.dtype, name="net_0_proj")(x)
        value, gate = jnp.split(hidden, 2, axis=-1)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(
            value * jax.nn.gelu(gate, approximate=False)
        )


class BasicTransformerBlock(nn.Module):
    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        def ln(name):
            return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)

        x = x + CrossAttention(self.heads, self.dim_head, self.dtype, name="attn1")(
            ln("norm1")(x).astype(self.dtype)
        )
        x = x + CrossAttention(self.heads, self.dim_head, self.dtype, name="attn2")(
            ln("norm2")(x).astype(self.dtype), context
        )
        x = x + FeedForward(
            self.heads * self.dim_head, self.dtype, name="ff"
        )(ln("norm3")(x).astype(self.dtype))
        return x


class SpatialTransformer(nn.Module):
    """GN -> 1x1 proj_in -> transformer blocks over HW tokens -> 1x1
    proj_out + residual (spec: reference attention.py:120-247). NHWC."""

    heads: int
    dim_head: int
    depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        residual = x
        x = group_norm(x, "norm", epsilon=1e-6)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(x.astype(self.dtype))
        x = x.reshape(b, h * w, c)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.heads, self.dim_head, self.dtype, name=f"transformer_blocks_{i}"
            )(x, context)
        x = x.reshape(b, h, w, c)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual


class Downsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
            name="conv",
        )(x)


class Upsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nearest_upsample_2x(x)
        return Conv3x3(self.channels, dtype=self.dtype, name="conv")(x)


class UNet(nn.Module):
    """UNet2DConditionModel-compatible denoiser.

    __call__(latents NCHW, timesteps (N,), context (N, S, context_dim))
    -> predicted noise, NCHW.
    """

    config: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents, timesteps, context, cache=None, return_cache=False):
        """Denoise. Two STATIC (python-level) extras enable DeepCache-style
        block caching ("Cache Me if You Can", arXiv:2312.03209 — reuse the
        deep U across adjacent timesteps, recompute only the shallowest
        level):

          - return_cache=True: also return the deep feature entering the
            last (shallowest) up level — `(out, cache)`.
          - cache=<that feature>: skip down levels 1.., mid, and up levels
            ..n-2 entirely; run conv_in + down level 0 + the last up level
            + head against the provided cache.

        Both paths declare identical param names (the partial path a
        subset), so one param tree serves all modes. Numerics of the full
        path are unchanged.
        """
        cfg = self.config
        channels = cfg.block_channels
        time_dim = channels[0] * 4

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (latents.shape[0],))

        res_block = ResnetBlock
        transformer = SpatialTransformer
        if cfg.remat:
            res_block = nn.remat(ResnetBlock)
            transformer = nn.remat(SpatialTransformer)

        emb = timestep_embedding(timesteps, channels[0])
        emb = TimestepEmbedding(time_dim, dtype=self.dtype, name="time_embedding")(emb)

        x = latents.transpose(0, 2, 3, 1).astype(self.dtype)  # NCHW -> NHWC
        # under a context-parallel plan, pin H to the context axis once at
        # entry — GSPMD propagates the spatial sharding through the conv
        # body (3x3 halo exchanges) and into the attention token reshapes
        x = shard_spatial(x)
        context = context.astype(self.dtype)

        x = Conv3x3(channels[0], dtype=self.dtype, name="conv_in")(x)
        skips = [x]
        n_levels = len(channels)

        def down_level(i, x):
            ch = channels[i]
            dim_head = ch // cfg.n_heads
            for j in range(cfg.n_res_blocks):
                x = res_block(
                    ch, dtype=self.dtype, name=f"down_blocks_{i}_resnets_{j}"
                )(x, emb)
                if cfg.cross_attention[i]:
                    x = transformer(
                        cfg.n_heads,
                        dim_head,
                        cfg.transformer_depth,
                        dtype=self.dtype,
                        name=f"down_blocks_{i}_attentions_{j}",
                    )(x, context)
                skips.append(x)
            return x

        def up_level(i, x):
            level = n_levels - 1 - i
            ch = channels[level]
            dim_head = ch // cfg.n_heads
            for j in range(cfg.n_res_blocks + 1):
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = res_block(
                    ch, dtype=self.dtype, name=f"up_blocks_{i}_resnets_{j}"
                )(x, emb)
                if cfg.cross_attention[level]:
                    x = transformer(
                        cfg.n_heads,
                        dim_head,
                        cfg.transformer_depth,
                        dtype=self.dtype,
                        name=f"up_blocks_{i}_attentions_{j}",
                    )(x, context)
            if level > 0:
                x = Upsample(
                    ch, dtype=self.dtype, name=f"up_blocks_{i}_upsamplers_0"
                )(x)
            return x

        if cache is not None:
            # partial pass: shallow level only, deep U comes from cache
            down_level(0, x)
            x = cache.astype(self.dtype)
            x = up_level(n_levels - 1, x)
        else:
            # -- down --
            for i in range(n_levels):
                x = down_level(i, x)
                if i < n_levels - 1:
                    x = Downsample(
                        channels[i],
                        dtype=self.dtype,
                        name=f"down_blocks_{i}_downsamplers_0",
                    )(x)
                    skips.append(x)

            # -- mid --
            mid_ch = channels[-1]
            x = res_block(mid_ch, dtype=self.dtype, name="mid_block_resnets_0")(x, emb)
            x = transformer(
                cfg.n_heads,
                mid_ch // cfg.n_heads,
                cfg.transformer_depth,
                dtype=self.dtype,
                name="mid_block_attentions_0",
            )(x, context)
            x = res_block(mid_ch, dtype=self.dtype, name="mid_block_resnets_1")(x, emb)

            # -- up --
            for i in range(n_levels - 1):
                x = up_level(i, x)
            deep_feature = x
            x = up_level(n_levels - 1, x)

        x = GroupNormSiLU(out_dtype=self.dtype, name="conv_norm_out")(x)
        x = Conv3x3(cfg.out_channels, dtype=self.dtype, name="conv_out"
        )(x)
        out = x.transpose(0, 3, 1, 2).astype(jnp.float32)  # NHWC -> NCHW
        if return_cache:
            if cache is not None:
                return out, cache
            return out, deep_feature
        return out
