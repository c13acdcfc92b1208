"""k-diffusion-style EDM UNet for MonsterDiffusion (48x48 sprites).

Functional spec: reference perceptor/models/monster_diffusion/base/model.py:143-233
and base/layers.py: AdaGN (cond -> GroupNorm scale/shift), GELU ResConvBlocks,
AdaGN-normed self-attention, fixed linear-blur FIR down/upsampling, Fourier
time features + 9-dim augmentation mapping conditioning.

Config (model.py:146-156): depths [2,4,4], channels [128,256,512],
self-attn at depths 1-2, feats_in 256, mapping_cond_dim 9.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from perceptor_tpu.models.velocity_diffusion.net import FourierFeatures
from perceptor_tpu.ops.attention import attention
from perceptor_tpu.ops.groupnorm import fused_group_norm_act
from perceptor_tpu.ops.upfirdn import fir_downsample_2x, fir_upsample_2x


@dataclasses.dataclass(frozen=True)
class MonsterConfig:
    in_channels: int = 3
    feats_in: int = 256
    depths: Tuple[int, ...] = (2, 4, 4)
    channels: Tuple[int, ...] = (128, 256, 512)
    self_attn_depths: Tuple[bool, ...] = (False, True, True)
    mapping_cond_dim: int = 9
    group_size: int = 32
    head_size: int = 64


TINY = MonsterConfig(
    feats_in=16, depths=(1, 1), channels=(16, 32), self_attn_depths=(False, True),
    group_size=8, head_size=16,
)
MODEL_CONFIGS = {"all": MonsterConfig(), "tiny-hero": MonsterConfig(), "tiny": TINY}


class AdaGN(nn.Module):
    """GroupNorm modulated by cond: act(gn(x)*(w+1)+b) (base/layers.py:93-108),
    as one fused custom-VJP op (ops/groupnorm.py); callers fold their
    following activation in via `activation`."""

    num_groups: int
    dtype: jnp.dtype = jnp.float32
    activation: str = "none"

    @nn.compact
    def __call__(self, x, cond):
        weight_bias = nn.Dense(x.shape[-1] * 2, dtype=self.dtype, name="mapper")(cond)
        weight, bias = jnp.split(weight_bias, 2, axis=-1)
        return fused_group_norm_act(
            x, weight + 1.0, bias, self.num_groups, 1e-5, self.dtype,
            self.activation,
        )


class ResConvBlock(nn.Module):
    """AdaGN-GELU-conv twice + 1x1 skip (base/model.py:8-21)."""

    c_mid: int
    c_out: int
    group_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        c_in = x.shape[-1]
        h = AdaGN(
            max(1, c_in // self.group_size), self.dtype, activation="gelu",
            name="norm1",
        )(x, cond)
        h = nn.Conv(self.c_mid, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = AdaGN(
            max(1, self.c_mid // self.group_size), self.dtype,
            activation="gelu", name="norm2",
        )(h, cond)
        h = nn.Conv(self.c_out, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if c_in != self.c_out:
            x = nn.Conv(
                self.c_out, (1, 1), use_bias=False, dtype=self.dtype, name="skip"
            )(x)
        return x + h


class SelfAttention2d(nn.Module):
    """AdaGN-normed MHA over HW tokens (base/layers.py:114-134)."""

    n_head: int
    num_groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        n, h, w, c = x.shape
        y = AdaGN(self.num_groups, self.dtype, name="norm_in")(x, cond)
        qkv = nn.Conv(c * 3, (1, 1), dtype=self.dtype, name="qkv_proj")(y)
        qkv = qkv.reshape(n, h * w, 3, self.n_head, c // self.n_head)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        y = attention(q, k, v)
        y = y.transpose(0, 2, 1, 3).reshape(n, h, w, c)
        return x + nn.Conv(c, (1, 1), dtype=self.dtype, name="out_proj")(y)


class MonsterUNet(nn.Module):
    """__call__(xs NCHW, time_features (N,), mapping_cond (N,9)) -> NCHW.

    This is the *inner* model; EDM c_skip/c_out/c_in/c_noise preconditioning
    lives in the wrapper (reference monster_diffusion.py:85-101).
    """

    config: MonsterConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, time_features, mapping_cond=None):
        cfg = self.config
        if time_features.ndim == 0:
            time_features = jnp.broadcast_to(time_features, (xs.shape[0],))

        t_embed = FourierFeatures(cfg.feats_in, name="timestep_embed")(
            time_features.astype(jnp.float32)[:, None]
        )
        if mapping_cond is None:
            cond_embed = jnp.zeros_like(t_embed)
        else:
            cond_embed = nn.Dense(
                cfg.feats_in, use_bias=False, dtype=self.dtype, name="mapping_cond"
            )(mapping_cond.astype(self.dtype))
        h = (t_embed + cond_embed).astype(self.dtype)
        h = jax.nn.gelu(
            nn.Dense(cfg.feats_in, dtype=self.dtype, name="mapping_0")(h),
            approximate=False,
        )
        cond = jax.nn.gelu(
            nn.Dense(cfg.feats_in, dtype=self.dtype, name="mapping_1")(h),
            approximate=False,
        )

        x = xs.transpose(0, 2, 3, 1).astype(self.dtype)
        x = nn.Conv(cfg.channels[0], (1, 1), dtype=self.dtype, name="proj_in")(x)

        def blocks(kind, i, x):
            """DBlock/UBlock block runs (base/model.py:24-123): j-th block is
            (c_mid -> c_mid) except the last which emits the block's c_out."""
            depth = cfg.depths[i]
            c_mid = cfg.channels[i]
            if kind == "d":
                block_c_out = cfg.channels[i]
            else:
                block_c_out = cfg.channels[i] if i == 0 else cfg.channels[i - 1]
            for j in range(depth):
                c_out = c_mid if j < depth - 1 else block_c_out
                x = ResConvBlock(
                    c_mid, c_out, cfg.group_size, self.dtype,
                    name=f"{kind}_{i}_res_{j}",
                )(x, cond)
                if cfg.self_attn_depths[i]:
                    x = SelfAttention2d(
                        max(1, c_out // cfg.head_size),
                        max(1, c_out // cfg.group_size),
                        self.dtype,
                        name=f"{kind}_{i}_attn_{j}",
                    )(x, cond)
            return x

        # down path (skips collected AFTER each block, model.py UNet :262-270)
        skips = []
        for i in range(len(cfg.depths)):
            if i > 0:
                x = x.transpose(0, 3, 1, 2)
                x = fir_downsample_2x(x)
                x = x.transpose(0, 2, 3, 1)
            x = blocks("d", i, x)
            skips.append(x)

        # up path: innermost consumes its own output (no concat), others concat
        for idx, i in enumerate(reversed(range(len(cfg.depths)))):
            if idx > 0:
                x = jnp.concatenate([x, skips[i]], axis=-1)
            x = blocks("u", i, x)
            if i > 0:
                x = x.transpose(0, 3, 1, 2)
                x = fir_upsample_2x(x)
                x = x.transpose(0, 2, 3, 1)

        x = nn.Conv(cfg.in_channels, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x.transpose(0, 3, 1, 2).astype(jnp.float32)
