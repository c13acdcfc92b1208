"""v-diffusion UNet (crowsonkb family) in flax.linen.

Functional spec: reference perceptor/models/velocity_diffusion/yfcc_2.py:77-249
(and yfcc_1/cc12m_1/wikiart_256 — same topology, see configs.py):
nested SkipBlocks (concat skip at each resolution), ResConvBlocks
(conv-relu-conv-relu + 1x1 skip), SelfAttention2d after blocks at the
deep levels, FourierFeatures timestep embedding broadcast as input planes,
and (cc12m) FiLM modulation from a CLIP-embedding mapping network.

TPU design notes: NCHW boundary / NHWC internals; bf16 compute; attention
over HW tokens via ops.attention; Python-level recursion unrolls at trace
time into a static graph (jit/scan-safe).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from perceptor_tpu.models.attention_proj import HeadMergeProj, HeadProj
from perceptor_tpu.models.velocity_diffusion.configs import VNetConfig
from perceptor_tpu.ops.attention import attention, flash_route
from perceptor_tpu.ops.groupnorm import fused_group_norm_act
from perceptor_tpu.parallel.plan import shard_spatial


class FourierFeatures(nn.Module):
    """f = 2*pi*x@W^T -> [cos f | sin f] (reference yfcc_2.py:41-49)."""

    out_features: int
    std: float = 1.0

    @nn.compact
    def __call__(self, x):
        weight = self.param(
            "weight",
            nn.initializers.normal(self.std),
            (self.out_features // 2, x.shape[-1]),
        )
        f = 2 * math.pi * x @ weight.astype(jnp.float32).T
        return jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)


class ResConvBlock(nn.Module):
    """conv3x3-relu-conv3x3(-relu) + 1x1 skip (reference yfcc_2.py:17-28).
    NHWC."""

    c_mid: int
    c_out: int
    is_last: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.c_mid, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        h = jax.nn.relu(h)
        h = nn.Conv(self.c_out, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if not self.is_last:
            h = jax.nn.relu(h)
        if x.shape[-1] != self.c_out:
            x = nn.Conv(
                self.c_out, (1, 1), use_bias=False, dtype=self.dtype, name="skip"
            )(x)
        return x + h


class ModConvBlock(nn.Module):
    """cc12m FiLM block: conv-GN(1,no affine)-Modulation-relu twice + skip
    (reference cc12m_1.py:33-61)."""

    c_mid: int
    c_out: int
    is_last: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        def modulate_relu(h, name):
            # fused GN(1, no affine) + per-sample affine + ReLU (one
            # custom-VJP op, ops/groupnorm.py); the reference's AdaGN2d
            # (cc12m_1.py:33-46) has no learned GN affine, so the (N, C)
            # emb-derived pair is the whole affine
            scale_shift = nn.Dense(
                h.shape[-1] * 2, use_bias=False, dtype=self.dtype, name=f"{name}_mod"
            )(cond)
            scales, shifts = jnp.split(scale_shift, 2, axis=-1)
            return fused_group_norm_act(
                h, scales + 1.0, shifts, 1, 1e-5, self.dtype, "relu"
            )

        h = nn.Conv(self.c_mid, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        h = modulate_relu(h, "mod1")
        h = nn.Conv(self.c_out, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if not self.is_last:
            h = modulate_relu(h, "mod2")
        if x.shape[-1] != self.c_out:
            x = nn.Conv(
                self.c_out, (1, 1), use_bias=False, dtype=self.dtype, name="skip"
            )(x)
        return x + h


class SelfAttention2d(nn.Module):
    """GN(1) -> 1x1 qkv -> MHA over HW tokens -> 1x1 out + residual
    (reference yfcc_2.py:52-70). NHWC."""

    n_head: int
    use_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        if self.use_norm:
            y = nn.GroupNorm(
                num_groups=1, epsilon=1e-5, dtype=jnp.float32, name="norm"
            )(x)
        else:
            y = x  # wikiart_256.py:61-76 has no norm
        # [q|k|v]-major 1x1-conv channel layout (reference yfcc_2.py:52-70)
        d = c // self.n_head
        # emit head_dim pre-padded to the flash kernel's lane width when
        # that path will run (see stable_diffusion/unet.py CrossAttention)
        emit = d + ((-d) % 128 if flash_route(h * w, h * w) else 0)
        q, k, v = HeadProj(
            self.n_head, d, n_proj=3, interleave="proj",
            conv_kernel=True, dtype=self.dtype, emit_dim=emit, name="qkv_proj",
        )(y.reshape(n, h * w, c).astype(self.dtype))
        y = attention(q, k, v, scale=1.0 / math.sqrt(d))
        y = HeadMergeProj(
            c, self.n_head, c // self.n_head, conv_kernel=True,
            dtype=self.dtype, name="out_proj",
        )(y)
        return x + y.reshape(n, h, w, c)


class ResLinearBlock(nn.Module):
    """linear-relu-linear(-relu) + linear skip (reference cc12m_1.py:19-30)."""

    f_mid: int
    f_out: int
    is_last: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.f_mid, dtype=self.dtype, name="fc1")(x)
        h = jax.nn.relu(h)
        h = nn.Dense(self.f_out, dtype=self.dtype, name="fc2")(h)
        if not self.is_last:
            h = jax.nn.relu(h)
        if x.shape[-1] != self.f_out:
            x = nn.Dense(self.f_out, use_bias=False, dtype=self.dtype, name="skip")(x)
        return x + h


def _avg_pool(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def _upsample(x, method):
    n, h, w, c = x.shape
    if method == "nearest":
        # broadcast+reshape: VJP is a phase-sum reduce, not a scatter-add
        from perceptor_tpu.ops.upsample_conv import nearest_upsample_2x

        return nearest_upsample_2x(x)
    # bilinear, align_corners=False == jax.image 'linear' (half-pixel centers)
    return jax.image.resize(x, (n, h * 2, w * 2, c), method="linear")


class VDiffusionUNet(nn.Module):
    """__call__(diffused xs NCHW in [-1,1], ts (N,), clip_embed?) -> v NCHW."""

    config: VNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, ts, clip_embed: Optional[jax.Array] = None):
        cfg = self.config
        if ts.ndim == 0:
            ts = jnp.broadcast_to(ts, (xs.shape[0],))

        cond = None
        if cfg.mapping is not None:
            if clip_embed is None:
                raise ValueError(f"model is conditioned: pass clip_embed")
            m = cfg.mapping
            # normalize * sqrt(dim) (reference cc12m_1.py:292-293)
            clip_embed = clip_embed / jnp.maximum(
                jnp.linalg.norm(clip_embed, axis=-1, keepdims=True), 1e-12
            ) * math.sqrt(m.clip_dim)
            t_embed = FourierFeatures(
                m.timestep_features, name="mapping_timestep_embed"
            )(ts.astype(jnp.float32)[:, None])
            h = jnp.concatenate([clip_embed, t_embed], axis=-1).astype(self.dtype)
            h = ResLinearBlock(m.width, m.width, dtype=self.dtype, name="mapping_0")(h)
            cond = ResLinearBlock(
                m.width, m.width, is_last=True, dtype=self.dtype, name="mapping_1"
            )(h)

        t_input = ts.astype(jnp.float32)
        if cfg.timestep_input == "log_snr":
            # wikiart_256.py:288-292: embed log SNR rather than raw t
            from perceptor_tpu.schedules import alpha_sigma_to_log_snr, t_to_alpha_sigma

            t_input = alpha_sigma_to_log_snr(*t_to_alpha_sigma(t_input))
        t_planes = FourierFeatures(cfg.timestep_features, cfg.fourier_std,
                                   name="timestep_embed")(t_input[:, None])

        x = xs.transpose(0, 2, 3, 1).astype(self.dtype)  # NCHW -> NHWC
        x = shard_spatial(x)  # context-parallel plan: pin H to the context axis
        n, h, w, _ = x.shape
        t_planes = jnp.broadcast_to(
            t_planes[:, None, None, :].astype(self.dtype),
            (n, h, w, cfg.timestep_features),
        )
        x = jnp.concatenate([x, t_planes], axis=-1)

        def block(name, c_mid, c_out, is_last=False):
            if cond is not None:
                mod_cls = nn.remat(ModConvBlock) if cfg.remat else ModConvBlock
                module = mod_cls(c_mid, c_out, is_last, dtype=self.dtype, name=name)
                return lambda x: module(x, cond)
            res_cls = nn.remat(ResConvBlock) if cfg.remat else ResConvBlock
            return res_cls(c_mid, c_out, is_last, dtype=self.dtype, name=name)

        def attn(name, channels):
            return SelfAttention2d(
                max(channels // cfg.head_div, 1),
                use_norm=cfg.attn_norm,
                dtype=self.dtype,
                name=name,
            )

        cs = cfg.channels
        n_levels = len(cs)

        def run_level(level, x):
            c = cs[level]
            use_attn = level in cfg.attn_levels
            if level == n_levels - 1:
                # innermost: n_inner flat blocks, last returns parent channels
                for j in range(cfg.n_inner):
                    c_out = cs[level - 1] if j == cfg.n_inner - 1 else c
                    x = block(f"inner_{j}", c, c_out)(x)
                    if use_attn:
                        x = attn(f"inner_{j}_attn", c_out)(x)
                return x
            for j in range(cfg.n_blocks):
                x = block(f"down_{level}_{j}", c, c)(x)
                if use_attn:
                    x = attn(f"down_{level}_{j}_attn", c)(x)
            skip = x
            x = _avg_pool(x)
            x = run_level(level + 1, x)
            x = _upsample(x, cfg.upsample_method)
            if cfg.skip_first:  # wikiart SkipBlock cats [skip, main]
                x = jnp.concatenate([skip, x], axis=-1)
            else:
                x = jnp.concatenate([x, skip], axis=-1)
            for j in range(cfg.n_blocks):
                last = j == cfg.n_blocks - 1
                if level == 0:
                    c_out = cfg.out_channels if last else c
                    is_last = last
                else:
                    c_out = cs[level - 1] if last else c
                    is_last = False
                x = block(f"up_{level}_{j}", c, c_out, is_last)(x)
                if use_attn:
                    x = attn(f"up_{level}_{j}_attn", c_out)(x)
            return x

        out = run_level(0, x)
        return out.transpose(0, 3, 1, 2).astype(jnp.float32)  # NHWC -> NCHW
