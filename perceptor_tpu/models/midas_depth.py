"""MiDaS / DPT monocular depth in flax.

Functional spec: reference perceptor/models/midas_depth/ —
midas_depth.py:19-128 wrapper (resize to 384, [0.5]*3 normalization,
NEGATED depth output :121-128), vit.py (ViT-L/16 backbone with project
readout, activation taps at blocks [5,11,17,23], reassemble convs +
transposed-conv resampling), blocks.py (scratch 3x3 convs, residual conv
units, feature fusion with align-corners bilinear 2x upsampling), and
dpt_depth.py:85-105 (depth head).

All six reference checkpoints are implemented: dpt_large (ViT-L/16),
dpt_hybrid / dpt_hybrid_nyu / dpt_hybrid_kitti (ResNetV2-stem hybrid ViT,
vit.py:478-491 + forward_flex :117-155), midas_v21 (ResNeXt101-32x8d
RefineNet, midas_net.py:12-74 + blocks.py:141-258), and midas_v21_small
(tf_efficientnet_lite3, midas_net_custom.py:16-151).

Transposed convs with kernel==stride are lowered as dense-matmul pixel
shuffles (exactly equivalent, MXU-friendly, no conv_transpose pitfalls).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from perceptor_tpu import utils
from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.ops.attention import attention
from perceptor_tpu.ops.resize import interpolate_bilinear, resize
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict


@dataclasses.dataclass(frozen=True)
class ResNetV2StemConfig:
    """timm ResNetV2 trunk of vit_base_r50_s16_384: StdConv + GroupNorm32,
    'same' padding, post-norm bottlenecks, layers (3, 4, 9)."""

    layers: tuple = (3, 4, 9)
    stem_width: int = 64
    widths: tuple = (256, 512, 1024)
    gn_groups: int = 32


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    image_size: int = 384
    patch_size: int = 16
    vit_width: int = 1024
    vit_layers: int = 24
    vit_heads: int = 16
    hooks: tuple = (5, 11, 17, 23)
    reassemble_features: tuple = (256, 512, 1024, 1024)
    features: int = 256
    stem: ResNetV2StemConfig = None  # set => hybrid (vitb_rn50_384)

    @property
    def hybrid(self) -> bool:
        return self.stem is not None


TINY = DPTConfig(
    image_size=64, patch_size=16, vit_width=32, vit_layers=4, vit_heads=2,
    hooks=(0, 1, 2, 3), reassemble_features=(8, 16, 32, 32), features=16,
)
DPT_HYBRID = DPTConfig(
    vit_width=768, vit_layers=12, vit_heads=12, hooks=(0, 1, 8, 11),
    reassemble_features=(256, 512, 768, 768), stem=ResNetV2StemConfig(),
)
TINY_HYBRID = DPTConfig(
    image_size=64, vit_width=24, vit_layers=4, vit_heads=2,
    hooks=(0, 1, 2, 3), reassemble_features=(8, 16, 24, 24), features=16,
    stem=ResNetV2StemConfig(
        layers=(1, 1, 1), stem_width=8, widths=(8, 16, 32), gn_groups=2
    ),
)
CONFIGS = {
    "dpt_large": DPTConfig(),
    "dpt_hybrid": DPT_HYBRID,
    "dpt_hybrid_nyu": DPT_HYBRID,
    "dpt_hybrid_kitti": DPT_HYBRID,
    "tiny": TINY,
    "tiny_hybrid": TINY_HYBRID,
}
CHECKPOINT_NAMES = (
    "midas_v21_small", "midas_v21", "dpt_large", "dpt_hybrid",
    "dpt_hybrid_nyu", "dpt_hybrid_kitti", "tiny",
)


def _block_upsample(x, weight, bias, factor):
    """ConvTranspose2d(k=s=factor, p=0) == per-pixel dense + pixel shuffle.

    weight: (C_in, C_out, k, k) torch layout. NHWC in/out."""
    n, h, w, c = x.shape
    c_out = weight.shape[1]
    flat = weight.reshape(c, c_out * factor * factor)
    y = x @ flat  # (n, h, w, c_out*k*k)
    y = y.reshape(n, h, w, c_out, factor, factor)
    y = y.transpose(0, 1, 4, 2, 5, 3).reshape(n, h * factor, w * factor, c_out)
    return y + bias


class DPTViT(nn.Module):
    """timm ViT backbone returning tapped block outputs (with cls token)."""

    config: DPTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        cfg = self.config
        from perceptor_tpu.models.patch_embed import PatchEmbed

        x = PatchEmbed(
            cfg.vit_width, cfg.patch_size, dtype=self.dtype,
            name="patch_embed",
        )(images.transpose(0, 2, 3, 1).astype(self.dtype))
        n, gh, gw, w = x.shape
        x = x.reshape(n, gh * gw, w)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.vit_width))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (n, 1, w)), x], axis=1
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, gh * gw + 1, cfg.vit_width),
        )
        x = x + pos[0].astype(self.dtype)
        taps = []
        head_dim = cfg.vit_width // cfg.vit_heads
        for i in range(cfg.vit_layers):
            h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=f"norm1_{i}")(x)
            qkv = nn.Dense(cfg.vit_width * 3, dtype=self.dtype, name=f"qkv_{i}")(
                h.astype(self.dtype)
            )
            qkv = qkv.reshape(n, -1, 3, cfg.vit_heads, head_dim)
            q, k, v = (qkv[:, :, j].transpose(0, 2, 1, 3) for j in range(3))
            attn = attention(q, k, v)
            attn = attn.transpose(0, 2, 1, 3).reshape(n, -1, cfg.vit_width)
            x = x + nn.Dense(cfg.vit_width, dtype=self.dtype, name=f"attn_proj_{i}")(attn)
            h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=f"norm2_{i}")(x)
            h = nn.Dense(cfg.vit_width * 4, dtype=self.dtype, name=f"fc1_{i}")(
                h.astype(self.dtype)
            )
            h = jax.nn.gelu(h, approximate=False)
            x = x + nn.Dense(cfg.vit_width, dtype=self.dtype, name=f"fc2_{i}")(h)
            if i in cfg.hooks:
                taps.append(x.astype(jnp.float32))
        return taps, (gh, gw)


class StdConv(nn.Module):
    """timm StdConv2dSame: weight-standardized conv (per-out-channel,
    biased variance, eps 1e-6) with TF dynamic SAME padding."""

    features: int
    kernel: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, x.shape[-1], self.features),
        )
        mean = w.mean(axis=(0, 1, 2), keepdims=True)
        var = jnp.square(w - mean).mean(axis=(0, 1, 2), keepdims=True)
        w = (w - mean) * jax.lax.rsqrt(var + 1e-6)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            (self.stride, self.stride),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class ResNetV2Bottleneck(nn.Module):
    """timm resnetv2 Bottleneck (preact=False): StdConv 1x1 -> GN+relu ->
    StdConv 3x3/stride -> GN+relu -> StdConv 1x1 -> GN, relu(out + short)."""

    out_ch: int
    stride: int
    gn_groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.out_ch // 4
        gn = lambda name: nn.GroupNorm(
            num_groups=self.gn_groups, epsilon=1e-5, dtype=jnp.float32,
            name=name,
        )
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out_ch:
            shortcut = StdConv(
                self.out_ch, 1, self.stride, self.dtype, name="downsample_conv"
            )(x)
            shortcut = gn("downsample_norm")(shortcut)
        h = StdConv(mid, 1, 1, self.dtype, name="conv1")(x)
        h = jax.nn.relu(gn("norm1")(h))
        h = StdConv(mid, 3, self.stride, self.dtype, name="conv2")(h)
        h = jax.nn.relu(gn("norm2")(h))
        h = StdConv(self.out_ch, 1, 1, self.dtype, name="conv3")(h)
        h = gn("norm3")(h)
        return jax.nn.relu(h + shortcut)


class ResNetV2Stem(nn.Module):
    """Hybrid-ViT CNN trunk; NHWC in, returns (stage0 @1/4, stage1 @1/8,
    stage2 @1/16) feature maps."""

    config: ResNetV2StemConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = StdConv(cfg.stem_width, 7, 2, self.dtype, name="stem_conv")(x)
        h = nn.GroupNorm(
            num_groups=cfg.gn_groups, epsilon=1e-5, dtype=jnp.float32,
            name="stem_norm",
        )(h)
        h = jax.nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")
        outs = []
        for s, (width, count) in enumerate(zip(cfg.widths, cfg.layers)):
            for i in range(count):
                stride = 2 if (s > 0 and i == 0) else 1
                h = ResNetV2Bottleneck(
                    width, stride, cfg.gn_groups, self.dtype,
                    name=f"stage{s}_{i}",
                )(h)
            outs.append(h)
        return tuple(outs)


class DPTHybridViT(nn.Module):
    """vit_base_r50_s16_384 trunk (vit.py:478-491 + forward_flex
    :117-155): ResNetV2 stem, 1x1 token projection on the 1/16 map,
    cls + pos, 12 post-LN ViT blocks; returns (stage0, stage1) spatial
    maps and the two token taps (hooks[2], hooks[3])."""

    config: DPTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        cfg = self.config
        c0, c1, c2 = ResNetV2Stem(cfg.stem, dtype=self.dtype, name="stem")(
            images.transpose(0, 2, 3, 1).astype(self.dtype)
        )
        x = nn.Conv(
            cfg.vit_width, (1, 1), dtype=self.dtype, name="patch_embed"
        )(c2)
        n, gh, gw, w = x.shape
        x = x.reshape(n, gh * gw, w)
        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.vit_width)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (n, 1, w)), x], axis=1
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, gh * gw + 1, cfg.vit_width),
        )
        x = x + pos[0].astype(self.dtype)
        taps = []
        head_dim = cfg.vit_width // cfg.vit_heads
        for i in range(cfg.vit_layers):
            h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=f"norm1_{i}")(x)
            qkv = nn.Dense(cfg.vit_width * 3, dtype=self.dtype, name=f"qkv_{i}")(
                h.astype(self.dtype)
            )
            qkv = qkv.reshape(n, -1, 3, cfg.vit_heads, head_dim)
            q, k, v = (qkv[:, :, j].transpose(0, 2, 1, 3) for j in range(3))
            attn = attention(q, k, v)
            attn = attn.transpose(0, 2, 1, 3).reshape(n, -1, cfg.vit_width)
            x = x + nn.Dense(
                cfg.vit_width, dtype=self.dtype, name=f"attn_proj_{i}"
            )(attn)
            h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=f"norm2_{i}")(x)
            h = nn.Dense(cfg.vit_width * 4, dtype=self.dtype, name=f"fc1_{i}")(
                h.astype(self.dtype)
            )
            h = jax.nn.gelu(h, approximate=False)
            x = x + nn.Dense(cfg.vit_width, dtype=self.dtype, name=f"fc2_{i}")(h)
            if i in cfg.hooks[2:]:
                taps.append(x.astype(jnp.float32))
        return (c0, c1), taps, (gh, gw)


class DPTDepthModel(nn.Module):
    config: DPTConfig
    non_negative: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        """images NCHW normalized -> depth (N, H, W)."""
        cfg = self.config
        spatial = []
        if cfg.hybrid:
            # hybrid reassembly (vit.py:523-529): stage features pass
            # through act_postprocess1/2 untouched (Identity); only the
            # two ViT taps get readout/project/resample
            spatial, taps, (gh, gw) = DPTHybridViT(
                cfg, dtype=self.dtype, name="backbone"
            )(images)
            taps = [None, None] + list(taps)
        else:
            taps, (gh, gw) = DPTViT(cfg, dtype=self.dtype, name="backbone")(
                images
            )

        layers = []
        for idx, tap in enumerate(taps):
            if tap is None:
                fmap = spatial[idx].astype(self.dtype)
                fmap = nn.Conv(
                    cfg.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name=f"scratch_{idx}",
                )(fmap)
                layers.append(fmap)
                continue
            # project readout (vit.py:31-43): cat(tokens, cls) -> linear+gelu
            n, _, w = tap.shape
            cls = jnp.broadcast_to(tap[:, :1], tap[:, 1:].shape)
            tokens = jnp.concatenate([tap[:, 1:], cls], axis=-1)
            tokens = nn.Dense(
                cfg.vit_width, dtype=self.dtype, name=f"readout_{idx}"
            )(tokens.astype(self.dtype))
            tokens = jax.nn.gelu(tokens, approximate=False)
            fmap = tokens.reshape(n, gh, gw, cfg.vit_width)
            fmap = nn.Conv(
                cfg.reassemble_features[idx], (1, 1), dtype=self.dtype,
                name=f"project_{idx}",
            )(fmap)
            if idx == 0:
                weight = self.param(
                    "resample_0_weight", nn.initializers.normal(0.02),
                    (cfg.reassemble_features[0], cfg.reassemble_features[0], 4, 4),
                )
                bias = self.param(
                    "resample_0_bias", nn.initializers.zeros,
                    (cfg.reassemble_features[0],),
                )
                fmap = _block_upsample(
                    fmap, weight.astype(self.dtype), bias.astype(self.dtype), 4
                )
            elif idx == 1:
                weight = self.param(
                    "resample_1_weight", nn.initializers.normal(0.02),
                    (cfg.reassemble_features[1], cfg.reassemble_features[1], 2, 2),
                )
                bias = self.param(
                    "resample_1_bias", nn.initializers.zeros,
                    (cfg.reassemble_features[1],),
                )
                fmap = _block_upsample(
                    fmap, weight.astype(self.dtype), bias.astype(self.dtype), 2
                )
            elif idx == 3:
                fmap = nn.Conv(
                    cfg.reassemble_features[3], (3, 3), strides=(2, 2), padding=1,
                    dtype=self.dtype, name="resample_3",
                )(fmap)
            # scratch 3x3 (no bias) to `features`
            fmap = nn.Conv(
                cfg.features, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                name=f"scratch_{idx}",
            )(fmap)
            layers.append(fmap)

        def rcu(x, name):
            """ResidualConvUnit (blocks.py:260-323): relu-conv twice + skip."""
            out = jax.nn.relu(x)
            out = nn.Conv(cfg.features, (3, 3), padding=1, dtype=self.dtype,
                          name=f"{name}_conv1")(out)
            out = jax.nn.relu(out)
            out = nn.Conv(cfg.features, (3, 3), padding=1, dtype=self.dtype,
                          name=f"{name}_conv2")(out)
            return out + x

        def fusion(x, res, name):
            """FeatureFusionBlock (blocks.py:328-391)."""
            if res is not None:
                x = x + rcu(res, f"{name}_rcu1")
            x = rcu(x, f"{name}_rcu2")
            n, h, w, c = x.shape
            x = x.transpose(0, 3, 1, 2)
            x = interpolate_bilinear(x, (h * 2, w * 2), align_corners=True)
            x = x.transpose(0, 2, 3, 1)
            return nn.Conv(cfg.features, (1, 1), dtype=self.dtype,
                           name=f"{name}_out")(x)

        # reference order (dpt_depth.py:76-79): refinenet4(layer4), then
        # refinenet_k(path, layer_k) with the lateral going through rcu1
        path = fusion(layers[3], None, "refinenet4")
        path = fusion(path, layers[2], "refinenet3")
        path = fusion(path, layers[1], "refinenet2")
        path = fusion(path, layers[0], "refinenet1")

        # head (dpt_depth.py:89-97)
        x = nn.Conv(cfg.features // 2, (3, 3), padding=1, dtype=self.dtype,
                    name="head_conv1")(path)
        n, h, w, c = x.shape
        x = x.transpose(0, 3, 1, 2)
        x = interpolate_bilinear(x, (h * 2, w * 2), align_corners=True)
        x = x.transpose(0, 2, 3, 1)
        x = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype, name="head_conv2")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(1, (1, 1), dtype=self.dtype, name="head_conv3")(x)
        if self.non_negative:
            x = jax.nn.relu(x)
        return x[..., 0].astype(jnp.float32)  # (N, H, W)


@dataclasses.dataclass(frozen=True)
class MidasNetConfig:
    backbone: "ResNetConfig" = None  # set in __post_init__ default below
    features: int = 256
    image_size: int = 384

    def __post_init__(self):
        if self.backbone is None:
            from perceptor_tpu.models.resnet import RESNEXT101_32X8D

            object.__setattr__(self, "backbone", RESNEXT101_32X8D)


class MidasNet(nn.Module):
    """MiDaS v2.1 (midas_net.py:12-74): ResNeXt101 trunk, per-stage 3x3
    scratch convs, v1 FeatureFusionBlocks (blocks.py:228-258 — no out_conv,
    align-corners 2x upsample), RefineNet-style head. NCHW boundary,
    ImageNet-normalized input, (N, H, W) depth out."""

    config: MidasNetConfig
    non_negative: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        from perceptor_tpu.models.resnet import ResNetFeatures

        cfg = self.config
        feats = ResNetFeatures(cfg.backbone, name="backbone")(
            images.transpose(0, 2, 3, 1).astype(self.dtype)
        )
        rn = [
            nn.Conv(
                cfg.features, (3, 3), padding=1, use_bias=False,
                dtype=self.dtype, name=f"layer{j + 1}_rn",
            )(feats[j])
            for j in range(4)
        ]

        def rcu(x, name):
            """ResidualConvUnit (blocks.py:193-226). NOTE the reference's
            relu is inplace=True (:211), so `out + x` at :225 actually adds
            relu(x) — the residual branch is relu(x), reproduced here."""
            gated = jax.nn.relu(x)
            out = nn.Conv(cfg.features, (3, 3), padding=1, dtype=self.dtype,
                          name=f"{name}_conv1")(gated)
            out = jax.nn.relu(out)
            out = nn.Conv(cfg.features, (3, 3), padding=1, dtype=self.dtype,
                          name=f"{name}_conv2")(out)
            return out + gated

        def fusion(x, skip, name):
            """v1 FeatureFusionBlock (blocks.py:228-258)."""
            if skip is not None:
                x = x + rcu(skip, f"{name}_rcu1")
            x = rcu(x, f"{name}_rcu2")
            n, h, w, c = x.shape
            x = x.transpose(0, 3, 1, 2)
            x = interpolate_bilinear(x, (h * 2, w * 2), align_corners=True)
            return x.transpose(0, 2, 3, 1).astype(self.dtype)

        path = fusion(rn[3], None, "refinenet4")
        path = fusion(path, rn[2], "refinenet3")
        path = fusion(path, rn[1], "refinenet2")
        path = fusion(path, rn[0], "refinenet1")

        # output_conv (midas_net.py:37-44): conv -> non-align-corners 2x
        # bilinear -> conv -> relu -> conv -> relu
        x = nn.Conv(128, (3, 3), padding=1, dtype=self.dtype,
                    name="out_conv1")(path)
        n, h, w, c = x.shape
        x = interpolate_bilinear(
            x.transpose(0, 3, 1, 2), (h * 2, w * 2), align_corners=False
        ).transpose(0, 2, 3, 1).astype(self.dtype)
        x = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                    name="out_conv2")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(1, (1, 1), dtype=self.dtype, name="out_conv3")(x)
        if self.non_negative:
            x = jax.nn.relu(x)
        return x[..., 0].astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class MidasNetSmallConfig:
    """midas_v21_small (midas_net_custom.py:16-151): tf_efficientnet_lite3
    trunk tapped after stages 1/2/4/6 (blocks.py:120-130), expand-mode
    scratch (64/128/256/512), custom fusion blocks with out_conv."""

    backbone: "EfficientNetConfig" = None
    features: int = 64
    image_size: int = 256

    def __post_init__(self):
        if self.backbone is None:
            object.__setattr__(self, "backbone", _lite3_encoder())


def _lite3_encoder():
    from perceptor_tpu.models.adabins_depth import BlockSpec, EfficientNetConfig

    # tf_efficientnet_lite3: width 1.2 / depth 1.4, fixed stem 32, relu6,
    # no SE; first/last stage depths unscaled (gen-efficientnet lite rule)
    return EfficientNetConfig(
        stem_channels=32,
        head_channels=1280,
        blocks=(
            BlockSpec("ds", 3, 1, 1, 16, 1),
            BlockSpec("ir", 3, 2, 6, 32, 3),
            BlockSpec("ir", 5, 2, 6, 48, 3),
            BlockSpec("ir", 3, 2, 6, 96, 5),
            BlockSpec("ir", 5, 1, 6, 136, 5),
            BlockSpec("ir", 5, 2, 6, 232, 6),
            BlockSpec("ir", 3, 1, 6, 384, 1),
        ),
        activation="relu6",
        use_se=False,
        include_head=False,
    )


def _tiny_lite_encoder():
    from perceptor_tpu.models.adabins_depth import BlockSpec, EfficientNetConfig

    return EfficientNetConfig(
        stem_channels=8,
        head_channels=16,
        blocks=(
            BlockSpec("ds", 3, 1, 1, 4, 1),
            BlockSpec("ir", 3, 2, 2, 6, 1),
            BlockSpec("ir", 5, 2, 2, 8, 1),
            BlockSpec("ir", 3, 2, 2, 12, 1),
            BlockSpec("ir", 5, 1, 2, 16, 1),
            BlockSpec("ir", 5, 2, 2, 20, 1),
            BlockSpec("ir", 3, 1, 2, 24, 1),
        ),
        activation="relu6",
        use_se=False,
        include_head=False,
    )


class MidasNetSmall(nn.Module):
    """midas_v21_small (midas_net_custom.py:16-151). NCHW boundary,
    ImageNet-normalized input, (N, H, W) depth out. Custom RCUs use a
    non-inplace relu, so the residual adds the true x (contrast v1)."""

    config: MidasNetSmallConfig
    non_negative: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        from perceptor_tpu.models.adabins_depth import EfficientNetFeatures

        cfg = self.config
        feats = EfficientNetFeatures(
            cfg.backbone, dtype=self.dtype, name="backbone"
        )(images)
        # taps after stages 1/2/4/6 == walk indices 5/6/8/10
        taps = [feats[i].transpose(0, 2, 3, 1) for i in (5, 6, 8, 10)]
        f = cfg.features
        widths = (f, f * 2, f * 4, f * 8)  # expand=True scratch
        rn = [
            nn.Conv(
                widths[j], (3, 3), padding=1, use_bias=False,
                dtype=self.dtype, name=f"layer{j + 1}_rn",
            )(taps[j].astype(self.dtype))
            for j in range(4)
        ]

        def rcu(x, width, name):
            out = jax.nn.relu(x)
            out = nn.Conv(width, (3, 3), padding=1, dtype=self.dtype,
                          name=f"{name}_conv1")(out)
            out = jax.nn.relu(out)
            out = nn.Conv(width, (3, 3), padding=1, dtype=self.dtype,
                          name=f"{name}_conv2")(out)
            return out + x

        def fusion(x, skip, width, out_width, name):
            """FeatureFusionBlock_custom with expand (blocks.py:328-391)."""
            if skip is not None:
                x = x + rcu(skip, width, f"{name}_rcu1")
            x = rcu(x, width, f"{name}_rcu2")
            n, h, w, c = x.shape
            x = x.transpose(0, 3, 1, 2)
            x = interpolate_bilinear(x, (h * 2, w * 2), align_corners=True)
            x = x.transpose(0, 2, 3, 1).astype(self.dtype)
            return nn.Conv(out_width, (1, 1), dtype=self.dtype,
                           name=f"{name}_out")(x)

        path = fusion(rn[3], None, f * 8, f * 4, "refinenet4")
        path = fusion(path, rn[2], f * 4, f * 2, "refinenet3")
        path = fusion(path, rn[1], f * 2, f, "refinenet2")
        path = fusion(path, rn[0], f, f, "refinenet1")

        x = nn.Conv(f // 2, (3, 3), padding=1, dtype=self.dtype,
                    name="out_conv1")(path)
        n, h, w, c = x.shape
        x = interpolate_bilinear(
            x.transpose(0, 3, 1, 2), (h * 2, w * 2), align_corners=False
        ).transpose(0, 2, 3, 1).astype(self.dtype)
        x = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                    name="out_conv2")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(1, (1, 1), dtype=self.dtype, name="out_conv3")(x)
        if self.non_negative:
            x = jax.nn.relu(x)
        return x[..., 0].astype(jnp.float32)


def convert_midas_net_small(state_dict: Dict, cfg: MidasNetSmallConfig) -> Dict:
    """midas_v21_small checkpoint -> MidasNetSmall params. Backbone keys
    follow _make_efficientnet_backbone's regrouping (blocks.py:120-130):
    layer1 = stem + stages 0-1, layer2 = stage 2, layer3 = stages 3-4,
    layer4 = stages 5-6."""
    from perceptor_tpu.models.adabins_depth import convert_efficientnet
    from perceptor_tpu.models.clip.convert import _np

    sd = state_dict
    remap = {
        "pretrained.layer1.0.": "enc.conv_stem.",
        "pretrained.layer1.1.": "enc.bn1.",
        "pretrained.layer1.3.": "enc.blocks.0.",
        "pretrained.layer1.4.": "enc.blocks.1.",
        "pretrained.layer2.0.": "enc.blocks.2.",
        "pretrained.layer3.0.": "enc.blocks.3.",
        "pretrained.layer3.1.": "enc.blocks.4.",
        "pretrained.layer4.0.": "enc.blocks.5.",
        "pretrained.layer4.1.": "enc.blocks.6.",
    }
    enc_sd = {}
    for k, v in sd.items():
        for old, new in remap.items():
            if k.startswith(old):
                enc_sd[new + k[len(old):]] = v
                break
    params: Dict = {
        "backbone": convert_efficientnet(enc_sd, "enc", cfg.backbone)
    }

    def conv(name, bias=True):
        out = {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
        if bias:
            out["bias"] = _np(sd[f"{name}.bias"])
        return out

    for j in range(1, 5):
        params[f"layer{j}_rn"] = conv(f"scratch.layer{j}_rn", bias=False)
    for k in range(1, 5):
        rp = f"scratch.refinenet{k}"
        if f"{rp}.resConfUnit1.conv1.weight" in sd:
            params[f"refinenet{k}_rcu1_conv1"] = conv(f"{rp}.resConfUnit1.conv1")
            params[f"refinenet{k}_rcu1_conv2"] = conv(f"{rp}.resConfUnit1.conv2")
        params[f"refinenet{k}_rcu2_conv1"] = conv(f"{rp}.resConfUnit2.conv1")
        params[f"refinenet{k}_rcu2_conv2"] = conv(f"{rp}.resConfUnit2.conv2")
        params[f"refinenet{k}_out"] = conv(f"{rp}.out_conv")
    params["out_conv1"] = conv("scratch.output_conv.0")
    params["out_conv2"] = conv("scratch.output_conv.2")
    params["out_conv3"] = conv("scratch.output_conv.4")
    return params


def convert_midas_net(state_dict: Dict, cfg: MidasNetConfig) -> Dict:
    """midas_v21 checkpoint -> MidasNet params. Backbone keys follow
    _make_resnet_backbone's regrouping (blocks.py:141-152):
    pretrained.layer1.{0,1} are the stem conv/bn and pretrained.layer1.4
    is torchvision layer1."""
    from perceptor_tpu.models.clip.convert import _np
    from perceptor_tpu.models.resnet import convert_resnet

    sd = state_dict
    tv = {}
    for k, v in sd.items():
        if k.startswith("pretrained.layer1.0."):
            tv["conv1." + k[len("pretrained.layer1.0."):]] = v
        elif k.startswith("pretrained.layer1.1."):
            tv["bn1." + k[len("pretrained.layer1.1."):]] = v
        elif k.startswith("pretrained.layer1.4."):
            tv["layer1." + k[len("pretrained.layer1.4."):]] = v
        elif k.startswith("pretrained.layer"):
            tv[k[len("pretrained."):]] = v
    params: Dict = {"backbone": convert_resnet(tv, cfg.backbone)}

    def conv(name, bias=True):
        out = {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
        if bias:
            out["bias"] = _np(sd[f"{name}.bias"])
        return out

    for j in range(1, 5):
        params[f"layer{j}_rn"] = conv(f"scratch.layer{j}_rn", bias=False)
    for k in range(1, 5):
        rp = f"scratch.refinenet{k}"
        if k < 4:  # refinenet4 is called with one input; rcu1 still exists
            params[f"refinenet{k}_rcu1_conv1"] = conv(f"{rp}.resConfUnit1.conv1")
            params[f"refinenet{k}_rcu1_conv2"] = conv(f"{rp}.resConfUnit1.conv2")
        params[f"refinenet{k}_rcu2_conv1"] = conv(f"{rp}.resConfUnit2.conv1")
        params[f"refinenet{k}_rcu2_conv2"] = conv(f"{rp}.resConfUnit2.conv2")
    params["out_conv1"] = conv("scratch.output_conv.0")
    params["out_conv2"] = conv("scratch.output_conv.2")
    params["out_conv3"] = conv("scratch.output_conv.4")
    return params


def convert_dpt(state_dict: Dict, cfg: DPTConfig) -> Dict:
    """MiDaS dpt_large / dpt_hybrid* checkpoint -> flax params."""
    from perceptor_tpu.models.clip.convert import _layernorm, _linear, _np

    sd = state_dict

    def conv_k(name):
        return _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)

    def gn(name):
        return {
            "scale": _np(sd[f"{name}.weight"]),
            "bias": _np(sd[f"{name}.bias"]),
        }

    backbone = {
        "patch_embed": {
            "kernel": conv_k("pretrained.model.patch_embed.proj"),
            "bias": _np(sd["pretrained.model.patch_embed.proj.bias"]),
        },
        "cls_token": _np(sd["pretrained.model.cls_token"]),
        "pos_embed": _np(sd["pretrained.model.pos_embed"]),
    }
    if cfg.hybrid:
        bb = "pretrained.model.patch_embed.backbone"
        stem = {
            "stem_conv": {"kernel": conv_k(f"{bb}.stem.conv")},
            "stem_norm": gn(f"{bb}.stem.norm"),
        }
        for s, count in enumerate(cfg.stem.layers):
            for i in range(count):
                t = f"{bb}.stages.{s}.blocks.{i}"
                block = {
                    "conv1": {"kernel": conv_k(f"{t}.conv1")},
                    "norm1": gn(f"{t}.norm1"),
                    "conv2": {"kernel": conv_k(f"{t}.conv2")},
                    "norm2": gn(f"{t}.norm2"),
                    "conv3": {"kernel": conv_k(f"{t}.conv3")},
                    "norm3": gn(f"{t}.norm3"),
                }
                if f"{t}.downsample.conv.weight" in sd:
                    block["downsample_conv"] = {
                        "kernel": conv_k(f"{t}.downsample.conv")
                    }
                    block["downsample_norm"] = gn(f"{t}.downsample.norm")
                stem[f"stage{s}_{i}"] = block
        backbone["stem"] = stem
    for i in range(cfg.vit_layers):
        p = f"pretrained.model.blocks.{i}"
        backbone[f"norm1_{i}"] = _layernorm(sd, f"{p}.norm1")
        backbone[f"norm2_{i}"] = _layernorm(sd, f"{p}.norm2")
        backbone[f"qkv_{i}"] = _linear(sd, f"{p}.attn.qkv")
        backbone[f"attn_proj_{i}"] = _linear(sd, f"{p}.attn.proj")
        backbone[f"fc1_{i}"] = _linear(sd, f"{p}.mlp.fc1")
        backbone[f"fc2_{i}"] = _linear(sd, f"{p}.mlp.fc2")

    def conv(name, bias=True):
        out = {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
        if bias:
            out["bias"] = _np(sd[f"{name}.bias"])
        return out

    params: Dict = {"backbone": backbone}
    for idx in range(4):
        pp = f"pretrained.act_postprocess{idx + 1}"
        if not (cfg.hybrid and idx in (0, 1)):  # hybrid 0/1 are Identity
            params[f"readout_{idx}"] = _linear(sd, f"{pp}.0.project.0")
            params[f"project_{idx}"] = conv(f"{pp}.3")
            if idx in (0, 1):
                params[f"resample_{idx}_weight"] = _np(sd[f"{pp}.4.weight"])
                params[f"resample_{idx}_bias"] = _np(sd[f"{pp}.4.bias"])
            if idx == 3:
                params["resample_3"] = conv(f"{pp}.4")
        params[f"scratch_{idx}"] = conv(f"scratch.layer{idx + 1}_rn", bias=False)

    for k in range(1, 5):
        rp = f"scratch.refinenet{k}"
        name = f"refinenet{k}"
        if f"{rp}.resConfUnit1.conv1.weight" in sd:
            params[f"{name}_rcu1_conv1"] = conv(f"{rp}.resConfUnit1.conv1")
            params[f"{name}_rcu1_conv2"] = conv(f"{rp}.resConfUnit1.conv2")
        params[f"{name}_rcu2_conv1"] = conv(f"{rp}.resConfUnit2.conv1")
        params[f"{name}_rcu2_conv2"] = conv(f"{rp}.resConfUnit2.conv2")
        params[f"{name}_out"] = conv(f"{rp}.out_conv")
    params["head_conv1"] = conv("scratch.output_conv.0")
    params["head_conv2"] = conv("scratch.output_conv.2")
    params["head_conv3"] = conv("scratch.output_conv.4")
    return params


@utils.cache
class MidasDepth:
    def __init__(self, name: str = "dpt_large", optimize: bool = True):
        """(reference midas_depth.py:30-118). Implemented: dpt_large,
        midas_v21 (+ tiny/tiny_v21 test configs)."""
        extras = ("tiny_v21", "tiny_hybrid", "tiny_v21_small")
        if name not in CHECKPOINT_NAMES + extras:
            raise ValueError(f"midas_model_type '{name}' not implemented")
        dtype = jnp.bfloat16 if optimize else jnp.float32
        is_v21 = name in ("midas_v21", "tiny_v21")
        is_small = name in ("midas_v21_small", "tiny_v21_small")
        if not (is_v21 or is_small) and name not in CONFIGS:
            raise NotImplementedError(
                f"midas_model_type '{name}' not implemented"
            )
        self.name = name
        if is_v21 or is_small:
            # (midas_depth.py:85-107): v21 family uses ImageNet normalization
            self.mean = jnp.asarray([0.485, 0.456, 0.406]).reshape(1, 3, 1, 1)
            self.std = jnp.asarray([0.229, 0.224, 0.225]).reshape(1, 3, 1, 1)
        if is_small:
            cfg = (
                MidasNetSmallConfig(
                    backbone=_tiny_lite_encoder(), features=8, image_size=64
                )
                if name == "tiny_v21_small"
                else MidasNetSmallConfig()
            )
            self.module = MidasNetSmall(cfg, dtype=dtype)
            convert = convert_midas_net_small
        elif is_v21:
            from perceptor_tpu.models.resnet import TINY_RESNEXT

            cfg = (
                MidasNetConfig(backbone=TINY_RESNEXT, features=8,
                               image_size=64)
                if name == "tiny_v21"
                else MidasNetConfig()
            )
            self.module = MidasNet(cfg, dtype=dtype)
            convert = convert_midas_net
        else:
            cfg = CONFIGS[name]
            self.module = DPTDepthModel(cfg, dtype=dtype)
            self.mean = jnp.full((1, 3, 1, 1), 0.5)
            self.std = jnp.full((1, 3, 1, 1), 0.5)
            convert = convert_dpt
        self.config = cfg
        self.image_size = (cfg.image_size, cfg.image_size)
        path = find_checkpoint(f"midas_{name}", name)
        if path is not None:
            self.params = jax.device_put(
                convert(load_state_dict(path), cfg), jax.devices()[0]
            )
        else:
            self.params = init_by_shape(
                self.module.init,
                jax.random.PRNGKey(0),
                jnp.zeros((1, 3, cfg.image_size, cfg.image_size)),
            )["params"]
        self._jit = jax.jit(self.forward_fn)

    def forward_fn(self, params, images):
        """(reference :121-128): resize, normalize, NEGATED depth."""
        if images.shape[-2:] != self.image_size:
            images = resize(images, out_shape=self.image_size)
        images = (images - self.mean) / self.std
        depth = self.module.apply({"params": params}, images)
        return -depth[:, None]  # (N, 1, H, W)

    def __call__(self, images):
        return self._jit(self.params, images)

    forward = __call__
