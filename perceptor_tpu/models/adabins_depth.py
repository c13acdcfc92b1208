"""AdaBins monocular depth (UnetAdaptiveBins over EfficientNet-B5).

Functional spec: reference perceptor/models/adabins_depth/ —
adabins_depth.py:9-49 (area-based pre-resize into [448^2, 500k] px,
nyu/kitti checkpoints), infer.py:13-74 (ImageNet-normalize, horizontal-
flip averaging — NOTE the flip branch feeds the UN-normalized image,
infer.py:52-54, reproduced faithfully — clamp to [min,max] depth and
bilinear align-corners resize back to the input size),
models/unet_adaptive_bins.py (Encoder walks the backbone's module list
collecting per-stage features :87-100; DecoderBN consumes features
4/5/6/8/11 :62-76 with a quirky 1x1-conv-with-padding-1 bottleneck :39-41;
UnetAdaptiveBins :103-148 converts mViT bin widths into cumulative bin
edges and takes the softmax-weighted sum of bin centers),
models/mini_vit.py (mViT :7-61), models/layers.py (PatchTransformerEncoder
:5-39 — 16x16 patch conv + learned positional encodings + 4 post-norm
torch TransformerEncoder layers; PixelWiseDotProduct :42-55).

The backbone is rwightman gen-efficientnet ``tf_efficientnet_b5_ap``
(unet_adaptive_bins.py:160-164): stem 48ch, 7 MBConv stages
(24/40/64/128/176/304/512), conv_head 2048, TF-style SAME padding,
BatchNorm eps 1e-3, swish activations, SE ratio 0.25 of block input
channels — re-implemented here in flax (NHWC internally) rather than
pulled from torch.hub.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.ops.resize import interpolate_bilinear, resize
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict

MAX_ADABINS_AREA = 500_000
MIN_ADABINS_AREA = 448 * 448

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class BlockSpec:
    """One EfficientNet stage: `count` blocks, first carries the stride."""

    kind: str  # "ds" (depthwise-separable) | "ir" (inverted residual)
    kernel: int
    stride: int
    expand: int
    channels: int
    count: int


# tf_efficientnet_b5: width 1.6 / depth 2.2 over the B0 template, with
# make_divisible(ch * 1.6, 8) channel rounding and ceil(r * 2.2) depths.
B5_BLOCKS: Tuple[BlockSpec, ...] = (
    BlockSpec("ds", 3, 1, 1, 24, 3),
    BlockSpec("ir", 3, 2, 6, 40, 5),
    BlockSpec("ir", 5, 2, 6, 64, 5),
    BlockSpec("ir", 3, 2, 6, 128, 7),
    BlockSpec("ir", 5, 1, 6, 176, 7),
    BlockSpec("ir", 5, 2, 6, 304, 9),
    BlockSpec("ir", 3, 1, 6, 512, 3),
)


@dataclasses.dataclass(frozen=True)
class EfficientNetConfig:
    stem_channels: int = 48
    head_channels: int = 2048
    blocks: Tuple[BlockSpec, ...] = B5_BLOCKS
    se_ratio: float = 0.25
    bn_eps: float = 1e-3
    activation: str = "silu"  # "relu6" for lite variants
    use_se: bool = True  # lite variants drop squeeze-excite
    include_head: bool = True  # MiDaS-small taps stop before conv_head


@dataclasses.dataclass(frozen=True)
class AdaBinsConfig:
    encoder: EfficientNetConfig = EfficientNetConfig()
    n_bins: int = 256
    min_val: float = 1e-3
    max_val: float = 10.0
    decoder_features: int = 2048
    decoder_out: int = 128
    embedding_dim: int = 128
    n_query_channels: int = 128
    patch_size: int = 16
    transformer_layers: int = 4
    transformer_heads: int = 4
    transformer_ffn: int = 1024
    max_patches: int = 500


TINY_EFFICIENTNET = EfficientNetConfig(
    stem_channels=8,
    head_channels=32,
    blocks=(
        BlockSpec("ds", 3, 1, 1, 4, 1),
        BlockSpec("ir", 3, 2, 2, 6, 2),
        BlockSpec("ir", 5, 2, 2, 8, 1),
        BlockSpec("ir", 3, 2, 2, 12, 1),
        BlockSpec("ir", 5, 1, 2, 16, 1),
        BlockSpec("ir", 5, 2, 2, 20, 1),
        BlockSpec("ir", 3, 1, 2, 24, 1),
    ),
)
TINY_ADABINS = AdaBinsConfig(
    encoder=TINY_EFFICIENTNET,
    n_bins=10,
    decoder_features=32,
    decoder_out=16,
    embedding_dim=16,
    n_query_channels=16,
    patch_size=2,
    transformer_layers=2,
    transformer_heads=2,
    transformer_ffn=32,
)


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm with running stats as parameters."""

    eps: float = 1e-3

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return x * inv + (bias - mean * inv)


class SqueezeExcite(nn.Module):
    """SE over global-mean pooled features (gen-efficientnet semantics:
    reduced width = int(block INPUT channels * se_ratio))."""

    reduced: int

    @nn.compact
    def __call__(self, x):
        pooled = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), name="conv_reduce")(pooled)
        s = jax.nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), name="conv_expand")(s)
        return x * jax.nn.sigmoid(s)


def _act(name: str):
    if name == "silu":
        return jax.nn.silu
    if name == "relu6":
        return lambda x: jnp.minimum(jax.nn.relu(x), 6.0)
    raise ValueError(f"unknown efficientnet activation: {name}")


class DepthwiseSeparable(nn.Module):
    """gen-efficientnet DepthwiseSeparableConv: dw -> bn -> act -> [SE] ->
    pw -> bn (no final activation), residual when shapes allow."""

    spec: BlockSpec
    in_channels: int
    config: EfficientNetConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        act = _act(cfg.activation)
        c_in = x.shape[-1]
        h = nn.Conv(
            c_in, (self.spec.kernel, self.spec.kernel),
            strides=self.spec.stride, padding="SAME",
            feature_group_count=c_in, use_bias=False, name="conv_dw",
        )(x)
        h = FrozenBatchNorm(cfg.bn_eps, name="bn1")(h)
        h = act(h)
        if cfg.use_se:
            h = SqueezeExcite(
                max(1, int(self.in_channels * cfg.se_ratio)), name="se"
            )(h)
        h = nn.Conv(
            self.spec.channels, (1, 1), use_bias=False, name="conv_pw"
        )(h)
        h = FrozenBatchNorm(cfg.bn_eps, name="bn2")(h)
        if self.spec.stride == 1 and c_in == self.spec.channels:
            h = h + x
        return h


class InvertedResidual(nn.Module):
    """gen-efficientnet InvertedResidual (MBConv): pw-expand -> dw -> [SE]
    -> pw-linear, residual when stride 1 and channels match."""

    spec: BlockSpec
    in_channels: int
    config: EfficientNetConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        act = _act(cfg.activation)
        c_in = x.shape[-1]
        mid = c_in * self.spec.expand
        h = nn.Conv(mid, (1, 1), use_bias=False, name="conv_pw")(x)
        h = FrozenBatchNorm(cfg.bn_eps, name="bn1")(h)
        h = act(h)
        h = nn.Conv(
            mid, (self.spec.kernel, self.spec.kernel),
            strides=self.spec.stride, padding="SAME",
            feature_group_count=mid, use_bias=False, name="conv_dw",
        )(h)
        h = FrozenBatchNorm(cfg.bn_eps, name="bn2")(h)
        h = act(h)
        if cfg.use_se:
            h = SqueezeExcite(
                max(1, int(self.in_channels * cfg.se_ratio)), name="se"
            )(h)
        h = nn.Conv(
            self.spec.channels, (1, 1), use_bias=False, name="conv_pwl"
        )(h)
        h = FrozenBatchNorm(cfg.bn_eps, name="bn3")(h)
        if self.spec.stride == 1 and c_in == self.spec.channels:
            h = h + x
        return h


class EfficientNetFeatures(nn.Module):
    """EfficientNet trunk returning the reference Encoder's feature walk
    (unet_adaptive_bins.py:87-100): [input, stem conv, stem bn, stem act,
    stage0..stage6, conv_head, ...]. NCHW boundary."""

    config: EfficientNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        features = [x]
        h = x.transpose(0, 2, 3, 1).astype(self.dtype)

        def emit(v):
            features.append(v.transpose(0, 3, 1, 2).astype(jnp.float32))

        h = nn.Conv(
            cfg.stem_channels, (3, 3), strides=2, padding="SAME",
            use_bias=False, name="conv_stem",
        )(h)
        emit(h)
        h = FrozenBatchNorm(cfg.bn_eps, name="bn1")(h)
        emit(h)
        h = _act(cfg.activation)(h)
        emit(h)
        in_ch = cfg.stem_channels
        for s, spec in enumerate(cfg.blocks):
            for i in range(spec.count):
                block_spec = spec if i == 0 else dataclasses.replace(
                    spec, stride=1
                )
                cls = DepthwiseSeparable if spec.kind == "ds" else InvertedResidual
                h = cls(block_spec, in_ch, cfg, name=f"blocks_{s}_{i}")(h)
                in_ch = spec.channels
            emit(h)
        if cfg.include_head:
            h = nn.Conv(
                cfg.head_channels, (1, 1), use_bias=False, name="conv_head"
            )(h)
            emit(h)
        return features


class UpSampleBN(nn.Module):
    """(unet_adaptive_bins.py:8-31): align-corners bilinear upsample to the
    skip's size, concat, then 2x (conv3x3 -> BN -> LeakyReLU). NHWC."""

    features: int
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, concat_with):
        up = interpolate_bilinear(
            x.transpose(0, 3, 1, 2), concat_with.shape[1:3], align_corners=True
        ).transpose(0, 2, 3, 1).astype(x.dtype)
        h = jnp.concatenate([up, concat_with], axis=-1)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv_0")(h)
        h = FrozenBatchNorm(self.bn_eps, name="bn_1")(h)
        h = nn.leaky_relu(h, 0.01)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv_3")(h)
        h = FrozenBatchNorm(self.bn_eps, name="bn_4")(h)
        return nn.leaky_relu(h, 0.01)


class DecoderBN(nn.Module):
    """(unet_adaptive_bins.py:34-84). NOTE conv2 is a 1x1 conv with
    padding=1 (:39-41) — output grows by 2px per side; reproduced."""

    features: int
    num_classes: int
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, block0, block1, block2, block3, block4):
        f = self.features
        x = nn.Conv(f, (1, 1), padding=1, name="conv2")(block4)
        x = UpSampleBN(f // 2, self.bn_eps, name="up1")(x, block3)
        x = UpSampleBN(f // 4, self.bn_eps, name="up2")(x, block2)
        x = UpSampleBN(f // 8, self.bn_eps, name="up3")(x, block1)
        x = UpSampleBN(f // 16, self.bn_eps, name="up4")(x, block0)
        return nn.Conv(self.num_classes, (3, 3), padding=1, name="conv3")(x)


class TorchTransformerLayer(nn.Module):
    """torch nn.TransformerEncoderLayer, post-norm, relu FFN; (N, S, E)."""

    heads: int
    ffn: int

    @nn.compact
    def __call__(self, x):
        n, s, e = x.shape
        qkv = nn.Dense(3 * e, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(n, s, self.heads, e // self.heads).transpose(
                0, 2, 1, 3
            )

        q, k, v = heads(q), heads(k), heads(v)
        attn = jax.nn.softmax(
            jnp.einsum("nhqd,nhkd->nhqk", q, k) / np.sqrt(e // self.heads),
            axis=-1,
        )
        out = jnp.einsum("nhqk,nhkd->nhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(n, s, e)
        out = nn.Dense(e, name="out_proj")(out)
        x = nn.LayerNorm(name="norm1")(x + out)
        h = nn.Dense(self.ffn, name="linear1")(x)
        h = nn.Dense(e, name="linear2")(jax.nn.relu(h))
        return nn.LayerNorm(name="norm2")(x + h)


class PatchTransformerEncoder(nn.Module):
    """(layers.py:5-39): 16x16 valid-padding patch conv, learned positional
    encodings (first S of 500 rows), 4 transformer layers. NHWC in,
    (N, S, E) out."""

    config: AdaBinsConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        p = cfg.patch_size
        h = nn.Conv(
            cfg.embedding_dim, (p, p), strides=p, padding="VALID",
            name="embedding_convPxP",
        )(x)
        n, hh, ww, e = h.shape
        tokens = h.reshape(n, hh * ww, e)
        pos = self.param(
            "positional_encodings",
            nn.initializers.uniform(1.0),
            (cfg.max_patches, cfg.embedding_dim),
        )
        tokens = tokens + pos[None, : tokens.shape[1]]
        for i in range(cfg.transformer_layers):
            tokens = TorchTransformerLayer(
                cfg.transformer_heads, cfg.transformer_ffn, name=f"layers_{i}"
            )(tokens)
        return tokens


class MiniViT(nn.Module):
    """(mini_vit.py:7-61). Returns (bin_widths_normed, range_attention_maps
    NHWC)."""

    config: AdaBinsConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        tokens = PatchTransformerEncoder(cfg, name="patch_transformer")(x)
        keys = nn.Conv(
            cfg.embedding_dim, (3, 3), padding=1, name="conv3x3"
        )(x)
        head = tokens[:, 0]
        queries = tokens[:, 1 : cfg.n_query_channels + 1]
        # pixel-wise dot product (layers.py:42-55)
        maps = jnp.einsum("nhwc,nqc->nhwq", keys, queries)
        y = nn.Dense(256, name="regressor_0")(head)
        y = nn.Dense(256, name="regressor_2")(nn.leaky_relu(y, 0.01))
        y = nn.Dense(cfg.n_bins, name="regressor_4")(nn.leaky_relu(y, 0.01))
        y = jax.nn.relu(y) + 0.1  # norm="linear" (mini_vit.py:52-55)
        y = y / y.sum(axis=1, keepdims=True)
        return y, maps


class UnetAdaptiveBins(nn.Module):
    """(unet_adaptive_bins.py:103-148). NCHW boundary; images already
    ImageNet-normalized. Returns (bin_edges (N, n_bins+1), pred depth
    (N, 1, h/2, w/2))."""

    config: AdaBinsConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = EfficientNetFeatures(
            cfg.encoder, dtype=self.dtype, name="encoder"
        )
        self.decoder = DecoderBN(
            cfg.decoder_features, cfg.decoder_out, name="decoder"
        )
        self.adaptive_bins_layer = MiniViT(cfg, name="adaptive_bins_layer")
        self.conv_out_conv = nn.Conv(cfg.n_bins, (1, 1), name="conv_out")

    def __call__(self, x):
        cfg = self.config
        features = self.encoder(x)
        nhwc = [
            features[i].transpose(0, 2, 3, 1) for i in (4, 5, 6, 8, 11)
        ]
        unet_out = self.decoder(*nhwc)
        widths_normed, maps = self.adaptive_bins_layer(unet_out)
        out = jax.nn.softmax(self.conv_out_conv(maps), axis=-1)

        widths = (cfg.max_val - cfg.min_val) * widths_normed
        widths = jnp.pad(
            widths, ((0, 0), (1, 0)), constant_values=cfg.min_val
        )
        edges = jnp.cumsum(widths, axis=1)
        centers = 0.5 * (edges[:, :-1] + edges[:, 1:])
        pred = jnp.einsum("nhwc,nc->nhw", out, centers)[:, None]
        return edges, pred.astype(jnp.float32)


def _np(tensor) -> np.ndarray:
    return np.asarray(
        tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor,
        dtype=np.float32,
    )


def convert_efficientnet(
    sd: Dict, prefix: str, config: EfficientNetConfig
) -> Dict:
    """gen-efficientnet state dict (keys ``{prefix}.conv_stem.weight``,
    ``{prefix}.blocks.{s}.{i}.*``, ...) -> EfficientNetFeatures params."""

    def conv(name, depthwise=False):
        w = _np(sd[f"{name}.weight"])
        kernel = w.transpose(2, 3, 1, 0)
        out = {"kernel": kernel}
        if f"{name}.bias" in sd:
            out["bias"] = _np(sd[f"{name}.bias"])
        return out

    def bn(name):
        return {
            "scale": _np(sd[f"{name}.weight"]),
            "bias": _np(sd[f"{name}.bias"]),
            "mean": _np(sd[f"{name}.running_mean"]),
            "var": _np(sd[f"{name}.running_var"]),
        }

    encoder = {
        "conv_stem": conv(f"{prefix}.conv_stem"),
        "bn1": bn(f"{prefix}.bn1"),
    }
    if config.include_head:
        encoder["conv_head"] = conv(f"{prefix}.conv_head")
    for s, spec in enumerate(config.blocks):
        for i in range(spec.count):
            t = f"{prefix}.blocks.{s}.{i}"
            block = {"conv_dw": conv(f"{t}.conv_dw", depthwise=True)}
            if config.use_se:
                block["se"] = {
                    "conv_reduce": conv(f"{t}.se.conv_reduce"),
                    "conv_expand": conv(f"{t}.se.conv_expand"),
                }
            if spec.kind == "ds":
                block["bn1"] = bn(f"{t}.bn1")
                block["conv_pw"] = conv(f"{t}.conv_pw")
                block["bn2"] = bn(f"{t}.bn2")
            else:
                block["conv_pw"] = conv(f"{t}.conv_pw")
                block["bn1"] = bn(f"{t}.bn1")
                block["bn2"] = bn(f"{t}.bn2")
                block["conv_pwl"] = conv(f"{t}.conv_pwl")
                block["bn3"] = bn(f"{t}.bn3")
            encoder[f"blocks_{s}_{i}"] = block
    return encoder


def convert_adabins(state_dict: Dict, config: AdaBinsConfig) -> Dict:
    """AdaBins checkpoint (model_io strips the DataParallel ``module.``
    prefix; keys encoder.original_model.* / decoder.* /
    adaptive_bins_layer.* / conv_out.0.*) -> flax params."""
    sd = {
        (k[len("module.") :] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }

    def conv(name, depthwise=False):
        w = _np(sd[f"{name}.weight"])
        # torch dw (C,1,k,k) -> flax grouped (k,k,1,C)
        kernel = (
            w.transpose(2, 3, 1, 0) if depthwise else w.transpose(2, 3, 1, 0)
        )
        out = {"kernel": kernel}
        if f"{name}.bias" in sd:
            out["bias"] = _np(sd[f"{name}.bias"])
        return out

    def bn(name):
        return {
            "scale": _np(sd[f"{name}.weight"]),
            "bias": _np(sd[f"{name}.bias"]),
            "mean": _np(sd[f"{name}.running_mean"]),
            "var": _np(sd[f"{name}.running_var"]),
        }

    def dense(name):
        return {
            "kernel": _np(sd[f"{name}.weight"]).T,
            "bias": _np(sd[f"{name}.bias"]),
        }

    params: Dict = {}
    enc_prefix = "encoder.original_model"
    if f"{enc_prefix}.conv_stem.weight" not in sd:
        encoder = None
    else:
        encoder = convert_efficientnet(sd, enc_prefix, config.encoder)

    def upsample(name):
        return {
            "conv_0": conv(f"{name}._net.0"),
            "bn_1": bn(f"{name}._net.1"),
            "conv_3": conv(f"{name}._net.3"),
            "bn_4": bn(f"{name}._net.4"),
        }

    decoder = None
    if "decoder.conv2.weight" in sd:
        decoder = {
            "conv2": conv("decoder.conv2"),
            "up1": upsample("decoder.up1"),
            "up2": upsample("decoder.up2"),
            "up3": upsample("decoder.up3"),
            "up4": upsample("decoder.up4"),
            "conv3": conv("decoder.conv3"),
        }

    def transformer_layer(name):
        w = _np(sd[f"{name}.self_attn.in_proj_weight"])
        b = _np(sd[f"{name}.self_attn.in_proj_bias"])
        return {
            "in_proj": {"kernel": w.T, "bias": b},
            "out_proj": dense(f"{name}.self_attn.out_proj"),
            "linear1": dense(f"{name}.linear1"),
            "linear2": dense(f"{name}.linear2"),
            "norm1": {
                "scale": _np(sd[f"{name}.norm1.weight"]),
                "bias": _np(sd[f"{name}.norm1.bias"]),
            },
            "norm2": {
                "scale": _np(sd[f"{name}.norm2.weight"]),
                "bias": _np(sd[f"{name}.norm2.bias"]),
            },
        }

    pt = "adaptive_bins_layer.patch_transformer"
    bins_layer = None
    if f"{pt}.positional_encodings" in sd:
        bins_layer = {
            "patch_transformer": {
                "embedding_convPxP": conv(f"{pt}.embedding_convPxP"),
                "positional_encodings": _np(sd[f"{pt}.positional_encodings"]),
                **{
                    f"layers_{i}": transformer_layer(
                        f"{pt}.transformer_encoder.layers.{i}"
                    )
                    for i in range(config.transformer_layers)
                },
            },
            "conv3x3": conv("adaptive_bins_layer.conv3x3"),
            "regressor_0": dense("adaptive_bins_layer.regressor.0"),
            "regressor_2": dense("adaptive_bins_layer.regressor.2"),
            "regressor_4": dense("adaptive_bins_layer.regressor.4"),
        }
    if encoder is not None:
        params["encoder"] = encoder
    if decoder is not None:
        params["decoder"] = decoder
    if bins_layer is not None:
        params["adaptive_bins_layer"] = bins_layer
    if "conv_out.0.weight" in sd:
        params["conv_out"] = conv("conv_out.0")
    return params


DATASETS = {
    "nyu": dict(min_depth=1e-3, max_depth=10.0),
    "kitti": dict(min_depth=1e-3, max_depth=80.0),
}


class AdaBinsDepth:
    """AdaBins depth wrapper (reference adabins_depth.py:19-49 +
    infer.py:43-74): area-clamped pre-resize, normalize, flip-averaged
    UnetAdaptiveBins, clamp + align-corners upsample back."""

    def __init__(self, name: str = "nyu", tiny: bool = False):
        if name not in DATASETS:
            raise ValueError(f"unknown adabins checkpoint: {name}")
        self.name = name
        self.tiny = tiny
        spec = DATASETS[name]
        self.min_depth = spec["min_depth"]
        self.max_depth = spec["max_depth"]
        config = TINY_ADABINS if tiny else AdaBinsConfig(
            min_val=self.min_depth, max_val=self.max_depth
        )
        self.config = config
        self.module = UnetAdaptiveBins(config, dtype=jnp.bfloat16)
        path = None if tiny else find_checkpoint(
            f"AdaBins_{name}", f"adabins_{name}"
        )
        if path is not None:
            state = load_state_dict(path)
            state = state.get("model", state)
            self.params = jax.device_put(
                jax.tree.map(jnp.asarray, convert_adabins(state, config)),
                jax.devices()[0],
            )
        elif tiny:
            size = 32
            self.params = init_by_shape(
                self.module.init,
                jax.random.PRNGKey(0),
                jnp.zeros((1, 3, size, size)),
            )["params"]
        else:
            raise NotImplementedError(
                f"AdaBins_{name} weights not found in the checkpoint cache; "
                "download the reference checkpoint "
                "(adabins_depth.py:12-15) into the cache first"
            )
        self._jit_predict = jax.jit(self._predict)

    def _predict(self, params, images):
        """infer.py:43-74. images (N, 3, H, W) in [0, 1]."""
        mean = jnp.asarray(IMAGENET_MEAN)[None, :, None, None]
        std = jnp.asarray(IMAGENET_STD)[None, :, None, None]

        def run(x):
            _, pred = self.module.apply({"params": params}, x)
            return jnp.clip(pred, self.min_depth, self.max_depth)

        pred = run((images - mean) / std)
        # flip branch intentionally NOT normalized (infer.py:52-54 quirk)
        pred_lr = run(images[:, :, :, ::-1])[:, :, :, ::-1]
        final = (pred + pred_lr) / 2.0
        final = interpolate_bilinear(
            final, images.shape[-2:], align_corners=True
        )
        return jnp.clip(final, self.min_depth, self.max_depth)

    def __call__(self, images):
        """images (N, 3, H, W) in [0, 1] -> depth (N, 1, H, W).

        Area-based pre-resize (adabins_depth.py:35-47): lanczos3 down when
        area > 500k px, bicubic up when area < 448^2.
        """
        images = jnp.asarray(images, jnp.float32)
        h, w = images.shape[-2:]
        area = h * w
        if self.tiny:
            pass
        elif area > MAX_ADABINS_AREA:
            scale = float(np.sqrt(MAX_ADABINS_AREA) / np.sqrt(area))
            images = resize(
                images, out_shape=(int(h * scale), int(w * scale)),
                resample="lanczos3",
            )
        elif area < MIN_ADABINS_AREA:
            scale = float(np.sqrt(MIN_ADABINS_AREA) / np.sqrt(area))
            images = resize(
                images, out_shape=(int(h * scale), int(w * scale)),
                resample="bicubic",
            )
        return self._jit_predict(self.params, images)
