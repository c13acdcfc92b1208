"""torchvision-compatible ResNet / ResNeXt feature trunks.

Built as the shared CNN backbone for MiDaS v21 (reference
perceptor/models/midas_depth/blocks.py:141-157 wraps torchvision's
resnext101_32x8d_wsl) and other reference models that ride torchvision
ResNets. Semantics follow torchvision.models.resnet: 7x7/2 stem + 3x3/2
maxpool, Bottleneck blocks (1x1 -> grouped 3x3/stride -> 1x1, expansion
4) with post-add ReLU, eval-mode BatchNorm.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from perceptor_tpu.models.adabins_depth import FrozenBatchNorm


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    layers: Tuple[int, ...] = (3, 4, 23, 3)
    groups: int = 1
    width_per_group: int = 64
    stem_width: int = 64
    base_planes: Tuple[int, ...] = (64, 128, 256, 512)
    expansion: int = 4
    bn_eps: float = 1e-5

    @property
    def stage_channels(self) -> Tuple[int, ...]:
        return tuple(p * self.expansion for p in self.base_planes)


RESNEXT101_32X8D = ResNetConfig(groups=32, width_per_group=8)
RESNET152 = ResNetConfig(layers=(3, 8, 36, 3))
RESNET50 = ResNetConfig(layers=(3, 4, 6, 3))
TINY_RESNEXT = ResNetConfig(
    layers=(1, 1, 1, 1), groups=2, width_per_group=32,
    stem_width=8, base_planes=(4, 8, 16, 32),
)


class Bottleneck(nn.Module):
    """torchvision Bottleneck: width = planes * width_per_group/64 * groups."""

    planes: int
    stride: int
    groups: int
    width_per_group: int
    expansion: int
    bn_eps: float

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * self.width_per_group / 64.0) * self.groups
        out_ch = self.planes * self.expansion
        identity = x
        h = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x)
        h = FrozenBatchNorm(self.bn_eps, name="bn1")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(
            width, (3, 3), strides=self.stride, padding=1,
            feature_group_count=self.groups, use_bias=False, name="conv2",
        )(h)
        h = FrozenBatchNorm(self.bn_eps, name="bn2")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(h)
        h = FrozenBatchNorm(self.bn_eps, name="bn3")(h)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(
                out_ch, (1, 1), strides=self.stride, use_bias=False,
                name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(self.bn_eps, name="downsample_bn")(
                identity
            )
        return jax.nn.relu(h + identity)


class ResNetFeatures(nn.Module):
    """Stem + 4 stages; NHWC in/out, returns the 4 stage feature maps
    (layer1 output includes stem + maxpool, matching MiDaS's grouping,
    blocks.py:141-152)."""

    config: ResNetConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.Conv(
            cfg.stem_width, (7, 7), strides=2, padding=3, use_bias=False,
            name="conv1",
        )(x)
        h = FrozenBatchNorm(cfg.bn_eps, name="bn1")(h)
        h = jax.nn.relu(h)
        h = nn.max_pool(
            h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )
        features = []
        for stage, (planes, count) in enumerate(
            zip(cfg.base_planes, cfg.layers)
        ):
            for i in range(count):
                stride = 2 if (stage > 0 and i == 0) else 1
                h = Bottleneck(
                    planes, stride, cfg.groups, cfg.width_per_group,
                    cfg.expansion, cfg.bn_eps, name=f"layer{stage + 1}_{i}",
                )(h)
            features.append(h)
        return tuple(features)


def convert_resnet(
    state_dict: Dict, config: ResNetConfig, prefix: str = ""
) -> Dict:
    """torchvision ResNet state_dict -> ResNetFeatures params."""
    sd = {
        k[len(prefix) :]: v
        for k, v in state_dict.items()
        if k.startswith(prefix)
    }

    def _np(t) -> np.ndarray:
        return np.asarray(
            t.detach().cpu().numpy() if hasattr(t, "detach") else t,
            dtype=np.float32,
        )

    def conv(name):
        return {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}

    def bn(name):
        return {
            "scale": _np(sd[f"{name}.weight"]),
            "bias": _np(sd[f"{name}.bias"]),
            "mean": _np(sd[f"{name}.running_mean"]),
            "var": _np(sd[f"{name}.running_var"]),
        }

    params = {"conv1": conv("conv1"), "bn1": bn("bn1")}
    for stage, count in enumerate(config.layers):
        for i in range(count):
            t = f"layer{stage + 1}.{i}"
            block = {
                "conv1": conv(f"{t}.conv1"),
                "bn1": bn(f"{t}.bn1"),
                "conv2": conv(f"{t}.conv2"),
                "bn2": bn(f"{t}.bn2"),
                "conv3": conv(f"{t}.conv3"),
                "bn3": bn(f"{t}.bn3"),
            }
            if f"{t}.downsample.0.weight" in sd:
                block["downsample_conv"] = conv(f"{t}.downsample.0")
                block["downsample_bn"] = bn(f"{t}.downsample.1")
            params[f"layer{stage + 1}_{i}"] = block
    return params
