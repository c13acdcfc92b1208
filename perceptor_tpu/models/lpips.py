"""LPIPS perceptual distance (squeeze / alex / vgg backbones) in flax.

Functional spec: the `lpips` package consumed by reference
perceptor/losses/lpips.py:6-27: scale-shift input normalization, backbone
feature taps, per-pixel channel L2-normalization, squared differences
through non-negative 1x1 linear heads, spatial mean, sum over layers.

Backbones are torchvision-compatible (alexnet / squeezenet1_1 / vgg16
`features` trunks); converters accept torchvision state_dicts for the
trunks and lpips `lin{k}.model.1.weight` heads.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from perceptor_tpu import utils
from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.models.vgg import VGG16_CFG, VGGFeatures, convert_torchvision_features
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict

# lpips ScalingLayer constants
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)

LPIPS_CHANNELS = {
    "alex": (64, 192, 384, 256, 256),
    "vgg": (64, 128, 256, 512, 512),
    "squeeze": (64, 128, 256, 384, 384, 512, 512),
}


class AlexFeatures(nn.Module):
    """torchvision AlexNet features with taps after each ReLU. NCHW."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        x = images.transpose(0, 2, 3, 1).astype(self.dtype)
        taps = []
        specs = [  # (out, kernel, stride, pad, pool_before)
            (64, 11, 4, 2, False),
            (192, 5, 1, 2, True),
            (384, 3, 1, 1, True),
            (256, 3, 1, 1, False),
            (256, 3, 1, 1, False),
        ]
        for i, (out, k, s, p, pool) in enumerate(specs):
            if pool:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = nn.Conv(
                out, (k, k), strides=(s, s), padding=p, dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            x = jax.nn.relu(x)
            taps.append(x.transpose(0, 3, 1, 2).astype(jnp.float32))
        return taps


class Fire(nn.Module):
    squeeze_ch: int
    expand_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jax.nn.relu(
            nn.Conv(self.squeeze_ch, (1, 1), dtype=self.dtype, name="squeeze")(x)
        )
        e1 = nn.Conv(self.expand_ch, (1, 1), dtype=self.dtype, name="expand1x1")(s)
        e3 = nn.Conv(
            self.expand_ch, (3, 3), padding=1, dtype=self.dtype, name="expand3x3"
        )(s)
        return jax.nn.relu(jnp.concatenate([e1, e3], axis=-1))


class SqueezeFeatures(nn.Module):
    """torchvision squeezenet1_1 features, 7 LPIPS taps. NCHW."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        x = images.transpose(0, 2, 3, 1).astype(self.dtype)
        taps = []

        def tap(x):
            taps.append(x.transpose(0, 3, 1, 2).astype(jnp.float32))

        x = jax.nn.relu(
            nn.Conv(64, (3, 3), strides=(2, 2), dtype=self.dtype, name="conv_0")(x)
        )
        tap(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = Fire(16, 64, self.dtype, name="fire_3")(x)
        x = Fire(16, 64, self.dtype, name="fire_4")(x)
        tap(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = Fire(32, 128, self.dtype, name="fire_6")(x)
        x = Fire(32, 128, self.dtype, name="fire_7")(x)
        tap(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = Fire(48, 192, self.dtype, name="fire_9")(x)
        tap(x)
        x = Fire(48, 192, self.dtype, name="fire_10")(x)
        tap(x)
        x = Fire(64, 256, self.dtype, name="fire_11")(x)
        tap(x)
        x = Fire(64, 256, self.dtype, name="fire_12")(x)
        tap(x)
        return taps


def _normalize(features, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(features), axis=1, keepdims=True))
    return features / (norm + eps)


@utils.cache
class LPIPS:
    def __init__(self, name: str = "squeeze", linear_layers: bool = True,
                 spatial: bool = False):
        if name not in LPIPS_CHANNELS:
            raise ValueError(f"unknown lpips backbone: {name}")
        self.name = name
        self.linear_layers = linear_layers
        self.spatial = spatial
        self.channels = LPIPS_CHANNELS[name]
        if name == "alex":
            self.backbone = AlexFeatures()
        elif name == "squeeze":
            self.backbone = SqueezeFeatures()
        else:
            self.backbone = VGGFeatures(cfg=VGG16_CFG, taps=(4, 9, 16, 23, 30))
        self.params = self._load_or_init_params()
        self._jit_distance = jax.jit(self.distance_fn)

    def _load_or_init_params(self):
        backbone_path = find_checkpoint(f"lpips_{self.name}_backbone", self.name)
        lin_path = find_checkpoint(f"lpips_{self.name}_lin")
        if backbone_path is not None:
            state = load_state_dict(backbone_path)
            if self.name == "vgg":
                backbone = convert_torchvision_features(state, VGG16_CFG)
            else:
                backbone = _convert_torchvision_trunk(state, self.name)
        else:
            backbone = init_by_shape(
                self.backbone.init, jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64))
            )["params"]
        lins = None
        if lin_path is not None:
            lins = _convert_lpips_lins(load_state_dict(lin_path), self.channels)
        if lins is None:
            # uniform positive heads keep the metric meaningful untrained
            lins = [
                np.full((c, 1), 1.0 / c, dtype=np.float32) for c in self.channels
            ]
        return {
            "backbone": backbone,
            "lins": [jnp.asarray(lin) for lin in lins],
        }

    def distance_fn(self, params, images_a, images_b):
        """Pure LPIPS distance for fused steps. Images in [0,1]."""
        shift = jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)
        scale = jnp.asarray(_SCALE).reshape(1, 3, 1, 1)

        def scaled(images):
            return ((images * 2 - 1) - shift) / scale

        feats_a = self.backbone.apply({"params": params["backbone"]}, scaled(images_a))
        feats_b = self.backbone.apply({"params": params["backbone"]}, scaled(images_b))
        total = 0.0
        for fa, fb, lin in zip(feats_a, feats_b, params["lins"]):
            diff = jnp.square(_normalize(fa) - _normalize(fb))  # (N,C,H,W)
            if self.linear_layers:
                weighted = jnp.einsum("nchw,co->nohw", diff, lin)
            else:
                weighted = diff.mean(axis=1, keepdims=True)
            if self.spatial:
                total = total + jax.image.resize(
                    weighted, (*weighted.shape[:2], *images_a.shape[-2:]), "linear"
                )
            else:
                total = total + weighted.mean(axis=(2, 3))
        return total

    def __call__(self, images_a, images_b):
        return self._jit_distance(self.params, images_a, images_b)

    forward = __call__


def _convert_torchvision_trunk(state_dict: Dict, name: str) -> Dict:
    """torchvision alexnet / squeezenet1_1 features -> flax trees."""
    from perceptor_tpu.models.clip.convert import _np

    def conv(prefix):
        return {
            "kernel": _np(state_dict[f"{prefix}.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(state_dict[f"{prefix}.bias"]),
        }

    def maybe(prefix):
        return prefix if f"{prefix}.weight" in state_dict else prefix.replace(
            "features.", ""
        )

    if name == "alex":
        indices = [0, 3, 6, 8, 10]
        return {f"conv_{i}": conv(maybe(f"features.{idx}"))
                for i, idx in enumerate(indices)}
    # squeezenet1_1
    params = {"conv_0": conv(maybe("features.0"))}
    for idx in (3, 4, 6, 7, 9, 10, 11, 12):
        params[f"fire_{idx}"] = {
            "squeeze": conv(maybe(f"features.{idx}.squeeze")),
            "expand1x1": conv(maybe(f"features.{idx}.expand1x1")),
            "expand3x3": conv(maybe(f"features.{idx}.expand3x3")),
        }
    return params


def _convert_lpips_lins(state_dict: Dict, channels) -> List[np.ndarray]:
    """lpips `lin{k}.model.1.weight` (or `lins.{k}...`) -> (C,1) arrays."""
    from perceptor_tpu.models.clip.convert import _np

    lins = []
    for k, c in enumerate(channels):
        for key in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
            if key in state_dict:
                lins.append(_np(state_dict[key])[:, :, 0, 0].T)  # (1,C,1,1)->(C,1)
                break
        else:
            return None
    return lins
