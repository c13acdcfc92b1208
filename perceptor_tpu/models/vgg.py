"""VGG feature extractors (torchvision-compatible) in flax.

Functional spec: reference perceptor/models/vgg/vgg.py:5-25 (raw vgg19
`.features` trunk with /8 size guard) and the slice taps used by
losses/style_transfer.py:64-69 ((0,4)(4,9)(9,16)(16,23)(23,30)) and by
LPIPS' vgg16 backbone (relu1_2 .. relu5_3).

Generic over the torchvision config strings; converters map
`features.{i}.weight` state_dicts by conv index.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from perceptor_tpu import utils
from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict

# torchvision configs: number = conv out channels, "M" = 2x2 maxpool
VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M")
VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M")

# torchvision features indices of each layer for a cfg: conv,relu per number;
# maxpool per M. Used to translate slice boundaries to (conv_count, op list).
def _layers(cfg) -> List[Tuple[str, int]]:
    layers = []
    for v in cfg:
        if v == "M":
            layers.append(("pool", 0))
        else:
            layers.append(("conv", v))
            layers.append(("relu", 0))
    return layers


class VGGFeatures(nn.Module):
    """Runs the trunk, returning activations at `taps` (torchvision
    features indices, exclusive ends). NCHW in, list of NCHW out."""

    cfg: Tuple = VGG19_CFG
    taps: Tuple[int, ...] = (4, 9, 16, 23, 30)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        x = images.transpose(0, 2, 3, 1).astype(self.dtype)
        outputs = []
        conv_index = 0
        for index, (kind, channels) in enumerate(_layers(self.cfg)):
            if kind == "conv":
                x = nn.Conv(
                    channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"conv_{conv_index}",
                )(x)
                conv_index += 1
            elif kind == "relu":
                x = jax.nn.relu(x)
            else:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if index + 1 in self.taps:
                outputs.append(x.transpose(0, 3, 1, 2).astype(jnp.float32))
        return outputs


def convert_torchvision_features(state_dict: Dict, cfg) -> Dict:
    """torchvision `features.{i}.weight/bias` -> {conv_{k}: {kernel, bias}}."""
    from perceptor_tpu.models.clip.convert import _np

    params = {}
    conv_index = 0
    layer_index = 0
    for kind, _ in _layers(cfg):
        if kind == "conv":
            prefix = f"features.{layer_index}"
            if f"{prefix}.weight" not in state_dict:
                # allow bare "0.weight" (a `.features` state_dict)
                prefix = str(layer_index)
            params[f"conv_{conv_index}"] = {
                "kernel": _np(state_dict[f"{prefix}.weight"]).transpose(2, 3, 1, 0),
                "bias": _np(state_dict[f"{prefix}.bias"]),
            }
            conv_index += 1
        layer_index += 1
    return params


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


@utils.cache
class VGG19:
    """Raw VGG19 trunk (reference models/vgg/vgg.py:5-25): forward returns
    the final pooled feature map; `activations()` returns the style-transfer
    slice taps."""

    def __init__(self):
        self.module = VGGFeatures(cfg=VGG19_CFG, taps=(4, 9, 16, 23, 30, 37))
        path = find_checkpoint("vgg19", "vgg19_features")
        if path is not None:
            self.params = jax.device_put(
                convert_torchvision_features(load_state_dict(path), VGG19_CFG),
                jax.devices()[0],
            )
        else:
            self.params = init_by_shape(
                self.module.init, jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32))
            )["params"]
        self._jit = jax.jit(
            lambda params, images: self.module.apply({"params": params}, images)
        )

    def activations_fn(self, params, images) -> List[jax.Array]:
        return self.module.apply({"params": params}, images)

    def activations(self, images) -> List[jax.Array]:
        return self._jit(self.params, images)

    def __call__(self, images) -> jax.Array:
        _, _, height, width = images.shape
        if width % 8 or height % 8:
            raise ValueError("Height and width must be divisible by 8")
        return self.activations(images)[-1]

    forward = __call__
