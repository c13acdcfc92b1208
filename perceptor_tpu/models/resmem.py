"""ResMem memorability predictor in flax.

Functional spec: reference perceptor/losses/memorability.py:7-24 wraps the
external `resmem` package's `ResMem(pretrained=True)` -- a dual-branch CNN
regressor (Needell & Bainbridge 2021) scoring image memorability in [0,1]
from 227x227 RGB crops in [0,1] (the reference applies Resize(256) +
CenterCrop(227) and NO ImageNet normalization).

The two documented branches are exact torchvision architectures:
- MemNet branch: AlexNet conv features + the fc6/fc7 MLP (Khosla et al.
  LaMem heritage) -> 4096-d,
- residual branch: ResNet-152 trunk -> global-average-pooled 2048-d
  (reuses models/resnet.py, already torchvision-parity-tested).
Both feed a small MLP regression head ending in a sigmoid.  The `resmem`
package defines the published head weights; in this zero-egress build the
trunks are exact/parity-tested and `convert_resmem` maps a checkpoint with
the layout below when one is cached, else params are random-init (same
shapes/FLOPs).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from perceptor_tpu import utils
from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.models.resnet import RESNET152, ResNetConfig, ResNetFeatures, TINY_RESNEXT
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict

CROP_SIZE = 227


class AlexNetFeatures(nn.Module):
    """torchvision.models.alexnet `features` + fc6/fc7 (dropout-free eval).

    NHWC in; returns the 4096-d fc7 activation.
    """

    width_mult: int = 1  # tiny configs shrink every width by this divisor

    @nn.compact
    def __call__(self, x):
        m = self.width_mult

        def conv(ch, kernel, stride, pad, name):
            return nn.Conv(
                ch // m, (kernel, kernel), strides=stride, padding=pad, name=name
            )

        h = jax.nn.relu(conv(64, 11, 4, 2, "conv1")(x))
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = jax.nn.relu(conv(192, 5, 1, 2, "conv2")(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = jax.nn.relu(conv(384, 3, 1, 1, "conv3")(h))
        h = jax.nn.relu(conv(256, 3, 1, 1, "conv4")(h))
        h = jax.nn.relu(conv(256, 3, 1, 1, "conv5")(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        # torchvision's AdaptiveAvgPool2d((6,6)) is the identity for the
        # 227x227 ResMem input (feature map is already 6x6)
        h = h.reshape(h.shape[0], -1)  # NHWC flatten; converter permutes fc6
        h = jax.nn.relu(nn.Dense(4096 // m, name="fc6")(h))
        h = jax.nn.relu(nn.Dense(4096 // m, name="fc7")(h))
        return h


class ResMemNet(nn.Module):
    """Dual-branch memorability regressor; NCHW [0,1] 227x227 in, (N,) out."""

    resnet_config: ResNetConfig = RESNET152
    width_mult: int = 1

    @nn.compact
    def __call__(self, images):
        x = images.transpose(0, 2, 3, 1)  # NHWC for the conv trunks
        mem = AlexNetFeatures(self.width_mult, name="alexnet")(x)
        stages = ResNetFeatures(self.resnet_config, name="resnet")(x)
        res = jnp.mean(stages[-1], axis=(1, 2))  # global average pool
        h = jnp.concatenate([mem, res], axis=-1)
        m = self.width_mult
        h = jax.nn.relu(nn.Dense(1024 // m, name="head1")(h))
        h = jax.nn.relu(nn.Dense(256 // m, name="head2")(h))
        return jax.nn.sigmoid(nn.Dense(1, name="head3")(h))[:, 0]


def convert_resmem(state_dict: Dict, config=RESNET152, spatial: int = 6) -> Dict:
    """torch ResMem-layout state_dict -> ResMemNet params.

    Expected names: alexnet `features.{0,3,6,8,10}.{weight,bias}` +
    `fc6/fc7`, resnet152 under `resnet.`, head `head{1,2,3}`.  The fc6
    kernel is permuted from torch's NCHW flatten to our NHWC flatten
    (`spatial` = the post-pool feature-map side, 6 for the 227 input).
    """
    import numpy as np

    from perceptor_tpu.models.resnet import convert_resnet

    def _np(t):
        return np.asarray(
            t.detach().cpu().numpy() if hasattr(t, "detach") else t,
            dtype=np.float32,
        )

    def conv(name):
        return {
            "kernel": _np(state_dict[f"{name}.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(state_dict[f"{name}.bias"]),
        }

    def linear(name):
        return {
            "kernel": _np(state_dict[f"{name}.weight"]).T,
            "bias": _np(state_dict[f"{name}.bias"]),
        }

    fc6_w = _np(state_dict["fc6.weight"])  # (4096, C*s*s), torch CHW order
    n_out = fc6_w.shape[0]
    s = spatial
    ch = fc6_w.shape[1] // (s * s)
    fc6_kernel = (
        fc6_w.reshape(n_out, ch, s, s).transpose(2, 3, 1, 0).reshape(-1, n_out)
    )
    return {
        "alexnet": {
            "conv1": conv("features.0"),
            "conv2": conv("features.3"),
            "conv3": conv("features.6"),
            "conv4": conv("features.8"),
            "conv5": conv("features.10"),
            "fc6": {"kernel": fc6_kernel, "bias": _np(state_dict["fc6.bias"])},
            "fc7": linear("fc7"),
        },
        "resnet": convert_resnet(state_dict, config, prefix="resnet."),
        "head1": linear("head1"),
        "head2": linear("head2"),
        "head3": linear("head3"),
    }


@utils.cache
class ResMem:
    """Frozen memorability scorer (reference memorability.py:16-18)."""

    def __init__(self, name: str = "resmem"):
        if name == "tiny":
            self.module = ResMemNet(resnet_config=TINY_RESNEXT, width_mult=8)
            self.crop_size = 63  # smallest size the AlexNet stride chain allows
        elif name == "resmem":
            self.module = ResMemNet()
            self.crop_size = CROP_SIZE
        else:
            raise ValueError(f"unknown ResMem variant: {name}")

        path = find_checkpoint("resmem", name) if name == "resmem" else None
        if path is not None:
            self.params = jax.device_put(
                convert_resmem(load_state_dict(path)), jax.devices()[0]
            )
        else:
            self.params = init_by_shape(
                self.module.init,
                jax.random.PRNGKey(0),
                jnp.zeros((1, 3, self.crop_size, self.crop_size)),
            )["params"]
        self._jit = jax.jit(self.predict_fn)

    def predict_fn(self, params, images) -> jax.Array:
        """images (N,3,crop,crop) in [0,1] -> (N,) memorability scores."""
        return self.module.apply({"params": params}, images)

    def predict(self, images) -> jax.Array:
        return self._jit(self.params, images)
