"""midas_v21_small parity against the vendored MidasNet_small with the
torch.hub efficientnet_lite3 replaced by a local twin."""

import dataclasses
import importlib
import math
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.models.adabins_depth import EfficientNetConfig
from perceptor_tpu.models.midas_depth import (
    MidasDepth,
    MidasNetSmall,
    MidasNetSmallConfig,
    _lite3_encoder,
    convert_midas_net_small,
)


def _load_reference():
    pytest.importorskip("torch")
    if "timm" not in sys.modules:
        sys.modules["timm"] = types.ModuleType("timm")
    if "refmidas" not in sys.modules:
        pkg = types.ModuleType("refmidas")
        pkg.__path__ = ["/root/reference/perceptor/models/midas_depth"]
        sys.modules["refmidas"] = pkg
    return importlib.import_module("refmidas.midas_net_custom")


def _torch_lite_backend(torch, cfg: EfficientNetConfig):
    """gen-efficientnet tf_efficientnet_lite3-equivalent twin: TF-SAME
    padding, relu6, no SE, eval BN (eps 1e-3)."""
    nn = torch.nn
    F = torch.nn.functional

    class Conv2dSame(nn.Conv2d):
        def forward(self, x):
            ih, iw = x.shape[-2:]
            k, s = self.kernel_size, self.stride
            ph = max((math.ceil(ih / s[0]) - 1) * s[0] + k[0] - ih, 0)
            pw = max((math.ceil(iw / s[1]) - 1) * s[1] + k[1] - iw, 0)
            x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
            return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                            self.dilation, self.groups)

    def bn(c):
        return nn.BatchNorm2d(c, eps=cfg.bn_eps)

    class DS(nn.Module):
        def __init__(self, cin, spec):
            super().__init__()
            self.conv_dw = Conv2dSame(
                cin, cin, spec.kernel, spec.stride, groups=cin, bias=False
            )
            self.bn1 = bn(cin)
            self.conv_pw = nn.Conv2d(cin, spec.channels, 1, bias=False)
            self.bn2 = bn(spec.channels)
            self.residual = spec.stride == 1 and cin == spec.channels

        def forward(self, x):
            h = self.bn2(self.conv_pw(F.relu6(self.bn1(self.conv_dw(x)))))
            return h + x if self.residual else h

    class IR(nn.Module):
        def __init__(self, cin, spec):
            super().__init__()
            mid = cin * spec.expand
            self.conv_pw = nn.Conv2d(cin, mid, 1, bias=False)
            self.bn1 = bn(mid)
            self.conv_dw = Conv2dSame(
                mid, mid, spec.kernel, spec.stride, groups=mid, bias=False
            )
            self.bn2 = bn(mid)
            self.conv_pwl = nn.Conv2d(mid, spec.channels, 1, bias=False)
            self.bn3 = bn(spec.channels)
            self.residual = spec.stride == 1 and cin == spec.channels

        def forward(self, x):
            h = F.relu6(self.bn1(self.conv_pw(x)))
            h = F.relu6(self.bn2(self.conv_dw(h)))
            h = self.bn3(self.conv_pwl(h))
            return h + x if self.residual else h

    backend = nn.Module()
    backend.conv_stem = Conv2dSame(3, cfg.stem_channels, 3, 2, bias=False)
    backend.bn1 = bn(cfg.stem_channels)
    backend.act1 = nn.ReLU6()
    stages = []
    cin = cfg.stem_channels
    for spec in cfg.blocks:
        blocks = []
        for i in range(spec.count):
            sp = spec if i == 0 else dataclasses.replace(spec, stride=1)
            blocks.append(DS(cin, sp) if spec.kind == "ds" else IR(cin, sp))
            cin = spec.channels
        stages.append(nn.Sequential(*blocks))
    backend.blocks = nn.Sequential(*stages)
    return backend


def _randomize_bn(model, torch):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)


@pytest.mark.slow
def test_parity_midas_v21_small():
    import torch

    mnc = _load_reference()
    # real lite3 channel widths (scratch hardcodes 32/48/136/384,
    # blocks.py:51-56) with single-block stages
    enc_cfg = dataclasses.replace(
        _lite3_encoder(),
        blocks=tuple(
            dataclasses.replace(b, count=1) for b in _lite3_encoder().blocks
        ),
    )
    torch.manual_seed(0)
    twin = _torch_lite_backend(torch, enc_cfg).eval()

    blocks_mod = importlib.import_module("refmidas.blocks")
    orig = blocks_mod.torch.hub.load
    blocks_mod.torch.hub.load = lambda *a, **k: twin
    try:
        ref = mnc.MidasNet_small(path=None, features=64).eval()
    finally:
        blocks_mod.torch.hub.load = orig
    _randomize_bn(ref, torch)

    x = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        expected = ref(x).numpy()

    my_cfg = MidasNetSmallConfig(backbone=enc_cfg, features=64, image_size=64)
    params = convert_midas_net_small(ref.state_dict(), my_cfg)
    actual = MidasNetSmall(my_cfg).apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(x.numpy()),
    )
    np.testing.assert_allclose(np.asarray(actual), expected, atol=5e-4)


def test_midas_small_wrapper_tiny():
    model = MidasDepth("tiny_v21_small")
    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 64, 64))
    depth = model(images)
    assert depth.shape == (2, 1, 64, 64)
    assert float(depth.max()) <= 0.0
    grads = jax.grad(
        lambda im: model.forward_fn(model.params, im).mean()
    )(images)
    assert bool(jnp.any(grads != 0))
