"""MiDaS v21 (ResNeXt RefineNet) parity against the vendored reference
MidasNet, with the torch.hub backbone replaced by a local ResNeXt twin."""

import importlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.models.midas_depth import (
    MidasDepth,
    MidasNet,
    MidasNetConfig,
    convert_midas_net,
)
from perceptor_tpu.models.resnet import (
    TINY_RESNEXT,
    ResNetConfig,
    ResNetFeatures,
    convert_resnet,
)


def _load_reference():
    pytest.importorskip("torch")
    if "timm" not in sys.modules:
        # blocks.py imports .vit -> timm at module level; only the ViT
        # backbone factories use it, which these tests never call
        sys.modules["timm"] = types.ModuleType("timm")
    if "refmidas" not in sys.modules:
        pkg = types.ModuleType("refmidas")
        pkg.__path__ = ["/root/reference/perceptor/models/midas_depth"]
        sys.modules["refmidas"] = pkg
    return importlib.import_module("refmidas.midas_net")


def _torch_resnext(torch, cfg: ResNetConfig):
    """torchvision-semantics ResNeXt twin (Bottleneck, eval BN)."""
    nn = torch.nn

    class Bottleneck(nn.Module):
        def __init__(self, cin, planes, stride):
            super().__init__()
            width = int(planes * cfg.width_per_group / 64.0) * cfg.groups
            out = planes * cfg.expansion
            self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            self.conv2 = nn.Conv2d(
                width, width, 3, stride, 1, groups=cfg.groups, bias=False
            )
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, out, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(out)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = None
            if stride != 1 or cin != out:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, out, 1, stride, bias=False),
                    nn.BatchNorm2d(out),
                )

        def forward(self, x):
            identity = x if self.downsample is None else self.downsample(x)
            h = self.relu(self.bn1(self.conv1(x)))
            h = self.relu(self.bn2(self.conv2(h)))
            h = self.bn3(self.conv3(h))
            return self.relu(h + identity)

    model = nn.Module()
    model.conv1 = nn.Conv2d(3, cfg.stem_width, 7, 2, 3, bias=False)
    model.bn1 = nn.BatchNorm2d(cfg.stem_width)
    model.relu = nn.ReLU(inplace=True)
    model.maxpool = nn.MaxPool2d(3, 2, 1)
    cin = cfg.stem_width
    for stage, (planes, count) in enumerate(zip(cfg.base_planes, cfg.layers)):
        blocks = []
        for i in range(count):
            stride = 2 if (stage > 0 and i == 0) else 1
            blocks.append(Bottleneck(cin, planes, stride))
            cin = planes * cfg.expansion
        setattr(model, f"layer{stage + 1}", nn.Sequential(*blocks))
    return model


def _randomize_bn(model, torch):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)


@pytest.mark.slow
def test_parity_resnext_features():
    import torch

    torch.manual_seed(0)
    twin = _torch_resnext(torch, TINY_RESNEXT).eval()
    _randomize_bn(twin, torch)
    x = torch.rand(2, 3, 65, 47)  # odd sizes exercise padding
    with torch.no_grad():
        h = twin.maxpool(twin.relu(twin.bn1(twin.conv1(x))))
        expected = []
        for j in range(1, 5):
            h = getattr(twin, f"layer{j}")(h)
            expected.append(h.numpy())

    params = convert_resnet(twin.state_dict(), TINY_RESNEXT)
    feats = ResNetFeatures(TINY_RESNEXT).apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(x.numpy()).transpose(0, 2, 3, 1),
    )
    for f, e in zip(feats, expected):
        np.testing.assert_allclose(
            np.asarray(f).transpose(0, 3, 1, 2), e, atol=2e-4
        )


@pytest.mark.slow
def test_parity_midas_v21():
    """Full vendored MidasNet (with real B5-scale channels at tiny depth)
    vs the flax MidasNet, including the RefineNet decoder and head."""
    import torch

    mn = _load_reference()
    # real stage widths, single block per stage, so the vendored scratch
    # convs (hardcoded 256/512/1024/2048 inputs, blocks.py:47-50) line up
    cfg = ResNetConfig(layers=(1, 1, 1, 1), groups=32, width_per_group=8)
    torch.manual_seed(0)
    twin = _torch_resnext(torch, cfg).eval()

    blocks_mod = importlib.import_module("refmidas.blocks")
    orig_hub_load = blocks_mod.torch.hub.load
    blocks_mod.torch.hub.load = lambda *a, **k: twin
    try:
        ref = mn.MidasNet(path=None, features=16).eval()
    finally:
        blocks_mod.torch.hub.load = orig_hub_load
    _randomize_bn(ref, torch)

    x = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        expected = ref(x).numpy()

    my_cfg = MidasNetConfig(backbone=cfg, features=16, image_size=64)
    params = convert_midas_net(ref.state_dict(), my_cfg)
    actual = MidasNet(my_cfg).apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(x.numpy()),
    )
    np.testing.assert_allclose(np.asarray(actual), expected, atol=5e-4)


def test_midas_v21_wrapper_tiny():
    model = MidasDepth("tiny_v21")
    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 64, 64))
    depth = model(images)
    assert depth.shape == (2, 1, 64, 64)
    assert float(depth.max()) <= 0.0  # negated non-negative depth
    grads = jax.grad(
        lambda im: model.forward_fn(model.params, im).mean()
    )(images)
    assert bool(jnp.any(grads != 0))
