"""DPT-Hybrid parity: full vendored DPTDepthModel (timm.create_model
stubbed with a local hybrid-ViT twin) vs the flax implementation."""

import importlib
import math
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.models.midas_depth import (
    CONFIGS,
    DPTConfig,
    DPTDepthModel,
    MidasDepth,
    ResNetV2StemConfig,
    convert_dpt,
)


def _torch_hybrid_twin(torch, stem_cfg, vit_width, vit_layers, vit_heads,
                       grid):
    """timm vit_base_r50_s16_384-equivalent twin: StdConv2dSame ResNetV2
    trunk (preact=False, GroupNorm32) + post-LN ViT blocks."""
    nn = torch.nn
    F = torch.nn.functional

    class StdConv2dSame(nn.Conv2d):
        def forward(self, x):
            ih, iw = x.shape[-2:]
            k, s = self.kernel_size, self.stride
            ph = max((math.ceil(ih / s[0]) - 1) * s[0] + k[0] - ih, 0)
            pw = max((math.ceil(iw / s[1]) - 1) * s[1] + k[1] - iw, 0)
            x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
            w = self.weight
            w = F.batch_norm(
                w.reshape(1, self.out_channels, -1), None, None,
                training=True, momentum=0.0, eps=1e-6,
            ).reshape_as(w)
            return F.conv2d(x, w, self.bias, self.stride, 0, self.dilation,
                            self.groups)

    class MaxPoolSame(nn.Module):
        def forward(self, x):
            ih, iw = x.shape[-2:]
            ph = max((math.ceil(ih / 2) - 1) * 2 + 3 - ih, 0)
            pw = max((math.ceil(iw / 2) - 1) * 2 + 3 - iw, 0)
            x = F.pad(
                x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2],
                value=float("-inf"),
            )
            return F.max_pool2d(x, 3, 2)

    g = stem_cfg.gn_groups

    class Block(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            mid = cout // 4
            self.conv1 = StdConv2dSame(cin, mid, 1, bias=False)
            self.norm1 = nn.GroupNorm(g, mid)
            self.conv2 = StdConv2dSame(mid, mid, 3, stride, bias=False)
            self.norm2 = nn.GroupNorm(g, mid)
            self.conv3 = StdConv2dSame(mid, cout, 1, bias=False)
            self.norm3 = nn.GroupNorm(g, cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Module()
                self.downsample.conv = StdConv2dSame(
                    cin, cout, 1, stride, bias=False
                )
                self.downsample.norm = nn.GroupNorm(g, cout)

        def forward(self, x):
            if self.downsample is not None:
                sc = self.downsample.norm(self.downsample.conv(x))
            else:
                sc = x
            h = F.relu(self.norm1(self.conv1(x)))
            h = F.relu(self.norm2(self.conv2(h)))
            h = self.norm3(self.conv3(h))
            return F.relu(h + sc)

    class Stage(nn.Module):
        def __init__(self, cin, cout, count, first_stride):
            super().__init__()
            blocks = []
            for i in range(count):
                blocks.append(Block(cin, cout, first_stride if i == 0 else 1))
                cin = cout
            self.blocks = nn.Sequential(*blocks)

        def forward(self, x):
            return self.blocks(x)

    class Trunk(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.Module()
            self.stem.conv = StdConv2dSame(
                3, stem_cfg.stem_width, 7, 2, bias=False
            )
            self.stem.norm = nn.GroupNorm(g, stem_cfg.stem_width)
            self.pool = MaxPoolSame()
            stages = []
            cin = stem_cfg.stem_width
            for s, (w_, count) in enumerate(
                zip(stem_cfg.widths, stem_cfg.layers)
            ):
                stages.append(Stage(cin, w_, count, 1 if s == 0 else 2))
                cin = w_
            self.stages = nn.Sequential(*stages)

        def forward(self, x):
            x = self.pool(F.relu(self.stem.norm(self.stem.conv(x))))
            return self.stages(x)

    class Attn(nn.Module):
        def __init__(self):
            super().__init__()
            self.qkv = nn.Linear(vit_width, vit_width * 3)
            self.proj = nn.Linear(vit_width, vit_width)

        def forward(self, x):
            n, s, e = x.shape
            hd = e // vit_heads
            qkv = self.qkv(x).reshape(n, s, 3, vit_heads, hd)
            q, k, v = qkv.permute(2, 0, 3, 1, 4)
            a = torch.softmax(q @ k.transpose(-2, -1) / math.sqrt(hd), -1)
            return self.proj((a @ v).transpose(1, 2).reshape(n, s, e))

    class VitBlock(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = nn.LayerNorm(vit_width, eps=1e-6)
            self.attn = Attn()
            self.norm2 = nn.LayerNorm(vit_width, eps=1e-6)
            self.mlp = nn.Module()
            self.mlp.fc1 = nn.Linear(vit_width, vit_width * 4)
            self.mlp.fc2 = nn.Linear(vit_width * 4, vit_width)

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            h = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
            return x + h

    model = nn.Module()
    model.patch_embed = nn.Module()
    model.patch_embed.backbone = Trunk()
    model.patch_embed.proj = nn.Conv2d(stem_cfg.widths[-1], vit_width, 1)
    model.cls_token = nn.Parameter(torch.randn(1, 1, vit_width) * 0.02)
    model.pos_embed = nn.Parameter(
        torch.randn(1, grid * grid + 1, vit_width) * 0.02
    )
    model.pos_drop = nn.Identity()
    model.blocks = nn.ModuleList([VitBlock() for _ in range(vit_layers)])
    model.norm = nn.LayerNorm(vit_width, eps=1e-6)
    return model


@pytest.mark.slow
def test_parity_dpt_hybrid():
    import torch

    if "timm" not in sys.modules or not hasattr(
        sys.modules["timm"], "create_model"
    ):
        sys.modules["timm"] = types.ModuleType("timm")
    if "refmidas" not in sys.modules:
        pkg = types.ModuleType("refmidas")
        pkg.__path__ = ["/root/reference/perceptor/models/midas_depth"]
        sys.modules["refmidas"] = pkg

    # real hybrid widths (scratch is hardcoded to 256/512/768/768,
    # blocks.py:36-38) at minimal depth/spatial cost
    stem_cfg = ResNetV2StemConfig(layers=(1, 1, 1), widths=(256, 512, 1024))
    torch.manual_seed(0)
    twin = _torch_hybrid_twin(
        torch, stem_cfg, vit_width=768, vit_layers=12, vit_heads=12, grid=4
    )
    sys.modules["timm"].create_model = lambda *a, **k: twin

    dpt = importlib.import_module("refmidas.dpt_depth")
    ref = dpt.DPTDepthModel(
        path=None, backbone="vitb_rn50_384", non_negative=True
    ).eval()

    x = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        expected = ref(x).numpy()

    cfg = DPTConfig(
        image_size=64, vit_width=768, vit_layers=12, vit_heads=12,
        hooks=(0, 1, 8, 11), reassemble_features=(256, 512, 768, 768),
        stem=stem_cfg,
    )
    params = convert_dpt(ref.state_dict(), cfg)
    actual = DPTDepthModel(cfg).apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(x.numpy()),
    )
    np.testing.assert_allclose(np.asarray(actual), expected, atol=5e-4)


def test_dpt_hybrid_wrapper_tiny():
    model = MidasDepth("tiny_hybrid")
    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 64, 64))
    depth = model(images)
    assert depth.shape == (2, 1, 64, 64)
    assert float(depth.max()) <= 0.0  # negated non-negative depth
    grads = jax.grad(
        lambda im: model.forward_fn(model.params, im).mean()
    )(images)
    assert bool(jnp.any(grads != 0))
