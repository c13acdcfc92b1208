"""CLIP ModifiedResNet visual tower parity vs a faithful torch twin
(openai CLIP / open_clip semantics, incl. F.multi_head_attention_forward
attention pooling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.models.clip import configs as clip_configs
from perceptor_tpu.models.clip.convert import _modified_resnet_visual
from perceptor_tpu.models.clip.resnet import ModifiedResNet

TINY_LAYERS = (1, 1, 2, 1)
TINY_WIDTH = 8
TINY_EMBED = 16
TINY_HEADS = TINY_WIDTH * 32 // 64


def _torch_modified_resnet(torch):
    nn = torch.nn
    F = torch.nn.functional

    class Bottleneck(nn.Module):
        def __init__(self, inplanes, planes, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.downsample = None
            if stride > 1 or inplanes != planes * 4:
                self.downsample = nn.Sequential(
                    nn.AvgPool2d(stride) if stride > 1 else nn.Identity(),
                    nn.Conv2d(inplanes, planes * 4, 1, bias=False),
                    nn.BatchNorm2d(planes * 4),
                )

        def forward(self, x):
            identity = x if self.downsample is None else self.downsample(x)
            out = F.relu(self.bn1(self.conv1(x)))
            out = F.relu(self.bn2(self.conv2(out)))
            out = self.avgpool(out)
            out = self.bn3(self.conv3(out))
            return F.relu(out + identity)

    class AttnPool(nn.Module):
        def __init__(self, spacial, embed, heads, out_dim):
            super().__init__()
            self.positional_embedding = nn.Parameter(
                torch.randn(spacial**2 + 1, embed) / embed**0.5
            )
            self.q_proj = nn.Linear(embed, embed)
            self.k_proj = nn.Linear(embed, embed)
            self.v_proj = nn.Linear(embed, embed)
            self.c_proj = nn.Linear(embed, out_dim)
            self.num_heads = heads

        def forward(self, x):
            x = x.flatten(start_dim=2).permute(2, 0, 1)
            x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
            x = x + self.positional_embedding[:, None, :]
            out, _ = F.multi_head_attention_forward(
                query=x[:1], key=x, value=x,
                embed_dim_to_check=x.shape[-1], num_heads=self.num_heads,
                q_proj_weight=self.q_proj.weight,
                k_proj_weight=self.k_proj.weight,
                v_proj_weight=self.v_proj.weight,
                in_proj_weight=None,
                in_proj_bias=torch.cat(
                    [self.q_proj.bias, self.k_proj.bias, self.v_proj.bias]
                ),
                bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
                out_proj_weight=self.c_proj.weight,
                out_proj_bias=self.c_proj.bias,
                use_separate_proj_weight=True, training=False,
                need_weights=False,
            )
            return out.squeeze(0)

    class Twin(nn.Module):
        def __init__(self, layers, width, heads, out_dim, image_size):
            super().__init__()
            self.conv1 = nn.Conv2d(3, width // 2, 3, 2, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width // 2)
            self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(width // 2)
            self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
            self.bn3 = nn.BatchNorm2d(width)
            self.avgpool = nn.AvgPool2d(2)
            inplanes = width
            for stage, count in enumerate(layers):
                planes = width * (2**stage)
                blocks = []
                for i in range(count):
                    stride = 2 if (stage > 0 and i == 0) else 1
                    blocks.append(Bottleneck(inplanes, planes, stride))
                    inplanes = planes * 4
                setattr(self, f"layer{stage + 1}", nn.Sequential(*blocks))
            spacial = image_size // (4 * 2 ** (len(layers) - 1))
            self.attnpool = AttnPool(spacial, inplanes, heads, out_dim)

        def forward(self, x):
            x = F.relu(self.bn1(self.conv1(x)))
            x = F.relu(self.bn2(self.conv2(x)))
            x = F.relu(self.bn3(self.conv3(x)))
            x = self.avgpool(x)
            for stage in (1, 2, 3, 4):
                x = getattr(self, f"layer{stage}")(x)
            return self.attnpool(x)

    return Twin


@pytest.mark.slow
def test_parity_clip_modified_resnet():
    import torch

    torch.manual_seed(0)
    Twin = _torch_modified_resnet(torch)
    twin = Twin(TINY_LAYERS, TINY_WIDTH, TINY_HEADS, TINY_EMBED, 64).eval()
    with torch.no_grad():
        for m in twin.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)

    x = torch.rand(2, 3, 64, 64)
    with torch.no_grad():
        expected = twin(x).numpy()

    sd = {f"visual.{k}": v for k, v in twin.state_dict().items()}
    # the twin's downsample is Sequential(avgpool, conv, bn) -> keys .1/.2;
    # real CLIP uses OrderedDict("-1", "0", "1") -> keys .0/.1. Remap.
    sd = {
        k.replace("downsample.1", "downsample.0").replace(
            "downsample.2", "downsample.1"
        ): v
        for k, v in sd.items()
    }

    class Cfg:
        vision_layers = TINY_LAYERS

    params = _modified_resnet_visual(sd, Cfg)
    module = ModifiedResNet(
        layers=TINY_LAYERS, width=TINY_WIDTH, heads=TINY_HEADS,
        output_dim=TINY_EMBED,
    )
    actual = module.apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x.numpy())
    )
    np.testing.assert_allclose(np.asarray(actual), expected, atol=2e-4)


def test_rn_configs_resolve():
    for name in ("RN50", "RN101", "RN50x4", "RN50x16", "RN50x64"):
        cfg = clip_configs.get_config(name, "openai")
        assert cfg.is_resnet and cfg.quick_gelu
    assert not clip_configs.get_config("ViT-B-32", "").is_resnet
