"""ResMem / Memorability tests: hermetic tiny loss + full-composition
parity against a locally-built torch twin (torchvision AlexNet semantics +
the ResNeXt twin from test_midas_v21, composed exactly as ResMemNet is)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu import losses
from perceptor_tpu.models.resmem import ResMemNet, convert_resmem
from perceptor_tpu.models.resnet import TINY_RESNEXT


def test_memorability_loss_runs_and_backprops():
    loss = losses.Memorability("tiny")
    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 96, 80))
    value = loss.forward(images)
    assert value.shape == ()
    assert np.isfinite(float(value))
    # sigmoid head * 0.05: value in (0, 0.05)
    assert 0.0 < float(value) < 0.05
    grads = jax.grad(lambda im: loss.forward(im))(images)
    assert bool(jnp.any(grads != 0))


def test_memorability_pure_apply_matches_forward():
    loss = losses.Memorability("tiny")
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 70, 70))
    np.testing.assert_allclose(
        float(loss.forward(images)),
        float(loss.apply(loss.loss_params, images)),
        rtol=1e-6,
    )


def test_parity_resmem_vs_torch_twin():
    import torch
    from tests.test_midas_v21 import _randomize_bn, _torch_resnext

    nn = torch.nn
    m = 8  # width_mult of the tiny config

    twin = nn.Module()
    twin.features = nn.Sequential(
        nn.Conv2d(3, 64 // m, 11, 4, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
        nn.Conv2d(64 // m, 192 // m, 5, 1, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
        nn.Conv2d(192 // m, 384 // m, 3, 1, 1), nn.ReLU(),
        nn.Conv2d(384 // m, 256 // m, 3, 1, 1), nn.ReLU(),
        nn.Conv2d(256 // m, 256 // m, 3, 1, 1), nn.ReLU(), nn.MaxPool2d(3, 2),
    )
    # 63x63 input -> 1x1 feature map -> flatten 256//m
    twin.fc6 = nn.Linear(256 // m, 4096 // m)
    twin.fc7 = nn.Linear(4096 // m, 4096 // m)
    twin.resnet = _torch_resnext(torch, TINY_RESNEXT)
    res_ch = TINY_RESNEXT.stage_channels[-1]
    twin.head1 = nn.Linear(4096 // m + res_ch, 1024 // m)
    twin.head2 = nn.Linear(1024 // m, 256 // m)
    twin.head3 = nn.Linear(256 // m, 1)
    torch.manual_seed(0)
    for p in twin.parameters():
        p.data.normal_(0, 0.05)
    _randomize_bn(twin, torch)
    twin.eval()

    x = torch.rand(2, 3, 63, 63)
    with torch.no_grad():
        a = twin.features(x).flatten(1)
        a = torch.relu(twin.fc7(torch.relu(twin.fc6(a))))
        r = twin.resnet
        h = r.maxpool(r.relu(r.bn1(r.conv1(x))))
        for j in range(1, 5):
            h = getattr(r, f"layer{j}")(h)
        res = h.mean(dim=(2, 3))
        z = torch.cat([a, res], dim=1)
        z = torch.relu(twin.head1(z))
        z = torch.relu(twin.head2(z))
        expected = torch.sigmoid(twin.head3(z))[:, 0].numpy()

    params = convert_resmem(twin.state_dict(), TINY_RESNEXT, spatial=1)
    module = ResMemNet(resnet_config=TINY_RESNEXT, width_mult=m)
    actual = module.apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x.numpy())
    )
    np.testing.assert_allclose(np.asarray(actual), expected, atol=2e-5)
