"""Real-ESRGAN model/transform/loss tests incl. torch parity."""

import importlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu import losses, transforms
from perceptor_tpu.models.super_resolution import (
    RRDBNet,
    SRVGGNetCompact,
    SuperResolution,
    UNetDiscriminatorSN,
    convert_rrdbnet,
    convert_srvgg,
    convert_unet_discriminator,
)

REF_DIR = "/root/reference/perceptor/models/super_resolution"
REF_LOSS_DIR = "/root/reference/perceptor/losses/super_resolution"


def _load(filename, directory=REF_DIR, pkg="refsr"):
    pytest.importorskip("torch")
    if pkg not in sys.modules:
        stub = types.ModuleType(pkg)
        stub.__path__ = [directory]
        sys.modules[pkg] = stub
    return importlib.import_module(f"{pkg}.{filename}")


@pytest.mark.slow
def test_parity_rrdbnet():
    import torch

    arch = _load("custom_rrdbnet_arch")
    torch_model = arch.CustomRRDBNet(
        num_in_ch=3, num_out_ch=3, num_feat=16, num_block=2, num_grow_ch=8, scale=2
    ).eval()
    params = convert_rrdbnet(torch_model.state_dict())
    torch.manual_seed(0)
    x = torch.rand(1, 3, 16, 16)
    with torch.no_grad():
        expected = torch_model(x).numpy()
    module = RRDBNet(scale=2, num_feat=16, num_block=2, num_grow_ch=8,
                     dtype=jnp.float32)
    actual = module.apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x.numpy())
    )
    np.testing.assert_allclose(np.asarray(actual), expected, atol=2e-5)


@pytest.mark.slow
def test_parity_srvgg():
    import torch

    arch = _load("srvgg_net_compact")
    torch_model = arch.SRVGGNetCompact(
        num_in_ch=3, num_out_ch=3, num_feat=8, num_conv=3, upscale=2,
        act_type="prelu",
    ).eval()
    params = convert_srvgg(torch_model.state_dict())
    torch.manual_seed(0)
    x = torch.rand(1, 3, 16, 16)
    with torch.no_grad():
        expected = torch_model(x).numpy()
    module = SRVGGNetCompact(upscale=2, num_feat=8, num_conv=3, dtype=jnp.float32)
    actual = module.apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x.numpy())
    )
    np.testing.assert_allclose(np.asarray(actual), expected, atol=2e-5)


@pytest.mark.slow
def test_parity_unet_discriminator():
    import torch

    arch = _load("unet_discriminator_sn", REF_LOSS_DIR, "refsrloss")
    torch_model = arch.UNetDiscriminatorSN(num_in_ch=3, num_feat=8)
    # converge the spectral-norm power iteration (fresh u/v give sigma ~ 0,
    # which amplifies weights ~30x and makes the comparison ill-conditioned;
    # real checkpoints ship converged u/v)
    with torch.no_grad():
        for _ in range(50):
            torch_model(torch.rand(1, 3, 16, 16))
    torch_model = torch_model.eval()
    params = convert_unet_discriminator(torch_model.state_dict())
    torch.manual_seed(0)
    x = torch.rand(1, 3, 32, 32)
    with torch.no_grad():
        expected = torch_model(x).numpy()
    module = UNetDiscriminatorSN(num_feat=8, dtype=jnp.float32)
    actual = module.apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x.numpy())
    )
    np.testing.assert_allclose(np.asarray(actual), expected, atol=3e-5)


def test_sr_model_and_transform():
    model = SuperResolution("tiny", half=False)
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 16, 16))
    upsampled = model.upsample(images)
    assert upsampled.shape == (1, 3, 32, 32)
    downsampled = model.downsample(upsampled)
    assert downsampled.shape == images.shape

    transform = transforms.SuperResolution("tiny", half=False)
    encoded = transform.encode(images)
    assert encoded.shape == (1, 3, 32, 32)
    decoded = transform.decode(encoded)
    assert decoded.shape == images.shape


def test_sr_loss_and_discriminator():
    loss = losses.SuperResolution("tiny", half=False)
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 32, 32))
    value = loss.forward(images)
    assert np.isfinite(float(value))
    grads = jax.grad(lambda im: loss.forward(im))(images)
    assert bool(jnp.any(grads != 0))

    disc = losses.SuperResolutionDiscriminator()
    value = disc.forward(images)
    assert np.isfinite(float(value))


def test_enhance_pipeline_shapes_and_crops():
    """enhance() reproduces the reference RealESRGANer pipeline shape
    contract (real_esrganer.py:50-186): pre-pad + mod-pad are cropped so
    the output is exactly (H*scale, W*scale) for any input size."""
    model = SuperResolution("tiny", half=False)  # scale 2 -> mod_scale 2
    for h, w in [(17, 23), (16, 16)]:
        images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, h, w))
        out = model.enhance(images)
        assert out.shape == (1, 3, h * 2, w * 2)
        assert bool(jnp.all(jnp.isfinite(out)))


def test_enhance_no_padding_equals_upsample():
    model = SuperResolution("tiny", half=False)
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 16, 16))
    np.testing.assert_allclose(
        np.asarray(model.enhance(images, pre_pad=0)),
        np.asarray(model.upsample(images)),
        atol=1e-5,
    )


def test_enhance_tiled_full_context_matches_untiled():
    """With tile_pad covering the whole frame every window IS the frame,
    so tiling must be exact (validates the slice/paste arithmetic)."""
    model = SuperResolution("tiny", half=False)
    images = jax.random.uniform(jax.random.PRNGKey(2), (2, 3, 32, 32))
    full = model.enhance(images, pre_pad=0)
    tiled = model.enhance(images, tile_size=16, tile_pad=16, pre_pad=0)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full), atol=1e-4)


def test_enhance_tiled_differentiable_and_uneven_grid():
    model = SuperResolution("tiny", half=False)
    images = jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 20, 28))
    out = model.enhance(images, tile_size=16, tile_pad=4)
    assert out.shape == (1, 3, 40, 56)
    g = jax.grad(
        lambda im: jnp.sum(model._enhance_fn(model.params, im, 16, 4, 10) ** 2)
    )(images)
    assert g.shape == images.shape and bool(jnp.any(g != 0))
