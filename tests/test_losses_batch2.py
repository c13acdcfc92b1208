"""Tests for StyleTransfer, LPIPS, aesthetic losses, and the
velocity-diffusion prior loss (hermetic, random weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu import losses


def _images(key=0, size=64):
    return jax.random.uniform(jax.random.PRNGKey(key), (1, 3, size, size))


def test_style_transfer_zero_for_identical_and_grad():
    loss = losses.StyleTransfer(style_images=_images(0))
    value = loss.forward(_images(0))
    assert float(value) < 1e-5
    value_b = loss.forward(_images(1))
    assert float(value_b) > float(value)
    grads = jax.grad(lambda im: loss.forward(im))(_images(1))
    assert bool(jnp.any(grads != 0))


@pytest.mark.parametrize("name", ["squeeze", "alex", "vgg"])
def test_lpips_backbones(name):
    loss = losses.LPIPS(name)
    a, b = _images(0), _images(1)
    same = loss.forward(a, a)
    diff = loss.forward(a, b)
    assert float(jnp.abs(same).max()) < 1e-6
    assert float(diff.mean()) > 0
    grads = jax.grad(lambda im: loss.forward(im, b).mean())(a)
    assert bool(jnp.any(grads != 0))


def test_lpips_spatial_shape():
    loss = losses.LPIPS("alex", spatial=True)
    out = loss.forward(_images(0), _images(1))
    assert out.shape == (1, 1, 64, 64)


def test_ava_modes():
    for mode in ("logit", "expected", "probability"):
        loss = losses.AestheticVisualAssessment(mode=mode)
        value = loss.forward(_images(0))
        assert np.isfinite(float(value))
    with pytest.raises(ValueError):
        losses.AestheticVisualAssessment(mode="bogus")


def test_simulacra_aesthetic():
    loss = losses.SimulacraAesthetic("ViT-B-32", aesthetic_target=8)
    value = loss.forward(_images(0, size=32))
    assert np.isfinite(float(value))
    grads = jax.grad(lambda im: loss.forward(im))(_images(0, size=32))
    assert bool(jnp.any(grads != 0))


def test_velocity_diffusion_prior_loss():
    from perceptor_tpu.models.velocity_diffusion import VelocityDiffusion

    model = VelocityDiffusion(name="tiny", fp16=False)
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 32, 32))
    prior = losses.VelocityDiffusion(model, noise, from_ts=0.5, resample_ts=0.3)

    images = jnp.zeros((1, 3, 32, 32))
    diffused_denoised = prior.diffuse_denoise(images)
    assert diffused_denoised.shape == images.shape

    # reference test (losses/velocity_diffusion.py:85-91): backprop an
    # external loss through the diffused-denoised image, resample noise
    old_noise = prior.noise
    loss_value, out_images = prior.guided_resample_(
        images,
        loss_fn=lambda im: jnp.square(im).mean(),
        key=jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(loss_value))
    assert bool(jnp.any(prior.noise != old_noise))

    # forward = mse vs frozen target
    mse = prior.forward(images, diffused_denoised)
    assert np.isfinite(float(mse))

    prior.compensate_noise_(images, images + 0.1)
    assert bool(jnp.all(jnp.isfinite(prior.noise)))
