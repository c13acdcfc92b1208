"""Drawer tests: BruteDiffusion, JPEG codec, DeepImagePrior."""

import importlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu import drawers
from perceptor_tpu.drawers.jpeg import compress_jpeg, decompress_jpeg, quality_to_factor


def test_jpeg_roundtrip_close():
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 32, 32))
    # smooth image compresses near-losslessly at factor << 1
    images = jax.image.resize(
        jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 8, 8)), (1, 3, 32, 32),
        "linear",
    )
    y, cb, cr = compress_jpeg(images, factor=0.05)
    decoded = decompress_jpeg(y, cb, cr, 32, 32, factor=0.05)
    assert float(jnp.abs(decoded - images).mean()) < 0.06  # chroma subsample is lossy


def test_jpeg_parity_with_reference():
    """Parity vs the vendored DiffJPEG torch modules (random input)."""
    torch = pytest.importorskip("torch")
    ref_dir = "/root/reference/perceptor/drawers/jpeg"
    if "refjpeg" not in sys.modules:
        pkg = types.ModuleType("refjpeg")
        pkg.__path__ = [ref_dir]
        sys.modules["refjpeg"] = pkg
    compression = importlib.import_module("refjpeg.compression")
    decompression = importlib.import_module("refjpeg.decompression")

    torch.manual_seed(0)
    images = torch.rand(1, 3, 16, 16)
    with torch.no_grad():
        ty, tcb, tcr = compression.compress_jpeg(factor=1)(images)
        t_decoded = decompression.decompress_jpeg(16, 16, factor=1)(ty, tcb, tcr)

    y, cb, cr = compress_jpeg(jnp.asarray(images.numpy()), factor=1.0)
    np.testing.assert_allclose(np.asarray(y), ty.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(cb), tcb.numpy(), atol=1e-3)
    decoded = decompress_jpeg(y, cb, cr, 16, 16, factor=1.0)
    np.testing.assert_allclose(np.asarray(decoded), t_decoded.numpy(), atol=1e-3)


def test_jpeg_drawer_optimizable():
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 16, 16))
    drawer = drawers.JPEG(images, factor=quality_to_factor(90))
    out = drawer.synthesize()
    assert out.shape == images.shape

    def loss(params):
        return jnp.square(drawer.synthesize(params) - 0.5).mean()

    grads = jax.grad(loss)(drawer.params)
    assert all(bool(jnp.any(g != 0)) for g in grads)


def test_brute_diffusion_drawer():
    from perceptor_tpu.models.velocity_diffusion import VelocityDiffusion

    model = VelocityDiffusion(name="tiny", fp16=False)
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 32, 32))
    drawer = drawers.BruteDiffusion.from_image(
        model, images, 0.7, key=jax.random.PRNGKey(1)
    )
    out = drawer.synthesize()
    assert out.shape == images.shape
    noise = drawer.noise()
    assert noise.shape == images.shape

    def loss(params):
        return jnp.square(drawer.synthesize(params) - images).mean()

    grads = jax.grad(loss)(drawer.params)
    assert bool(jnp.any(grads != 0))


def test_deep_image_prior_drawer():
    drawer = drawers.DeepImagePrior((32, 32), n_feature_channels=8)
    out = drawer.synthesize()
    assert out.shape == (1, 3, 32, 32)
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0

    def total(params):
        return jnp.square(drawer.synthesize(params) - 0.5).mean() + drawer.loss(params)

    grads = jax.grad(total)(drawer.params)
    assert bool(jnp.any(grads["images"] != 0))
    leaves = jax.tree.leaves(grads["network"])
    assert any(bool(jnp.any(leaf != 0)) for leaf in leaves)


def test_dip_latent_factories():
    from perceptor_tpu.models.deep_image_prior import DeepImagePrior as DIPModel

    model = DIPModel(shape=(8, 16, 16))
    random = model.random_latents(jax.random.PRNGKey(0), size=2)
    assert random.shape == (2, 8, 16, 16)
    fourier = model.fourier_latents(size=1, n_channels=8)
    assert fourier.shape == (1, 8, 16, 16)
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 16, 16))
    noisy = model.noisy_image_latents(images, jax.random.PRNGKey(1))
    assert noisy.shape == (1, 8, 16, 16)


@pytest.mark.parametrize("offset_type", ["1x1", "full"])
def test_dip_deformable_offsets(offset_type):
    """offset_type "1x1"/"full" route 3x3 convs through ops.deform_conv
    (reference common.py:163-219); offsets train at lr/10 via the
    multi_transform LR groups (get_hq_skip_net.py:120-140)."""
    import optax

    from perceptor_tpu.models.deep_image_prior import (
        DeepImagePrior as DIPModel,
        offset_param_labels,
    )

    model = DIPModel(shape=(8, 16, 16), offset_type=offset_type)
    latents = model.random_latents(jax.random.PRNGKey(0))
    out = model(latents)
    assert out.shape == (1, 3, 16, 16)

    labels = offset_param_labels(model.params)
    flat = jax.tree.leaves(labels)
    assert "offset" in flat and "main" in flat

    grads = jax.grad(
        lambda p: jnp.square(model.apply_fn(p, latents) - 0.5).mean()
    )(model.params)
    offset_leaves = [
        g
        for g, l in zip(jax.tree.leaves(grads), jax.tree.leaves(labels))
        if l == "offset"
    ]
    assert offset_leaves and all(bool(jnp.all(jnp.isfinite(g))) for g in offset_leaves)

    opt = model.optimizer(0.01)
    state = opt.init(model.params)
    updates, _ = opt.update(grads, state, model.params)
    assert jax.tree.structure(updates) == jax.tree.structure(model.params)


def test_dip_rejects_unknown_offset_type():
    from perceptor_tpu.models.deep_image_prior import DeepImagePrior as DIPModel

    with pytest.raises(ValueError):
        DIPModel(shape=(8, 16, 16), offset_type="bogus")
