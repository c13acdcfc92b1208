"""GuidedDiffusion (ADM) tests incl. parity vs the reference torch UNet."""

import importlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.models.guided_diffusion import (
    ADMUNet,
    GuidedDiffusion,
    config as adm_config,
    convert,
)

REF_DIR = "/root/reference/perceptor/models/guided_diffusion"


def load_reference_unet():
    """Load the vendored ADM unet.py as a package (it uses relative
    imports of nn.py / fp16_util.py)."""
    pytest.importorskip("torch")
    if "refadm" not in sys.modules:
        pkg = types.ModuleType("refadm")
        pkg.__path__ = [REF_DIR]
        sys.modules["refadm"] = pkg
    return importlib.import_module("refadm.unet")


def _make_ref_model(ref, cfg: adm_config.ADMConfig, image_size: int):
    ds_attn = tuple(
        d for d in cfg.attention_ds
    )
    return ref.UNetModel(
        image_size=image_size,
        in_channels=cfg.in_channels,
        model_channels=cfg.model_channels,
        out_channels=cfg.out_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=ds_attn,
        channel_mult=cfg.channel_mult,
        num_classes=None,
        num_heads=cfg.num_heads,
        num_head_channels=cfg.num_head_channels,
        use_scale_shift_norm=cfg.use_scale_shift_norm,
        resblock_updown=cfg.resblock_updown,
    )


def _parity(cfg, image_size, atol=2e-4):
    import torch

    ref = load_reference_unet()
    torch_model = _make_ref_model(ref, cfg, image_size).eval()
    params = convert.from_torch(torch_model.state_dict())

    torch.manual_seed(0)
    x = torch.randn(2, 3, image_size, image_size)
    t = torch.tensor([400.0, 20.0])
    with torch.no_grad():
        expected = torch_model(x, t).numpy()

    module = ADMUNet(cfg, dtype=jnp.float32)
    actual = module.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(x.numpy()),
        jnp.asarray(t.numpy()),
    )
    np.testing.assert_allclose(np.asarray(actual), expected, atol=atol)


@pytest.mark.parity_smoke
def test_parity_smoke_small():
    """Default-tier ADM parity: a 32-channel config (the reference's
    GroupNorm(32) floor) vs its vendored UNetModel, same rename path as
    the full checkpoints — the family's driver-visible regression canary
    (VERDICT r2 #8)."""
    cfg = adm_config.ADMConfig(
        image_size=32, model_channels=32, channel_mult=(1, 2),
        num_res_blocks=1, attention_ds=(2,), num_head_channels=8,
        use_scale_shift_norm=True, resblock_updown=True,
    )
    _parity(cfg, 32)


@pytest.mark.slow
def test_parity_pixelart():
    _parity(adm_config.PIXELART, 64)


@pytest.mark.slow
def test_parity_standard():
    # standard config at reduced image size (fully convolutional)
    _parity(adm_config.STANDARD, 128)


def test_tiny_wrapper():
    model = GuidedDiffusion(name="tiny", fp16=False)
    diffused = model.random_diffused((1, 3, 32, 32), jax.random.PRNGKey(0))
    predictions = model.predictions(diffused, 800)
    assert predictions.predicted_noise.shape == (1, 3, 32, 32)
    stepped = predictions.step(600)
    assert bool(jnp.all(jnp.isfinite(stepped)))


def test_tiny_schedule_and_diffuse():
    model = GuidedDiffusion(name="tiny", fp16=False)
    pairs = model.schedule_indices(n_steps=20)
    assert (pairs[:, 0] > pairs[:, 1]).all()
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 32, 32))
    diffused = model.diffuse_images(images, 500, key=jax.random.PRNGKey(1))
    assert diffused.shape == images.shape


def test_bad_size_rejected():
    model = GuidedDiffusion(name="tiny", fp16=False)
    with pytest.raises(ValueError):
        model.random_diffused((1, 3, 33, 32), jax.random.PRNGKey(0))


def test_fused_sample_matches_stepwise_algebra():
    """model.sample() (one lax.scan) must equal the host per-step loop it
    fuses (the reference's test loop, reference guided_diffusion.py:158-196)."""
    model = GuidedDiffusion(name="tiny", fp16=False)
    key = jax.random.PRNGKey(4)
    out = model.sample(n_images=1, n_steps=3, size=(32, 32), key=key, rho=3.0)

    init_key, _ = jax.random.split(key)
    diffused = model.random_diffused((1, 3, 32, 32), init_key)
    pairs = model.schedule_indices(n_steps=3, rho=3.0)
    for from_i, to_i in pairs:
        p = model.predictions(diffused, int(from_i))
        diffused = p.step(jnp.asarray([int(to_i)]))
    expected = model.predictions(diffused, int(pairs[-1, 1])).denoised_images

    assert out.shape == expected.shape
    # random-weight tiny ADM emits ~1e2-magnitude images: compare relative
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=1e-4, atol=1e-4
    )


def test_fused_sample_img2img_and_memo():
    model = GuidedDiffusion(name="tiny", fp16=False)
    model.__dict__.pop("_sample_runs", None)
    init = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 32, 32))
    out = model.sample(
        n_steps=2, size=(32, 32), from_index=500, init_images=init,
        eta=0.3, key=jax.random.PRNGKey(1),
    )
    assert out.shape == init.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    model.sample(
        n_steps=2, size=(32, 32), from_index=500, init_images=init,
        eta=0.8, key=jax.random.PRNGKey(2),
    )
    assert len(model._sample_runs) == 1  # eta traced


def test_predictions_fn_rejects_conditioning():
    model = GuidedDiffusion(name="tiny", fp16=False)
    diffused = model.random_diffused((1, 3, 32, 32), jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        model.predictions_fn(model.params, diffused, 500, conditioning=jnp.ones(4))
