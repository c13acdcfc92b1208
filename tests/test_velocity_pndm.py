"""PNDM (PLMS/PRK) samplers + DDIM inversion: parity vs the reference's
sampling.py generators (perceptor/models/velocity_diffusion/sampling.py
:55-172) and hermetic tiny-model behavior."""

import importlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.models.velocity_diffusion import pndm
from perceptor_tpu.models.velocity_diffusion.velocity_diffusion import (
    VelocityDiffusion,
)
from perceptor_tpu.schedules import t_to_alpha_sigma

REF_ROOT = "/root/reference/perceptor"


def _load_reference_sampling():
    torch = pytest.importorskip("torch")
    tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    tvt = sys.modules.get("torchvision.transforms") or types.ModuleType(
        "torchvision.transforms"
    )
    tvf = sys.modules.get(
        "torchvision.transforms.functional"
    ) or types.ModuleType("torchvision.transforms.functional")
    tvf.to_tensor = getattr(tvf, "to_tensor", lambda x: x)
    tvf.to_pil_image = getattr(tvf, "to_pil_image", lambda x: x)
    tv.transforms = tvt
    tvt.functional = tvf
    sys.modules.update(
        {
            "torchvision": tv,
            "torchvision.transforms": tvt,
            "torchvision.transforms.functional": tvf,
        }
    )
    chain = {
        "perceptor": REF_ROOT,
        "perceptor.models": f"{REF_ROOT}/models",
        "perceptor.models.velocity_diffusion": f"{REF_ROOT}/models/velocity_diffusion",
    }
    for name, path in chain.items():
        if name not in sys.modules:
            stub = types.ModuleType(name)
            stub.__path__ = [path]
            sys.modules[name] = stub
    return torch, importlib.import_module(
        "perceptor.models.velocity_diffusion.sampling"
    )


def _fake_models():
    """The same smooth fake velocity model in torch and jax."""

    def torch_model(torch):
        def model(x, t):
            return (
                0.3 * torch.sin(2.5 * x) * torch.cos(3 * t)[:, None, None, None]
                + 0.1 * x
            )

        return model

    def jax_eps_fn(xs, ts):
        v = (
            0.3 * jnp.sin(2.5 * xs) * jnp.cos(3 * ts)[:, None, None, None]
            + 0.1 * xs
        )
        alphas, sigmas = t_to_alpha_sigma(ts)
        return (
            xs * sigmas[:, None, None, None] + v * alphas[:, None, None, None]
        )

    return torch_model, jax_eps_fn


@pytest.mark.slow
@pytest.mark.parity_smoke
@pytest.mark.parametrize("method", ["plms", "prk"])
def test_pndm_parity_vs_reference(method):
    torch, sampling = _load_reference_sampling()
    torch_model, jax_eps_fn = _fake_models()

    rng = np.random.RandomState(0)
    x0 = rng.randn(2, 3, 8, 8).astype(np.float32)
    # start below t=1: transfer() divides by alpha(t)=cos(t*pi/2), which is
    # ~0 at t=1 — with a FAKE model nothing cancels the blow-up there
    steps = np.linspace(0.8, 0.05, 9, dtype=np.float32)

    gen = (sampling.plms_sample if method == "plms" else sampling.prk_sample)(
        torch_model(torch), torch.tensor(x0), torch.tensor(steps), {}
    )
    for x_t, eps_t, pred_t in gen:
        pass

    ts = jnp.concatenate([jnp.asarray(steps), jnp.zeros((1,))])
    sampler = pndm.plms_sample if method == "plms" else pndm.prk_sample
    x_j, pred_j = sampler(jax_eps_fn, jnp.asarray(x0), ts)

    np.testing.assert_allclose(
        np.asarray(pred_j), pred_t.numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(x_j), x_t.numpy(), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_ddim_inversion_parity_vs_reference():
    torch, sampling = _load_reference_sampling()
    torch_model, jax_eps_fn = _fake_models()

    rng = np.random.RandomState(1)
    x0 = rng.randn(1, 3, 8, 8).astype(np.float32)
    steps = np.linspace(0.05, 1.0, 12, dtype=np.float32)

    want = sampling.reverse_sample(
        torch_model(torch), torch.tensor(x0), torch.tensor(steps), {}
    ).numpy()
    got = pndm.ddim_reverse_sample(jax_eps_fn, jnp.asarray(x0), jnp.asarray(steps))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_tiny_model_plms_prk_sample():
    model = VelocityDiffusion(name="tiny", fp16=False)
    for method in ("plms", "prk"):
        images = model.sample(
            n_images=2, n_steps=6, key=jax.random.PRNGKey(0), method=method
        )
        assert images.shape == (2, *model.shape)
        assert bool(jnp.all(jnp.isfinite(images)))
    # memoized: second call reuses the compiled run
    assert ("plms", False, None) in model._sample_runs
    assert ("prk", False, None) in model._sample_runs


def test_tiny_model_reverse_sample():
    model = VelocityDiffusion(name="tiny", fp16=False)
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, *model.shape))
    diffused = model.reverse_sample(images, n_steps=6)
    assert diffused.shape == images.shape
    assert bool(jnp.all(jnp.isfinite(diffused)))


def test_method_validation():
    model = VelocityDiffusion(name="tiny", fp16=False)
    with pytest.raises(ValueError):
        model.sample(method="euler")
    with pytest.raises(ValueError):
        model.sample(method="plms", eta=1.0)


def test_plms_short_schedule_is_all_prk():
    """n_steps <= 3 -> pure PRK warm-up, no multistep scan."""
    _, jax_eps_fn = _fake_models()
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 8, 8))
    ts = jnp.asarray([0.8, 0.4, 0.0])
    x_p, pred_p = pndm.plms_sample(jax_eps_fn, x, ts)
    x_r, pred_r = pndm.prk_sample(jax_eps_fn, x, ts)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pred_p), np.asarray(pred_r), atol=1e-6)
