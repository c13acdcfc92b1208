"""Per-step latent parity against the reference's own Predictions class
(BASELINE bar: next latents within 1e-3, predicted noise within 5e-3).

The three pure-algebra tests (SD / velocity / ADM Predictions vs the
reference classes on tiny tensors) run in the DEFAULT tier so every
driver-visible suite run exercises torch parity; only the CompVis-UNet
end-to-end bar stays behind `-m slow` (it builds the full vendored torch
UNet)."""

import importlib
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.predictions import LatentIndexedEpsPredictions
from perceptor_tpu.schedules import scaled_linear_alphas_sigmas

REF_ROOT = "/root/reference/perceptor"


def _load_reference_predictions():
    torch = pytest.importorskip("torch")
    if not os.path.isdir(REF_ROOT):
        pytest.skip("reference checkout not present")

    if "lantern" not in sys.modules:
        lantern = types.ModuleType("lantern")

        class FunctionalBase:
            def __init__(self, **kwargs):
                self.__dict__.update(kwargs)

            def replace(self, **kw):
                data = {
                    k: getattr(self, k)
                    for k in self.__class__.__annotations__
                    if hasattr(self, k)
                }
                data.update(kw)
                return self.__class__(**data)

        class Tensor:
            @staticmethod
            def dims(_):
                return torch.Tensor

            @staticmethod
            def shape(_):
                return torch.Tensor

        lantern.FunctionalBase = FunctionalBase
        lantern.Tensor = Tensor
        sys.modules["lantern"] = lantern
    # another test may have stubbed torchvision without the functional
    # submodule attribute — ensure the full chain either way
    tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    tvt = sys.modules.get("torchvision.transforms") or types.ModuleType(
        "torchvision.transforms"
    )
    tvf = sys.modules.get(
        "torchvision.transforms.functional"
    ) or types.ModuleType("torchvision.transforms.functional")
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
        "perceptor.transforms": f"{REF_ROOT}/transforms",
        "perceptor.models": f"{REF_ROOT}/models",
        "perceptor.models.stable_diffusion": f"{REF_ROOT}/models/stable_diffusion",
    }
    for name, path in chain.items():
        if name not in sys.modules:
            stub = types.ModuleType(name)
            stub.__path__ = [path]
            sys.modules[name] = stub
    return importlib.import_module(
        "perceptor.models.stable_diffusion.predictions"
    )


def test_sd_step_parity_vs_reference_predictions():
    torch = pytest.importorskip("torch")

    ref = _load_reference_predictions()
    alphas_np, sigmas_np = scaled_linear_alphas_sigmas()
    alphas_np, sigmas_np = np.asarray(alphas_np), np.asarray(sigmas_np)

    rng = np.random.default_rng(0)
    latents = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    noise = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    guiding = (rng.normal(size=(2, 4, 8, 8)) * 1e-5).astype(np.float32)
    from_idx = np.array([800, 431])
    to_idx = np.array([780, 404])

    ref_pred = ref.Predictions(
        from_diffused_latents=torch.tensor(latents),
        from_indices=torch.tensor(from_idx),
        predicted_noise=torch.tensor(noise),
        schedule_alphas=torch.tensor(alphas_np),
        schedule_sigmas=torch.tensor(sigmas_np),
        encode=lambda x: x,
        decode=lambda x: x,
    )
    mine = LatentIndexedEpsPredictions(
        from_diffused_latents=jnp.asarray(latents),
        from_indices=jnp.asarray(from_idx),
        predicted_noise=jnp.asarray(noise),
        schedule_alphas=jnp.asarray(alphas_np),
        schedule_sigmas=jnp.asarray(sigmas_np),
    )

    with torch.no_grad():
        expected_step = ref_pred.step(torch.tensor(to_idx)).numpy()
        expected_guided = (
            ref_pred.guided(torch.tensor(guiding), guidance_scale=0.5)
            .step(torch.tensor(to_idx))
            .numpy()
        )
        expected_reverse = ref_pred.reverse_step(torch.tensor([900, 950])).numpy()
        expected_denoised = ref_pred.denoised_latents.numpy()

    np.testing.assert_allclose(
        np.asarray(mine.step(jnp.asarray(to_idx))), expected_step, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(
            mine.guided(jnp.asarray(guiding), 0.5).step(jnp.asarray(to_idx))
        ),
        expected_guided,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(mine.reverse_step(jnp.asarray([900, 950]))),
        expected_reverse,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(mine.denoised_xs), expected_denoised, atol=1e-5
    )


@pytest.mark.slow
@pytest.mark.parity_smoke
def test_sd_full_step_parity_with_compvis_unet():
    """End-to-end per-step bar (reference stable_diffusion.py:633-658):
    torch CompVis UNet + reference Predictions vs flax UNet + my algebra —
    noise within 5e-3 and next latents within 1e-3 (measured ~1e-5)."""
    torch = pytest.importorskip("torch")

    ref = _load_reference_predictions()
    from tests.test_latent_diffusion import _register_reference_ldm

    _register_reference_ldm()
    openaimodel = importlib.import_module(
        "perceptor.models.latent_diffusion.ldm.modules.diffusionmodules.openaimodel"
    )
    from perceptor_tpu.models.stable_diffusion import UNet
    from perceptor_tpu.models.stable_diffusion import convert as sd_convert
    from perceptor_tpu.models.stable_diffusion.config import UNetConfig

    torch.manual_seed(0)
    cfg = UNetConfig(
        base_channels=32,
        channel_mults=(1, 2),
        n_res_blocks=1,
        cross_attention=(True, False),
        n_heads=2,
        context_dim=48,
    )
    torch_model = openaimodel.UNetModel(
        image_size=8, in_channels=4, out_channels=4, model_channels=32,
        num_res_blocks=1, attention_resolutions=(1,), channel_mult=(1, 2),
        num_heads=2, use_spatial_transformer=True, transformer_depth=1,
        context_dim=48, legacy=False,
    ).eval()
    params = sd_convert.unet_from_compvis(torch_model.state_dict(), cfg, prefix="")
    module = UNet(cfg, dtype=jnp.float32)

    alphas_np, sigmas_np = scaled_linear_alphas_sigmas()
    alphas_np, sigmas_np = np.asarray(alphas_np), np.asarray(sigmas_np)
    torch.manual_seed(1)
    x = torch.randn(1, 4, 8, 8)
    context = torch.randn(1, 7, 48)
    from_idx, to_idx = 801, 761

    with torch.no_grad():
        ref_noise = torch_model(
            x, torch.tensor([float(from_idx)]), context=context
        )
        ref_pred = ref.Predictions(
            from_diffused_latents=x,
            from_indices=torch.tensor([from_idx]),
            predicted_noise=ref_noise,
            schedule_alphas=torch.tensor(alphas_np),
            schedule_sigmas=torch.tensor(sigmas_np),
            encode=lambda v: v,
            decode=lambda v: v,
        )
        expected_latents = ref_pred.step(torch.tensor([to_idx])).numpy()

    my_noise = module.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(x.numpy()),
        jnp.asarray([float(from_idx)]),
        jnp.asarray(context.numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(my_noise), ref_noise.numpy(), atol=5e-3
    )
    mine = LatentIndexedEpsPredictions(
        from_diffused_latents=jnp.asarray(x.numpy()),
        from_indices=jnp.asarray([from_idx]),
        predicted_noise=my_noise,
        schedule_alphas=jnp.asarray(alphas_np),
        schedule_sigmas=jnp.asarray(sigmas_np),
    )
    next_latents = np.asarray(mine.step(jnp.asarray([to_idx])))
    np.testing.assert_array_less(
        np.abs(next_latents - expected_latents).max(), 1e-3
    )


def test_velocity_step_parity_vs_reference_predictions():
    """Velocity algebra vs the reference's velocity Predictions class
    (velocity_diffusion/predictions.py:9-180)."""
    torch = pytest.importorskip("torch")

    _load_reference_predictions()  # installs lantern/torchvision stubs
    for name, path in {
        "perceptor.models.velocity_diffusion": f"{REF_ROOT}/models/velocity_diffusion",
    }.items():
        if name not in sys.modules:
            stub = types.ModuleType(name)
            stub.__path__ = [path]
            sys.modules[name] = stub
    ref = importlib.import_module(
        "perceptor.models.velocity_diffusion.predictions"
    )
    from perceptor_tpu.predictions import VelocityPredictions

    rng = np.random.default_rng(0)
    images = rng.uniform(size=(2, 3, 8, 8)).astype(np.float32)
    velocities = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    guiding = (rng.normal(size=(2, 3, 8, 8)) * 1e-5).astype(np.float32)
    from_ts = np.array([0.8, 0.43], dtype=np.float32)
    to_ts = np.array([0.7, 0.38], dtype=np.float32)

    ref_pred = ref.Predictions(
        from_diffused_images=torch.tensor(images),
        from_ts=torch.tensor(from_ts),
        velocities=torch.tensor(velocities),
    )
    mine = VelocityPredictions(
        from_diffused_images=jnp.asarray(images),
        from_ts=jnp.asarray(from_ts),
        velocities=jnp.asarray(velocities),
    )
    with torch.no_grad():
        expected_step = ref_pred.step(torch.tensor(to_ts)).numpy()
        expected_guided = (
            ref_pred.guided(torch.tensor(guiding), guidance_scale=0.5)
            .step(torch.tensor(to_ts))
            .numpy()
        )
        expected_reverse = ref_pred.reverse_step(
            torch.tensor([0.9, 0.95])
        ).numpy()
        expected_denoised = ref_pred.denoised_images.numpy()
        expected_noise = ref_pred.predicted_noise.numpy()

    np.testing.assert_allclose(
        np.asarray(mine.step(jnp.asarray(to_ts))), expected_step, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(
            mine.guided(jnp.asarray(guiding), 0.5).step(jnp.asarray(to_ts))
        ),
        expected_guided,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(mine.reverse_step(jnp.asarray([0.9, 0.95]))),
        expected_reverse,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(mine.denoised_images), expected_denoised, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mine.predicted_noise), expected_noise, atol=1e-5
    )


def test_adm_step_parity_vs_reference_predictions():
    """Pixel-space indexed-eps algebra vs the reference's guided_diffusion
    Predictions class."""
    torch = pytest.importorskip("torch")

    _load_reference_predictions()
    for name, path in {
        "perceptor.models.guided_diffusion": f"{REF_ROOT}/models/guided_diffusion",
    }.items():
        if name not in sys.modules:
            stub = types.ModuleType(name)
            stub.__path__ = [path]
            sys.modules[name] = stub
    ref = importlib.import_module(
        "perceptor.models.guided_diffusion.predictions"
    )
    from perceptor_tpu.predictions import IndexedEpsPredictions

    alphas_np, sigmas_np = scaled_linear_alphas_sigmas()
    alphas_np = np.asarray(alphas_np)
    sigmas_np = np.asarray(sigmas_np)
    rng = np.random.default_rng(1)
    images = rng.uniform(size=(2, 3, 8, 8)).astype(np.float32)
    noise = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    from_idx = np.array([700, 350])
    to_idx = np.array([650, 300])

    ref_pred = ref.Predictions(
        from_diffused_images=torch.tensor(images),
        from_indices=torch.tensor(from_idx),
        predicted_noise=torch.tensor(noise),
        schedule_alphas=torch.tensor(alphas_np),
        schedule_sigmas=torch.tensor(sigmas_np),
    )
    mine = IndexedEpsPredictions(
        from_diffused_images=jnp.asarray(images),
        from_indices=jnp.asarray(from_idx),
        predicted_noise=jnp.asarray(noise),
        schedule_alphas=jnp.asarray(alphas_np),
        schedule_sigmas=jnp.asarray(sigmas_np),
    )
    with torch.no_grad():
        expected_step = ref_pred.step(torch.tensor(to_idx)).numpy()
        expected_denoised = ref_pred.denoised_images.numpy()

    np.testing.assert_allclose(
        np.asarray(mine.step(jnp.asarray(to_idx))), expected_step, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mine.denoised_images), expected_denoised, atol=1e-5
    )
