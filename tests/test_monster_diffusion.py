"""MonsterDiffusion tests incl. parity vs the reference torch model."""

import importlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.models.monster_diffusion import (
    MonsterDiffusion,
    MonsterUNet,
    convert,
    net as monster_net,
)
from perceptor_tpu.ops.upfirdn import fir_downsample_2x, fir_upsample_2x

REF_DIR = "/root/reference/perceptor/models/monster_diffusion"


def load_reference_base():
    pytest.importorskip("torch")
    if "refmonster" not in sys.modules:
        pkg = types.ModuleType("refmonster")
        pkg.__path__ = [REF_DIR]
        sys.modules["refmonster"] = pkg
        sub = types.ModuleType("refmonster.base")
        sub.__path__ = [REF_DIR + "/base"]
        sys.modules["refmonster.base"] = sub
    return importlib.import_module("refmonster.base.model")


@pytest.mark.slow
def test_fir_resample_parity():
    import torch

    layers = importlib.import_module("refmonster.base.layers") if (
        "refmonster.base" in sys.modules
    ) else None
    load_reference_base()
    layers = importlib.import_module("refmonster.base.layers")
    torch.manual_seed(0)
    x = torch.randn(2, 3, 16, 16)
    down_expected = layers.Downsample2d()(x).numpy()
    up_expected = layers.Upsample2d()(x).numpy()
    down_actual = fir_downsample_2x(jnp.asarray(x.numpy()))
    up_actual = fir_upsample_2x(jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(down_actual), down_expected, atol=1e-5)
    np.testing.assert_allclose(np.asarray(up_actual), up_expected, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parity_smoke
def test_parity_monster_model():
    import torch

    ref_model_mod = load_reference_base()
    torch_model = ref_model_mod.Model(mapping_cond_dim=9).eval()
    cfg = monster_net.MODEL_CONFIGS["all"]
    params = convert.from_torch(torch_model.state_dict(), cfg)

    torch.manual_seed(0)
    x = torch.randn(2, 3, 48, 48)
    t = torch.tensor([0.5, -1.0])  # c_noise values
    aug = torch.randn(2, 9)
    with torch.no_grad():
        expected = torch_model(x, t, mapping_cond=aug).numpy()

    module = MonsterUNet(cfg, dtype=jnp.float32)
    actual = module.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(x.numpy()),
        jnp.asarray(t.numpy()),
        jnp.asarray(aug.numpy()),
    )
    np.testing.assert_allclose(np.asarray(actual), expected, atol=2e-4)


def test_tiny_wrapper_predictions():
    model = MonsterDiffusion(name="tiny", fp16=False)
    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 16, 16))
    diffused = model.diffuse(images, 10.0, key=jax.random.PRNGKey(1))
    predictions = model.predictions(diffused, jnp.full((2,), 10.0))
    assert predictions.denoised_xs.shape == (2, 3, 16, 16)
    stepped = predictions.step(jnp.full((2,), 5.0))
    assert bool(jnp.all(jnp.isfinite(stepped)))


def test_tiny_elucidated_sample():
    model = MonsterDiffusion(name="tiny", fp16=False)
    images = model.sample(size=1, n_evaluations=8, key=jax.random.PRNGKey(0))
    assert images.shape == (1, 3, 16, 16)
    assert float(images.min()) >= 0.0 and float(images.max()) <= 1.0


def test_tiny_lms_sample():
    model = MonsterDiffusion(name="tiny", fp16=False)
    images = model.linear_multistep_sample(
        size=1, n_evaluations=6, key=jax.random.PRNGKey(0)
    )
    assert images.shape == (1, 3, 16, 16)
    assert bool(jnp.all(jnp.isfinite(images)))


def test_training_ts_distribution():
    model = MonsterDiffusion(name="tiny", fp16=False)
    ts = model.training_ts(1000, jax.random.PRNGKey(0))
    assert bool(jnp.all(ts > 0))
    # log ts ~ N(P_mean, P_std)
    assert abs(float(jnp.log(ts).mean()) - (-1.2)) < 0.2
