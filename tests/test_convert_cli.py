"""Pre-converted native-params artifacts + the conversion CLI
(perceptor_tpu/convert.py, utils/checkpoints.py save_params/native_params).

The torch-layout -> flax conversion itself is covered by the per-family
`-m slow` parity tests; here we cover the artifact format round-trip,
wrapper-side detection, and the CLI plumbing (staging, canonical names,
output writing) using native artifacts as input — no torch needed.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.utils import checkpoints


def _tree_equal(a, b):
    flat_a = checkpoints.flatten_params(a)
    flat_b = checkpoints.flatten_params(b)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(
            np.asarray(flat_a[k]), np.asarray(flat_b[k]), err_msg=k
        )


def test_save_params_roundtrip(tmp_path):
    params = {
        "unet": {"conv": {"kernel": np.ones((3, 3, 4, 8), np.float32)}},
        "scale": np.float32(2.5),
    }
    path = str(tmp_path / "artifact.npz")
    checkpoints.save_params(path, params)
    loaded = checkpoints.load_state_dict(path)
    native = checkpoints.native_params(loaded)
    assert native is not None
    _tree_equal(params, native)


def test_native_params_rejects_torch_layouts():
    torch_like = {"model.diffusion_model.out.2.weight": np.zeros((3,))}
    assert checkpoints.native_params(torch_like) is None


def test_wrapper_loads_native_artifact(tmp_path, monkeypatch):
    """A wrapper finds and loads the artifact directly (no torch-layout
    conversion): GuidedDiffusion tiny as the representative family."""
    from perceptor_tpu.models.guided_diffusion import GuidedDiffusion

    source = GuidedDiffusion.__wrapped__(name="tiny", fp16=False)
    artifact = str(tmp_path / "guided_diffusion_tiny.npz")
    checkpoints.save_params(artifact, source.params)

    monkeypatch.setattr(checkpoints, "CACHE_DIRS", (str(tmp_path),))
    loaded = GuidedDiffusion.__wrapped__(name="tiny", fp16=False)
    _tree_equal(source.params, loaded.params)

    # and it actually runs
    out = loaded.predictions(
        loaded.random_diffused((1, 3, 32, 32), jax.random.PRNGKey(0)), 500
    ).denoised_images
    assert bool(jnp.all(jnp.isfinite(out)))


def test_convert_cli_end_to_end(tmp_path, monkeypatch):
    """python -m perceptor_tpu.convert plumbing: stage input, construct,
    write the canonical artifact (a native artifact as input exercises
    the whole path without torch)."""
    from perceptor_tpu import convert as convert_cli
    from perceptor_tpu.models.monster_diffusion import MonsterDiffusion

    source = MonsterDiffusion.__wrapped__(name="tiny", fp16=False)
    input_path = str(tmp_path / "some_torch_export.npz")
    checkpoints.save_params(input_path, source.params)

    out = str(tmp_path / "out" / "monster_diffusion_tiny.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    written = convert_cli.convert(
        input_path, "monster-diffusion", "tiny", out
    )
    assert os.path.exists(written)

    loaded = checkpoints.native_params(checkpoints.load_state_dict(written))
    assert loaded is not None
    _tree_equal(source.params, loaded)


def test_convert_cli_canonical_names():
    from perceptor_tpu import convert as convert_cli

    assert (
        convert_cli.canonical_basename(
            "stable-diffusion", "runwayml/stable-diffusion-v1-5"
        )
        == "stable_diffusion_runwayml_stable-diffusion-v1-5"
    )
    assert (
        convert_cli.canonical_basename("open-clip", "ViT-B-32/openai")
        == "open_clip_ViT-B-32_openai"
    )
    with pytest.raises(ValueError):
        convert_cli.canonical_basename("nope", "x")
