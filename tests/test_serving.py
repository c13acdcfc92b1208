"""jax.export serving artifacts (utils/serving.py).

The serving unit is the fully-fused text2image program; these tests check
(1) a deserialized artifact reproduces the live `sample()` bit path,
(2) cross-platform lowering from this CPU host works, and (3) the
directory save/load roundtrip. All hermetic: tiny configs, random
weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer
from perceptor_tpu.models.stable_diffusion import StableDiffusion
from perceptor_tpu.utils import serving


@pytest.fixture(scope="module")
def tiny_sd():
    return StableDiffusion(
        name="tiny", fp16=False, tokenizer=SimpleTokenizer(merges=[])
    )


def test_export_program_roundtrip():
    def f(x, y):
        return jnp.tanh(x) @ y

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8))
    y = jax.random.normal(jax.random.PRNGKey(1), (8, 2))
    blob = serving.serialize_program(f, x, y)
    assert isinstance(blob, bytes) and len(blob) > 0
    call = serving.load_program(blob)
    np.testing.assert_allclose(call(x, y), f(x, y), atol=1e-6)
    assert len(serving.input_specs(blob)) == 2


def test_export_sample_matches_live_sample(tiny_sd):
    model = tiny_sd
    texts = ["a serving test"]
    key = jax.random.PRNGKey(7)
    size = (64, 64)
    n_steps = 3
    gs = 4.5

    live = model.sample(
        texts, n_steps=n_steps, guidance_scale=gs, size=size, key=key
    )

    blob = model.export_sample(batch=1, size=size, n_steps=n_steps)
    call = serving.load_program(blob)

    # rebuild the serve-side inputs exactly as sample() does
    # (conditioning returns raw encoder states without inpainting inputs)
    uncond = model.conditioning([""])
    cond = model.conditioning(texts)
    context2 = jnp.concatenate([uncond, cond])
    init_key, scan_key = jax.random.split(key)
    latents = model.random_diffused_latents((1, *size), init_key)

    served = call(model.params, context2, latents, scan_key, jnp.float32(gs))
    assert served.shape == live.shape
    np.testing.assert_allclose(served, live, atol=1e-5)


def test_export_conditioning_matches_text_encoder(tiny_sd):
    model = tiny_sd
    blob = model.export_conditioning(batch=1)
    call = serving.load_program(blob)
    tokens = jnp.zeros((2, model.text_config.context_length), jnp.int32)
    tokens = tokens.at[:, 0].set(1).at[0, 1].set(5).at[1, 1].set(9)
    served = call(model.params, tokens)
    direct = model.text_encode_fn(model.params, tokens)
    np.testing.assert_allclose(served, direct, atol=1e-6)


def test_export_guided_sample_matches_live(tiny_sd):
    """The exported guided program (engine core IP) reproduces
    engine.guided_sample bit-for-bit at the exported shapes."""
    from perceptor_tpu import engine
    from perceptor_tpu.engine.guidance import _gather_frozen
    from perceptor_tpu.losses.open_clip import OpenCLIP
    from tests.test_clip import TINY

    model = tiny_sd
    loss = OpenCLIP("ViT-B-32", "test", config=TINY)
    loss.add_encodings_(
        jax.random.normal(jax.random.PRNGKey(1), (1, TINY.embed_dim))
    )
    cond = model.conditioning(["a guided test"])
    pairs = model.schedule_indices(n_steps=2, from_index=800, to_index=400)
    latents = model.random_diffused_latents((1, 32, 32), jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(3)

    live_latents, live_history = engine.guided_sample(
        model, [loss], latents, pairs, conditioning=cond,
        guidance_scale=0.3, key=key,
    )

    blob = engine.export_guided_sample(
        model, [loss], latents, pairs, conditioning=cond
    )
    call = serving.load_program(blob)
    _, _, _, loss_frozen = _gather_frozen(lambda p: p, [loss])
    served_latents, served_history = call(
        model.params, latents, jnp.asarray(pairs), loss_frozen, cond, key,
        jnp.float32(0.3), jnp.float32(0.0),
    )
    np.testing.assert_allclose(served_latents, live_latents, atol=1e-5)
    np.testing.assert_allclose(served_history, live_history, atol=1e-5)


def test_export_guided_sample_rejects_plain_callables(tiny_sd):
    from perceptor_tpu import engine

    pairs = tiny_sd.schedule_indices(n_steps=2, from_index=800, to_index=400)
    latents = tiny_sd.random_diffused_latents((1, 32, 32), jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="protocol"):
        engine.export_guided_sample(
            tiny_sd, [lambda images: jnp.mean(images)], latents, pairs
        )


def test_velocity_export_sample_matches_live():
    from perceptor_tpu.models.velocity_diffusion import VelocityDiffusion

    model = VelocityDiffusion(name="tiny", fp16=False)
    key = jax.random.PRNGKey(6)
    live = model.sample(n_images=1, n_steps=3, key=key)

    blob = model.export_sample(n_images=1, n_steps=3)
    call = serving.load_program(blob)
    init_key, scan_key = jax.random.split(key)
    diffused = model.random_diffused((1, *model.shape), init_key)
    pairs = jnp.asarray(model.schedule_ts(3), jnp.float32)
    served = call(
        model.params, diffused, pairs, None, scan_key,
        jnp.float32(0.0), jnp.float32(0.0),
    )
    np.testing.assert_allclose(np.asarray(served), np.asarray(live), atol=1e-5)


def test_export_sample_cross_platform_lowering(tiny_sd):
    """Build a TPU-loadable artifact on this CPU-only test host."""
    blob = tiny_sd.export_sample(
        batch=1, size=(32, 32), n_steps=2, platforms=("cpu", "tpu")
    )
    from jax import export as jax_export

    exp = jax_export.deserialize(blob)
    assert set(exp.platforms) == {"cpu", "tpu"}


def test_save_load_programs_roundtrip(tmp_path):
    blobs = {"a": b"aaaa", "b": b"\x00\x01binary"}
    serving.save_programs(str(tmp_path), blobs)
    assert serving.load_programs(str(tmp_path)) == blobs


def test_export_guided_sample_cfg_artifact(tiny_sd):
    """The CFG variant exports with the (cond, uncond) tuple slot and the
    appended traced cfg_scale argument, and reproduces the live path."""
    from perceptor_tpu import engine
    from perceptor_tpu.engine.guidance import _gather_frozen
    from perceptor_tpu.losses.open_clip import OpenCLIP
    from tests.test_clip import TINY

    model = tiny_sd
    loss = OpenCLIP("ViT-B-32", "test", config=TINY)
    loss.add_encodings_(
        jax.random.normal(jax.random.PRNGKey(1), (1, TINY.embed_dim))
    )
    cond = model.conditioning(["a guided test"])
    uncond = model.conditioning([""])
    pairs = model.schedule_indices(n_steps=2, from_index=800, to_index=400)
    latents = model.random_diffused_latents((1, 32, 32), jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(3)

    live_latents, live_history = engine.guided_sample(
        model, [loss], latents, pairs, conditioning=cond,
        guidance_scale=0.3, key=key,
        uncond_conditioning=uncond, cfg_scale=4.0,
    )
    blob = engine.export_guided_sample(
        model, [loss], latents, pairs, conditioning=cond,
        uncond_conditioning=uncond,
    )
    call = serving.load_program(blob)
    _, _, _, loss_frozen = _gather_frozen(lambda p: p, [loss])
    served_latents, served_history = call(
        model.params, latents, jnp.asarray(pairs), loss_frozen,
        (cond, uncond), key, jnp.float32(0.3), jnp.float32(0.0),
        jnp.float32(4.0),
    )
    np.testing.assert_allclose(served_latents, live_latents, atol=1e-5)
    np.testing.assert_allclose(served_history, live_history, atol=1e-5)
