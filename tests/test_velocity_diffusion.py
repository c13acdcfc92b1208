"""VelocityDiffusion tests, incl. full numerical parity vs the PyTorch
reference models (loaded by file path with random weights — the strongest
verification SURVEY §4 calls for, no downloads needed)."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.models.velocity_diffusion import (
    VDiffusionUNet,
    VelocityDiffusion,
    configs,
    convert,
)

REF_DIR = "/root/reference/perceptor/models/velocity_diffusion"


def load_reference_module(filename):
    torch = pytest.importorskip("torch")  # noqa: F841
    spec = importlib.util.spec_from_file_location(
        f"ref_{filename}", os.path.join(REF_DIR, f"{filename}.py")
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def _parity(torch_model, cfg, size, clip_dim=None, atol=2e-4):
    import torch

    torch_model.eval()
    state_dict = torch_model.state_dict()
    params = convert.from_torch(state_dict, cfg)

    torch.manual_seed(0)
    x = torch.randn(2, 3, size, size)
    t = torch.tensor([0.7, 0.3])
    args = [x, t]
    kwargs = {}
    if clip_dim is not None:
        clip_embed = torch.randn(2, clip_dim)
        args.append(clip_embed)
        kwargs["clip_embed"] = jnp.asarray(clip_embed.numpy())
    with torch.no_grad():
        expected = torch_model(*args).numpy()

    module = VDiffusionUNet(cfg, dtype=jnp.float32)
    actual = module.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(x.numpy()),
        jnp.asarray(t.numpy()),
        **kwargs,
    )
    np.testing.assert_allclose(np.asarray(actual), expected, atol=atol)


@pytest.mark.slow
def test_parity_yfcc_2():
    ref = load_reference_module("yfcc_2")
    _parity(ref.YFCC2Model(), configs.YFCC_2, 128)


@pytest.mark.slow
@pytest.mark.parity_smoke
def test_parity_wikiart():
    ref = load_reference_module("wikiart_256")
    _parity(ref.WikiArt256Model(), configs.WIKIART, 64)


@pytest.mark.slow
def test_parity_cc12m_conditioned():
    ref = load_reference_module("cc12m_1")
    _parity(ref.CC12M1Model(), configs.CC12M_1_CFG, 64, clip_dim=512)


@pytest.mark.slow
def test_parity_yfcc_1():
    ref = load_reference_module("yfcc_1")
    _parity(ref.YFCC1Model(), configs.YFCC_1, 128)


# -- hermetic tiny tests ------------------------------------------------------


def test_tiny_wrapper_predictions_and_sampling():
    model = VelocityDiffusion(name="tiny", fp16=False)
    key = jax.random.PRNGKey(0)
    diffused = model.random_diffused((1, 3, 32, 32), key)
    predictions = model.predictions(diffused, 0.8)
    assert predictions.velocities.shape == (1, 3, 32, 32)
    stepped = predictions.step(jnp.array([0.6]))
    assert stepped.shape == diffused.shape
    assert bool(jnp.all(jnp.isfinite(stepped)))


def test_tiny_conditioned_requires_embedding():
    model = VelocityDiffusion(name="tiny_conditioned", fp16=False)
    diffused = model.random_diffused((1, 3, 32, 32), jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        model.predictions(diffused, 0.8)
    embed = jnp.ones((1, 8))
    predictions = model.predictions(diffused, 0.8, conditioning=embed)
    assert predictions.velocities.shape == (1, 3, 32, 32)


def test_schedule_ts_monotonic():
    pairs = VelocityDiffusion.schedule_ts(n_steps=50)
    assert pairs.shape == (50, 2)
    assert (pairs[:, 0] > pairs[:, 1]).all()
    assert (pairs[1:, 0] == pairs[:-1, 1]).all()


def test_diffuse_and_inject_noise():
    model = VelocityDiffusion(name="tiny", fp16=False)
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 32, 32))
    diffused = model.diffuse(images, 0.5, key=jax.random.PRNGKey(1))
    assert diffused.shape == images.shape
    renoised = model.inject_noise(
        diffused, 0.5, 0.7, key=jax.random.PRNGKey(2)
    )
    assert renoised.shape == images.shape
    assert bool(jnp.all(jnp.isfinite(renoised)))


def test_full_sampler_loop_compiled():
    """50-step sampler as one lax.scan program over the tiny model."""
    model = VelocityDiffusion(name="tiny", fp16=False)
    pairs = jnp.asarray(model.schedule_ts(n_steps=10))
    diffused0 = model.random_diffused((1, 3, 32, 32), jax.random.PRNGKey(0))

    from perceptor_tpu.predictions import VelocityPredictions

    @jax.jit
    def sample(params, diffused0):
        def body(diffused, pair):
            ts = jnp.broadcast_to(pair[0], (1,))
            velocities = model._velocities_fn(params, diffused, ts)
            p = VelocityPredictions(
                from_diffused_images=diffused, from_ts=ts, velocities=velocities
            )
            return p.step(jnp.broadcast_to(pair[1], (1,))), None

        out, _ = jax.lax.scan(body, diffused0, pairs)
        return out

    result = sample(model.params, diffused0)
    assert result.shape == diffused0.shape
    assert bool(jnp.all(jnp.isfinite(result)))


def test_fused_sample_matches_stepwise_algebra():
    """model.sample() (one lax.scan program) must equal the host-side
    per-step algebra loop it fuses (the reference's test-loop pattern,
    reference velocity_diffusion.py:167-198, without churn/correction)."""
    model = VelocityDiffusion(name="tiny", fp16=False)
    key = jax.random.PRNGKey(3)
    out = model.sample(n_images=1, n_steps=4, key=key)

    init_key, _ = jax.random.split(key)
    diffused = model.random_diffused((1, *model.shape), init_key)
    pairs = model.schedule_ts(4)
    for from_t, to_t in pairs:
        p = model.predictions(diffused, float(from_t))
        diffused = p.step(jnp.broadcast_to(jnp.float32(to_t), (1,)))
    expected = model.predictions(diffused, float(pairs[-1, 1])).denoised_images

    assert out.shape == expected.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_fused_sample_flags_and_memoization():
    model = VelocityDiffusion(name="tiny", fp16=False)
    model.__dict__.pop("_sample_runs", None)
    out = model.sample(
        n_images=2, n_steps=3, eta=0.5, churn=0.003, correction=True,
        key=jax.random.PRNGKey(1),
    )
    assert out.shape == (2, *model.shape)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert len(model._sample_runs) == 1
    # eta/churn are traced: sweeping them must reuse the one executable
    model.sample(
        n_images=2, n_steps=3, eta=0.7, churn=0.005, correction=True,
        key=jax.random.PRNGKey(2),
    )
    assert len(model._sample_runs) == 1


def test_fused_sample_conditioned_defaults_to_zero_embedding():
    model = VelocityDiffusion(name="tiny_conditioned", fp16=False)
    out = model.sample(n_images=1, n_steps=2, key=jax.random.PRNGKey(0))
    assert out.shape == (1, *model.shape)
    assert bool(jnp.all(jnp.isfinite(out)))
    # batch > 1: the default embedding and a single user embedding must
    # both broadcast to the batch (the UNet mapping concatenates per-sample)
    out = model.sample(n_images=2, n_steps=2, key=jax.random.PRNGKey(1))
    assert out.shape == (2, *model.shape)
    out = model.sample(
        n_images=2, n_steps=2, conditioning=jnp.ones((1, 8)),
        key=jax.random.PRNGKey(2),
    )
    assert out.shape == (2, *model.shape)


def test_fused_sample_mesh_matches_unsharded():
    """sample(mesh=) shards the batch over data (params replicated via
    rule demotion) and matches the single-device program."""
    from perceptor_tpu import parallel

    model = VelocityDiffusion(name="tiny", fp16=False)
    mesh = parallel.create_mesh(data=4, tensor=2)
    kwargs = dict(n_images=4, n_steps=2, key=jax.random.PRNGKey(0))
    expected = model.sample(**kwargs)
    sharded = model.sample(mesh=mesh, **kwargs)
    assert sharded.shape == expected.shape
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(expected), atol=1e-4
    )


def test_yfcc_full_config_constructs_and_traces_native_shape():
    """Regression (caught by bench.py --family velocity): the random-init
    path downsized its init input to 64px, but yfcc's 8 levels pool the
    map 7 times — 64/2^7 = 0 rows at the innermost level. Construction
    must succeed and the module must trace at the native 512px shape."""
    model = VelocityDiffusion("yfcc_2", fp16=False)
    out = jax.eval_shape(
        lambda p, d: model.module.apply({"params": p}, d, jnp.zeros((1,))),
        model.params,
        jnp.zeros((1, *model.shape)),
    )
    assert out.shape == (1, *model.shape)
