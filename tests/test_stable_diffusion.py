"""Stable Diffusion stack tests (hermetic: tiny configs, random weights).

Test strategy per SURVEY §4: construction + gradient-flow smoke tests on
tiny configs, numerical parity against locally-constructed PyTorch
reference modules (the HF CLIPText tower), and a converter/module
structural-agreement round-trip (the hermetic stand-in for the
reference's diffusers parity test, reference stable_diffusion.py:574-658,
which needs downloaded weights).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.models.stable_diffusion import (
    AutoencoderKL,
    CLIPTextEncoder,
    StableDiffusion,
    UNet,
    config as sd_config,
    )
from perceptor_tpu.models.stable_diffusion import convert


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = sd_config.TINY_UNET
    module = UNet(cfg)
    latents = jnp.zeros((2, cfg.in_channels, 16, 16))
    params = module.init(
        jax.random.PRNGKey(0),
        latents,
        jnp.zeros((2,)),
        jnp.zeros((2, 8, cfg.context_dim)),
    )["params"]
    return module, params


@pytest.fixture(scope="module")
def tiny_vae():
    cfg = sd_config.TINY_VAE
    module = AutoencoderKL(cfg)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16)))["params"]
    return module, params


def test_unet_forward_shape_and_finite(tiny_unet):
    module, params = tiny_unet
    latents = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16))
    context = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 32))
    out = module.apply({"params": params}, latents, jnp.array([500.0, 10.0]), context)
    assert out.shape == latents.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    # different timesteps must change the output (time conditioning works)
    out2 = module.apply({"params": params}, latents, jnp.array([1.0, 990.0]), context)
    assert bool(jnp.any(jnp.abs(out - out2) > 1e-6))


def test_unet_gradient_flows_to_input_and_context(tiny_unet):
    module, params = tiny_unet
    latents = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16))
    context = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 32))

    def loss(latents, context):
        out = module.apply({"params": params}, latents, jnp.array([500.0]), context)
        return jnp.square(out).mean()

    g_lat, g_ctx = jax.grad(loss, argnums=(0, 1))(latents, context)
    assert bool(jnp.any(g_lat != 0)) and bool(jnp.any(g_ctx != 0))


def test_unet_remat_matches(tiny_unet):
    module, params = tiny_unet
    cfg = sd_config.UNetConfig(**{**sd_config.TINY_UNET.__dict__, "remat": True})
    remat_module = UNet(cfg)
    latents = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16))
    context = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 32))
    out = module.apply({"params": params}, latents, jnp.array([500.0]), context)
    out_remat = remat_module.apply(
        {"params": params}, latents, jnp.array([500.0]), context
    )
    np.testing.assert_allclose(out, out_remat, atol=1e-5)


def test_vae_roundtrip_shapes_and_grad(tiny_vae):
    module, params = tiny_vae
    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 16, 16))
    latents = module.apply({"params": params}, images, method=AutoencoderKL.encode)
    assert latents.shape == (2, 4, 8, 8)
    decoded = module.apply({"params": params}, latents, method=AutoencoderKL.decode)
    assert decoded.shape == images.shape

    def loss(latents):
        return jnp.square(
            module.apply({"params": params}, latents, method=AutoencoderKL.decode)
        ).mean()

    grads = jax.grad(loss)(latents)
    assert bool(jnp.any(grads != 0))


def test_vae_stochastic_encode_uses_key(tiny_vae):
    module, params = tiny_vae
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 16, 16))
    a = module.apply(
        {"params": params}, images, jax.random.PRNGKey(1), method=AutoencoderKL.encode
    )
    b = module.apply(
        {"params": params}, images, jax.random.PRNGKey(2), method=AutoencoderKL.encode
    )
    mode = module.apply({"params": params}, images, method=AutoencoderKL.encode)
    assert bool(jnp.any(a != b))
    assert bool(jnp.any(a != mode))


def test_finetuneable_vae_restores_params():
    """Reference :200-215: VAE grads flow inside the scope and the frozen
    originals come back on exit (including after in-place mutation)."""
    from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer

    model = StableDiffusion(name="tiny", fp16=False, tokenizer=SimpleTokenizer(merges=[]))
    original_leaf = jax.tree_util.tree_leaves(model.params["vae"])[0]
    latents = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8))
    baseline = model.decode(latents)

    with model.finetuneable_vae() as m:
        assert m is model
        grads = jax.grad(
            lambda vp: jnp.square(
                m.decode_fn({**m.params, "vae": vp}, latents)
            ).mean()
        )(m.params["vae"])
        assert jax.tree_util.tree_reduce(
            lambda acc, leaf: acc or bool(jnp.any(leaf != 0)), grads, False
        )
        # "finetune": perturb the VAE, both by rebind and in-place
        m.params["vae"] = jax.tree.map(lambda p: p + 0.1, m.params["vae"])
        inside = m.decode(latents)
        assert bool(jnp.any(jnp.abs(inside - baseline) > 1e-6))

    assert jax.tree_util.tree_leaves(model.params["vae"])[0] is original_leaf
    np.testing.assert_allclose(model.decode(latents), baseline, atol=0)


def test_text_encoder_parity_with_hf_clip():
    """Numerical parity vs a locally-built torch CLIPTextModel with random
    weights converted through convert.text_from_hf (the reference's parity
    bar: text encodings atol 1e-3, stable_diffusion.py:633-642)."""
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = sd_config.TINY_TEXT
    hf_config = CLIPTextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.width,
        intermediate_size=cfg.width * 4,
        num_hidden_layers=cfg.layers,
        num_attention_heads=cfg.heads,
        max_position_embeddings=cfg.context_length,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf_model = CLIPTextModel(hf_config).eval()
    state_dict = {k: v for k, v in hf_model.state_dict().items()}
    params = convert.text_from_hf(state_dict, cfg)

    tokens = np.array([[49406 % cfg.vocab_size, 5, 9, 3, 0, 0, 0, 0]], dtype=np.int32)
    with torch.no_grad():
        expected = hf_model(
            input_ids=torch.tensor(tokens, dtype=torch.long)
        ).last_hidden_state.numpy()

    module = CLIPTextEncoder(cfg)
    actual = module.apply({"params": params}, jnp.asarray(tokens))
    np.testing.assert_allclose(actual, expected, atol=1e-3)


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree


_TORCH_NAME_SUBS = [
    (r"down_blocks_(\d+)_resnets_(\d+)", r"down_blocks.\1.resnets.\2"),
    (r"down_blocks_(\d+)_attentions_(\d+)", r"down_blocks.\1.attentions.\2"),
    (r"down_blocks_(\d+)_downsamplers_0_conv", r"down_blocks.\1.downsamplers.0.conv"),
    (r"down_blocks_(\d+)_downsamplers_0", r"down_blocks.\1.downsamplers.0"),
    (r"up_blocks_(\d+)_resnets_(\d+)", r"up_blocks.\1.resnets.\2"),
    (r"up_blocks_(\d+)_attentions_(\d+)", r"up_blocks.\1.attentions.\2"),
    (r"up_blocks_(\d+)_upsamplers_0_conv", r"up_blocks.\1.upsamplers.0.conv"),
    (r"up_blocks_(\d+)_upsamplers_0", r"up_blocks.\1.upsamplers.0"),
    (r"mid_block_resnets_(\d+)", r"mid_block.resnets.\1"),
    (r"mid_block_attentions_(\d+)", r"mid_block.attentions.\1"),
    (r"transformer_blocks_(\d+)", r"transformer_blocks.\1"),
    (r"\bresnets_(\d+)", r"resnets.\1"),
    (r"\battentions_(\d+)", r"attentions.\1"),
    (r"to_out_0", r"to_out.0"),
    (r"net_0_proj", r"net.0.proj"),
    (r"net_2", r"net.2"),
]


def _to_torch_state_dict(params):
    """Inverse of convert.py's mapping: flax tree -> synthetic diffusers
    state dict (names + torch weight layout)."""
    sd = {}
    for path, value in _flatten(params):
        *modules, leaf = path
        name = ".".join(modules)
        for pattern, repl in _TORCH_NAME_SUBS:
            name = re.sub(pattern, repl, name)
        value = np.asarray(value)
        if leaf == "kernel":
            if value.ndim == 4:
                value = value.transpose(3, 2, 0, 1)
            else:
                value = value.T
            sd[f"{name}.weight"] = value
        elif leaf == "scale":
            sd[f"{name}.weight"] = value
        else:
            sd[f"{name}.{leaf}"] = value
    return sd


def _assert_trees_equal(converted, params):
    flat_a = {p: v for p, v in _flatten(converted)}
    flat_b = {p: v for p, v in _flatten(params)}
    assert set(flat_a) == set(flat_b), (
        set(flat_a) ^ set(flat_b)
    )
    for path, value in flat_b.items():
        np.testing.assert_allclose(
            flat_a[path], np.asarray(value), atol=1e-6, err_msg=str(path)
        )


def test_unet_converter_agrees_with_module_structure(tiny_unet):
    _, params = tiny_unet
    sd = _to_torch_state_dict(params)
    converted = convert.unet_from_diffusers(sd, sd_config.TINY_UNET)
    _assert_trees_equal(converted, params)


def test_vae_converter_agrees_with_module_structure(tiny_vae):
    _, params = tiny_vae
    sd = _to_torch_state_dict(params)
    converted = convert.vae_from_diffusers(sd, sd_config.TINY_VAE)
    _assert_trees_equal(converted, params)


# -- wrapper ----------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_sd():
    from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer

    tokenizer = SimpleTokenizer(merges=[])
    return StableDiffusion(name="tiny", fp16=False, tokenizer=tokenizer)


def test_sd_schedule_indices_monotonic(tiny_sd):
    pairs = tiny_sd.schedule_indices(n_steps=20)
    assert (pairs[:, 0] > pairs[:, 1]).all()
    assert (pairs[1:, 0] == pairs[:-1, 1]).all()


def test_sd_predictions_and_step(tiny_sd):
    key = jax.random.PRNGKey(0)
    latents = tiny_sd.random_diffused_latents((1, 16, 16), key)
    conditioning = tiny_sd.conditioning(["a photo"])
    predictions = tiny_sd.predictions(latents, 999, conditioning)
    assert predictions.predicted_noise.shape == latents.shape
    stepped = predictions.step(700)
    assert stepped.shape == latents.shape
    images = predictions.denoised_images
    assert images.shape == (1, 3, 16, 16)


def test_sd_sample_end_to_end(tiny_sd):
    images = tiny_sd.sample(
        ["a photo"], n_steps=4, size=(16, 16), key=jax.random.PRNGKey(0)
    )
    assert images.shape == (1, 3, 16, 16)
    assert bool(jnp.all(jnp.isfinite(images)))


def test_sd_diffuse_latents(tiny_sd):
    latents = jnp.zeros((1, 4, 2, 2))
    diffused = tiny_sd.diffuse_latents(latents, 999, jax.random.PRNGKey(0))
    # at index 999 sigma ~1: output should be ~pure noise, std near 1
    assert 0.5 < float(diffused.std()) < 1.5


def test_sd_rejects_bad_size(tiny_sd):
    with pytest.raises(ValueError):
        tiny_sd.random_diffused_latents((1, 17, 16), jax.random.PRNGKey(0))


def test_inpainting_conditioning_and_step():
    """Inpainting checkpoint path (reference conditioning.py:31-40 +
    stable_diffusion.py:343-375): 9-channel UNet input, masked-image
    latents, sampler step through the Conditioning object."""
    from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer
    from perceptor_tpu.models.stable_diffusion import Conditioning, StableDiffusion

    model = StableDiffusion(
        "tiny-inpainting", tokenizer=SimpleTokenizer(merges=[])
    )
    size = 32
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, size, size))
    masks = jnp.zeros((1, 1, size, size)).at[:, :, 8:24, 8:24].set(1.0)
    cond = model.conditioning(
        ["a test"], inpainting_masks=masks, inpainting_images=images
    )
    assert isinstance(cond, Conditioning)
    down = model.vae_config.downscale
    assert cond.inpainting_latent_masks.shape == (1, 1, size // down, size // down)
    assert cond.inpainting_latents.shape[1] == model.vae_config.latent_channels
    # blurred mask stays in [0, 1] and is nontrivial
    assert 0.0 < float(cond.inpainting_latent_masks.max()) <= 1.0

    neg = -cond
    np.testing.assert_allclose(
        np.asarray(neg.encodings), -np.asarray(cond.encodings)
    )

    latents = jax.random.normal(
        jax.random.PRNGKey(1),
        (1, model.vae_config.latent_channels, size // down, size // down),
    )
    # input assembly: 4 + 1 + 4 channels
    assembled = cond.input(latents)
    assert assembled.shape[1] == 9
    predictions = model.predictions(latents, jnp.array([500]), cond)
    stepped = predictions.step(jnp.array([480]))
    assert stepped.shape == latents.shape
    assert bool(jnp.all(jnp.isfinite(stepped)))

    # missing mask/images must fail loudly
    with pytest.raises(ValueError):
        model.conditioning(["a test"])


def test_inpainting_rejected_without_masks_on_normal_model(tiny_sd):
    """Non-inpainting checkpoints return raw encoder states."""
    cond = tiny_sd.conditioning(["hello"])
    assert isinstance(cond, jnp.ndarray)


def test_sd_sample_img2img_and_resample(tiny_sd):
    """img2img start (init_images + from_index) with RePaint resampling."""
    init_images = jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 32, 32))
    images = tiny_sd.sample(
        ["a test"],
        n_steps=3,
        size=(32, 32),
        from_index=500,
        init_images=init_images,
        n_resample=1,
    )
    assert images.shape == (1, 3, 32, 32)
    assert bool(jnp.all(jnp.isfinite(images)))
    with pytest.raises(ValueError):
        tiny_sd.sample(["a test"], n_steps=2, size=(32, 32), from_index=500)


def test_sd_sample_inpainting_replace_diffused():
    from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer
    from perceptor_tpu.models.stable_diffusion import StableDiffusion

    model = StableDiffusion(
        "tiny-inpainting", tokenizer=SimpleTokenizer(merges=[])
    )
    size = 32
    init_images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, size, size))
    masks = jnp.zeros((1, 1, size, size)).at[:, :, 8:24, 8:24].set(1.0)
    images = model.sample(
        ["a test"],
        n_steps=3,
        size=(size, size),
        from_index=700,
        init_images=init_images,
        inpainting_masks=masks,
        replace_diffused=True,
    )
    assert images.shape == (1, 3, size, size)
    assert bool(jnp.all(jnp.isfinite(images)))


def test_sd_sample_memo_shared_across_scales(tiny_sd):
    """ONE jit wrapper per instance: static options ride as static_argnums
    (jax's jit cache keys the executables), traced guidance_scale/eta
    values never retrace."""
    tiny_sd.sample(["a photo"], n_steps=2, size=(16, 16), key=jax.random.PRNGKey(0))
    run = tiny_sd._get_sample_run()
    for scale in (1.0, 3.5, 7.0):
        tiny_sd.sample(
            ["a photo"], n_steps=2, size=(16, 16), guidance_scale=scale,
            key=jax.random.PRNGKey(0),
        )
    tiny_sd.sample(
        ["a photo"], n_steps=2, size=(16, 16), eta=0.5,
        key=jax.random.PRNGKey(0),
    )
    tiny_sd.sample(
        ["a photo"], n_steps=2, size=(16, 16), eta=0.8,
        key=jax.random.PRNGKey(0),
    )
    assert tiny_sd._get_sample_run() is run  # the one wrapper, never rebuilt


def test_sd_sample_mesh_matches_unsharded(tiny_sd):
    """sample(mesh=) shards params by TP rules + the batch over data; the
    result matches the single-device program."""
    from perceptor_tpu import parallel

    mesh = parallel.create_mesh(data=4, tensor=2)
    kwargs = dict(n_steps=3, size=(16, 16), key=jax.random.PRNGKey(0))
    expected = tiny_sd.sample(["a photo"] * 8, **kwargs)
    sharded = tiny_sd.sample(["a photo"] * 8, mesh=mesh, **kwargs)
    assert sharded.shape == expected.shape
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(expected), atol=1e-2
    )
    # indivisible batch falls back to replication, still correct
    one = tiny_sd.sample(["a photo"], mesh=mesh, **kwargs)
    assert one.shape == (1, 3, 16, 16)
    assert bool(jnp.all(jnp.isfinite(one)))


def test_sample_prime_aot():
    """prime=True compiles without executing; the next sample() reuses the
    memoized program."""
    from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer
    from perceptor_tpu.models.stable_diffusion import StableDiffusion

    model = StableDiffusion(
        name="tiny", fp16=False, tokenizer=SimpleTokenizer(merges=[])
    )
    assert model.prime(sizes=((64, 64),), n_steps=2) is None
    run = model._get_sample_run()
    out = model.sample(["a prompt"], n_steps=2, size=(64, 64))
    assert out.shape == (1, 3, 64, 64)
    assert model._get_sample_run() is run  # same program reused
