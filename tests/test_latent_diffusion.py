"""LDM family tests incl. parity vs the vendored CompVis modules."""

import importlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.models.latent_diffusion import (
    BERTEncoder,
    BERTTokenizer,
    Face,
    SuperResolution,
    Text2Image,
    VQModel,
    convert_compvis_autoencoder,
)
from perceptor_tpu.models.latent_diffusion import bert as bert_lib
from perceptor_tpu.models.latent_diffusion import first_stage

REF_ROOT = "/root/reference/perceptor"


def _register_reference_ldm():
    """Stub the perceptor package chain so vendored ldm modules (absolute
    imports) load without executing the heavy package __init__s."""
    pytest.importorskip("torch")
    pytest.importorskip("einops")
    chain = {
        "perceptor": REF_ROOT,
        "perceptor.models": f"{REF_ROOT}/models",
        "perceptor.models.latent_diffusion": f"{REF_ROOT}/models/latent_diffusion",
    }
    for name, path in chain.items():
        if name not in sys.modules:
            stub = types.ModuleType(name)
            stub.__path__ = [path]
            sys.modules[name] = stub
    # openaimodel lazily imports omegaconf.listconfig.ListConfig (not
    # installed here) just for an isinstance check — stub it out
    if "omegaconf" not in sys.modules:
        omegaconf = types.ModuleType("omegaconf")
        listconfig = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        listconfig.ListConfig = ListConfig
        omegaconf.listconfig = listconfig
        sys.modules["omegaconf"] = omegaconf
        sys.modules["omegaconf.listconfig"] = listconfig


@pytest.mark.slow
@pytest.mark.parity_smoke
def test_parity_ldm_unet_spatial_transformer():
    import torch

    _register_reference_ldm()
    openaimodel = importlib.import_module(
        "perceptor.models.latent_diffusion.ldm.modules.diffusionmodules.openaimodel"
    )
    from perceptor_tpu.models.guided_diffusion import convert as adm_convert
    from perceptor_tpu.models.guided_diffusion.config import ADMConfig
    from perceptor_tpu.models.guided_diffusion.unet import ADMUNet

    cfg = ADMConfig(
        image_size=16,
        model_channels=64,
        channel_mult=(1, 2),
        num_res_blocks=1,
        attention_ds=(1, 2),
        num_heads=2,
        in_channels=4,
        out_channels=4,
        spatial_transformer=True,
        context_dim=48,
    )
    torch_model = openaimodel.UNetModel(
        image_size=16,
        in_channels=4,
        out_channels=4,
        model_channels=64,
        attention_resolutions=(1, 2),
        num_res_blocks=1,
        channel_mult=(1, 2),
        num_heads=2,
        use_spatial_transformer=True,
        transformer_depth=1,
        context_dim=48,
        legacy=False,
    ).eval()
    params = adm_convert.from_torch(torch_model.state_dict())

    torch.manual_seed(0)
    x = torch.randn(2, 4, 16, 16)
    t = torch.tensor([400.0, 20.0])
    context = torch.randn(2, 7, 48)
    with torch.no_grad():
        expected = torch_model(x, t, context=context).numpy()

    module = ADMUNet(cfg, dtype=jnp.float32)
    actual = module.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(x.numpy()),
        jnp.asarray(t.numpy()),
        jnp.asarray(context.numpy()),
    )
    np.testing.assert_allclose(np.asarray(actual), expected, atol=2e-4)


@pytest.mark.slow
@pytest.mark.parity_smoke
def test_parity_compvis_autoencoder():
    import torch

    _register_reference_ldm()
    model_mod = importlib.import_module(
        "perceptor.models.latent_diffusion.ldm.modules.diffusionmodules.model"
    )
    ddconfig = dict(
        double_z=False, z_channels=3, resolution=64, in_channels=3, out_ch=3,
        ch=32, ch_mult=(1, 2, 4), num_res_blocks=2, attn_resolutions=[],
        dropout=0.0,
    )
    encoder = model_mod.Encoder(**ddconfig).eval()
    decoder = model_mod.Decoder(**ddconfig).eval()

    cfg = first_stage.VQ_F4.__class__(
        latent_channels=3, base_channels=32, channel_mults=(1, 2, 4),
        n_res_blocks=2, double_z=False, scaling_factor=1.0,
    )
    sd = {}
    for k, v in encoder.state_dict().items():
        sd[f"first_stage_model.encoder.{k}"] = v
    for k, v in decoder.state_dict().items():
        sd[f"first_stage_model.decoder.{k}"] = v
    # identity quant convs so the backbone parity is exercised alone
    eye = torch.eye(3)[:, :, None, None]
    sd["first_stage_model.quant_conv.weight"] = eye
    sd["first_stage_model.quant_conv.bias"] = torch.zeros(3)
    sd["first_stage_model.post_quant_conv.weight"] = eye
    sd["first_stage_model.post_quant_conv.bias"] = torch.zeros(3)
    params = convert_compvis_autoencoder(sd, cfg)

    torch.manual_seed(0)
    xs = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        encoded = encoder(xs)
        decoded = decoder(encoded)

    module = VQModel(cfg, dtype=jnp.float32)
    latents = module.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(xs.numpy()),
        method=VQModel.encode,
    )
    np.testing.assert_allclose(np.asarray(latents), encoded.numpy(), atol=2e-4)
    images = module.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        latents,
        True,  # force_not_quantize: match raw decoder output
        method=VQModel.decode,
    )
    np.testing.assert_allclose(np.asarray(images), decoded.numpy(), atol=2e-4)


@pytest.mark.slow
def test_parity_bert_x_transformer():
    import torch

    _register_reference_ldm()
    xt = importlib.import_module(
        "perceptor.models.latent_diffusion.ldm.modules.x_transformer"
    )
    cfg = bert_lib.BERTConfig(vocab_size=64, width=64, depth=2, heads=2,
                              dim_head=32, max_seq_len=16)
    torch_model = xt.TransformerWrapper(
        num_tokens=cfg.vocab_size,
        max_seq_len=cfg.max_seq_len,
        attn_layers=xt.Encoder(dim=cfg.width, depth=cfg.depth, heads=cfg.heads,
                               attn_dim_head=cfg.dim_head),
    ).eval()
    sd = {f"cond_stage_model.transformer.{k}": v
          for k, v in torch_model.state_dict().items()}
    params = bert_lib.convert_bert(sd, cfg)

    torch.manual_seed(0)
    tokens = torch.randint(0, cfg.vocab_size, (2, 16))
    with torch.no_grad():
        expected = torch_model(tokens, return_embeddings=True).numpy()

    module = BERTEncoder(cfg, dtype=jnp.float32)
    actual = module.apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(tokens.numpy())
    )
    np.testing.assert_allclose(np.asarray(actual), expected, atol=2e-4)


# -- hermetic tiny wrapper tests --------------------------------------------------

_TINY_VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "cat", "photo", "of",
               "##s", "the"]


@pytest.fixture(scope="module")
def tiny_text2image():
    tokenizer = BERTTokenizer(vocab=_TINY_VOCAB, max_length=16)
    return Text2Image(fp16=False, tiny=True, tokenizer=tokenizer, guidance_scale=3.0)


def test_text2image_sampler_loop(tiny_text2image):
    model = tiny_text2image
    conditioning = model.conditioning(["a photo of a cat"])
    latents = model.random_latents((1, 3, 64, 64), jax.random.PRNGKey(0))
    for from_index, to_index in model.schedule_indices(
        from_index=999, to_index=500, n_steps=3
    ):
        denoised = model.denoise(latents, int(from_index), conditioning)
        latents = model.step(latents, denoised, int(from_index), int(to_index))
    images = model.images(model.denoise(latents, 500, conditioning))
    assert images.shape == (1, 3, 64, 64)
    assert bool(jnp.all(jnp.isfinite(images)))


def test_text2image_latents_roundtrip_shape(tiny_text2image):
    model = tiny_text2image
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 64, 64))
    latents = model.latents(images)
    assert latents.shape == tuple(
        [1] + model.latent_shape(64, 64)
    )


def test_face_denoise_and_decode():
    model = Face(fp16=False, tiny=True)
    latents = model.random_latents((1, 3, 16, 16), jax.random.PRNGKey(0))
    denoised = model.denoise(latents, 800)
    stepped = model.step(latents, denoised, 800, 600)
    images = model.images(stepped)
    assert images.shape == (1, 3, 16, 16)
    assert bool(jnp.all(jnp.isfinite(images)))


def test_super_resolution_flow():
    model = SuperResolution(fp16=False, tiny=True, eta=0.0)
    lr_images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 8, 8))
    hr_guess = model.upsample(lr_images)
    assert hr_guess.shape == (1, 3, 8 * model.up_f, 8 * model.up_f)
    conditioning = model.conditioning(hr_guess)
    latents = model.latents(hr_guess)
    diffused = model.diffuse(latents, 500, key=jax.random.PRNGKey(1))
    denoised = model.denoise(diffused, conditioning, 500)
    assert denoised.shape == latents.shape
    out = model.images(denoised)
    assert out.shape == hr_guess.shape


def test_vq_quantizer_straight_through():
    cfg = first_stage.TINY_VQ
    module = VQModel(cfg, dtype=jnp.float32)
    from perceptor_tpu.core.init import init_by_shape

    params = init_by_shape(
        module.init, jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16))
    )["params"]
    latents = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 8, 8))

    def loss(latents):
        return jnp.square(
            module.apply({"params": params}, latents, method=VQModel.decode)
        ).mean()

    grads = jax.grad(loss)(latents)
    assert bool(jnp.any(grads != 0))  # straight-through keeps gradients alive


def test_bert_tokenizer_wordpiece():
    tokenizer = BERTTokenizer(vocab=_TINY_VOCAB, max_length=8)
    tokens = tokenizer(["a photo of cats"])
    assert tokens.shape == (1, 8)
    assert tokens[0, 0] == 2  # [CLS]
    assert 3 in tokens[0]  # [SEP]
    # "cats" -> "cat" + "##s"
    assert 5 in tokens[0] and 8 in tokens[0]


@pytest.mark.slow
def test_parity_sd_unet_vs_compvis():
    """Flagship parity: the diffusers-style SD UNet against the vendored
    CompVis openaimodel.UNetModel (same math, different checkpoint layout)
    through the compvis->diffusers key remap (convert.unet_from_compvis)."""
    import torch

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
        image_size=16,
        in_channels=4,
        out_channels=4,
        model_channels=32,
        num_res_blocks=1,
        attention_resolutions=(1,),
        channel_mult=(1, 2),
        num_heads=2,
        use_spatial_transformer=True,
        transformer_depth=1,
        context_dim=48,
        legacy=False,
    ).eval()
    params = sd_convert.unet_from_compvis(torch_model.state_dict(), cfg, prefix="")

    torch.manual_seed(1)
    x = torch.randn(2, 4, 16, 16)
    t = torch.tensor([400.0, 20.0])
    context = torch.randn(2, 7, 48)
    with torch.no_grad():
        expected = torch_model(x, t, context=context).numpy()

    module = UNet(cfg, dtype=jnp.float32)
    actual = module.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(x.numpy()),
        jnp.asarray(t.numpy()),
        jnp.asarray(context.numpy()),
    )
    np.testing.assert_allclose(np.asarray(actual), expected, atol=2e-4)


def test_text2image_fused_sample_matches_stepwise(tiny_text2image):
    """Text2Image.sample() (one lax.scan program) must equal the host
    per-step loop it fuses (the reference's test loop, reference
    text2image.py:164-179), CFG included."""
    model = tiny_text2image  # guidance_scale=3.0, eta=0.0
    key = jax.random.PRNGKey(5)
    out = model.sample(
        ["a photo of a cat"], n_steps=3, size=(64, 64), key=key,
        from_index=999, to_index=500,
    )

    init_key, _ = jax.random.split(key)
    latents = model.random_latents((1, 3, 64, 64), init_key)
    cond = model.conditioning(["a photo of a cat"])
    for from_index, to_index in model.schedule_indices(
        from_index=999, to_index=500, n_steps=3
    ):
        denoised = model.denoise(latents, int(from_index), cond)
        latents = model.step(latents, denoised, int(from_index), int(to_index))
    expected = model.images(model.denoise(latents, 500, cond))

    assert out.shape == expected.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_text2image_fused_sample_memoizes_and_traces_scale(tiny_text2image):
    model = tiny_text2image
    model.__dict__.pop("_sample_runs", None)
    kwargs = dict(n_steps=2, size=(64, 64), from_index=999, to_index=500,
                  key=jax.random.PRNGKey(0))
    a = model.sample(["a"], guidance_scale=2.0, **kwargs)
    b = model.sample(["a"], guidance_scale=8.0, **kwargs)
    assert len(model._sample_runs) == 1  # scale is traced
    assert bool(jnp.any(jnp.abs(a - b) > 1e-6))  # ...but takes effect


def test_face_fused_sample_matches_stepwise():
    model = Face(fp16=False, tiny=True)
    key = jax.random.PRNGKey(9)
    out = model.sample(
        n_images=1, n_steps=3, size=(64, 64), key=key,
        from_index=999, to_index=500,
    )

    init_key, _ = jax.random.split(key)
    latents = model.random_latents((1, 3, 64, 64), init_key)
    for from_index, to_index in model.schedule_indices(
        from_index=999, to_index=500, n_steps=3
    ):
        denoised = model.denoise(latents, int(from_index))
        latents = model.step(latents, denoised, int(from_index), int(to_index))
    expected = model.images(model.denoise(latents, 500))

    assert out.shape == expected.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_super_resolution_fused_sample_matches_stepwise():
    model = SuperResolution(fp16=False, tiny=True, eta=0.0)
    lr = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 16, 16))
    hr_canvas = model.upsample(lr)
    key = jax.random.PRNGKey(11)
    out = model.sample(hr_canvas, n_steps=3, key=key, from_index=999, to_index=500)

    init_key, _ = jax.random.split(key)
    cond = model.conditioning(hr_canvas)
    latents = jax.random.normal(
        init_key, (1, model.unet_config.out_channels, *cond.shape[-2:])
    )
    for from_index, to_index in model.schedule_indices(999, 500, 3):
        denoised = model.denoise(latents, cond, int(from_index))
        latents = model.step(latents, denoised, int(from_index), int(to_index))
    expected = model.images(model.denoise(latents, cond, 500))

    assert out.shape == expected.shape == hr_canvas.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)
