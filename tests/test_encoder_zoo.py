"""CLOOB / SLIP / RuCLIP / TransformersOpenAICLIP tests (hermetic tiny
configs + CLOOB torch parity)."""

import importlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu import losses
from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer
from perceptor_tpu.models.cloob import CLOOB, CLOOBConfig, convert_cloob
from perceptor_tpu.models.ruclip import RuCLIP
from perceptor_tpu.models.slip import SLIP


@pytest.mark.slow
def test_parity_cloob_model():
    import torch

    # model_pt imports open_clip and torchvision at module level (only used
    # by CLOOBModel, which this test never builds) — stub them out
    if "open_clip" not in sys.modules:
        stub = types.ModuleType("open_clip")
        stub.tokenize = None
        sys.modules["open_clip"] = stub
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tf = types.ModuleType("torchvision.transforms")
        tf.Normalize = lambda *a, **k: None
        tv.transforms = tf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tf
    pkg = types.ModuleType("refcloob")
    pkg.__path__ = ["/root/reference/perceptor/models/cloob"]
    sys.modules.setdefault("refcloob", pkg)
    model_pt = importlib.import_module("refcloob.model_pt")

    torch.manual_seed(0)
    image_encoder = model_pt.ViTImageEncoder(16, 2, 32, (32 // 16) ** 2, 2, 3, 16)
    text_encoder = model_pt.TextEncoder(16, 2, 32, 16, 2, 64)
    image_encoder.eval(), text_encoder.eval()

    sd = {}
    for k, v in image_encoder.state_dict().items():
        sd[f"image_encoder.{k}"] = v
    for k, v in text_encoder.state_dict().items():
        sd[f"text_encoder.{k}"] = v
    cfg = CLOOBConfig(
        d_embed=16, image_size=32, patch_size=16, vision_layers=2,
        vision_width=32, vision_heads=2, text_layers=2, text_width=32,
        text_heads=2, text_size=16, vocab_size=64,
    )
    params = convert_cloob(sd, cfg)

    from perceptor_tpu.models.cloob import CLOOBImageEncoder, CLOOBTextEncoder

    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected_img = image_encoder(x).numpy()
    actual_img = CLOOBImageEncoder(cfg, dtype=jnp.float32).apply(
        {"params": jax.tree.map(jnp.asarray, params["image"])},
        jnp.asarray(x.numpy()),
    )
    np.testing.assert_allclose(np.asarray(actual_img), expected_img, atol=2e-5)

    tokens = torch.randint(0, 63, (2, 16))
    tokens[:, 10] = 63  # EOT
    with torch.no_grad():
        expected_txt = text_encoder(tokens).numpy()
    actual_txt = CLOOBTextEncoder(cfg, dtype=jnp.float32).apply(
        {"params": jax.tree.map(jnp.asarray, params["text"])},
        jnp.asarray(tokens.numpy()),
    )
    np.testing.assert_allclose(np.asarray(actual_txt), expected_txt, atol=2e-5)


def _tiny_tokenizer():
    return SimpleTokenizer(merges=[])


def test_cloob_wrapper_and_loss():
    model = CLOOB("tiny", tokenizer=_tiny_tokenizer())
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 48, 48))
    encodings = model.encode_images(images)
    assert encodings.shape == (1, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(encodings), axis=-1), 1.0, atol=1e-3
    )

    loss = losses.CLOOB("tiny", tokenizer=_tiny_tokenizer())
    loss.add_texts_(["a cat"])
    value = loss.forward(images)
    assert np.isfinite(float(value))
    grads = jax.grad(lambda im: loss.forward(im))(images)
    assert bool(jnp.any(grads != 0))


def test_slip_wrapper_and_loss():
    model = SLIP("tiny", tokenizer=_tiny_tokenizer())
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 48, 48))
    encodings = model.encode_images(images)
    assert encodings.shape == (1, 16)
    texts = model.encode_texts(["a photo"])
    assert texts.shape == (1, 16)

    loss = losses.SLIP("tiny", tokenizer=_tiny_tokenizer())
    loss.add_texts_(["a cat"])
    assert np.isfinite(float(loss.forward(images)))


def test_ruclip_wrapper_and_loss():
    def fake_tokenizer(texts):
        tokens = np.zeros((len(texts), 16), dtype=np.int32)
        tokens[:, 0] = 2  # bos
        tokens[:, 1] = 5
        tokens[:, 2] = 3  # eos
        return tokens

    model = RuCLIP("tiny", tokenizer=fake_tokenizer)
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 48, 48))
    encodings = model.encode_images(images)
    assert encodings.shape == (1, 16)
    texts = model.encode_texts(["кошка"])
    assert texts.shape == (1, 16)

    loss = losses.RuCLIP("tiny", tokenizer=fake_tokenizer)
    loss.add_texts_(["кошка"])
    assert np.isfinite(float(loss.forward(images)))


def test_ruclip_requires_tokenizer():
    model = RuCLIP("tiny")
    with pytest.raises(ValueError):
        model.encode_texts(["кошка"])


def test_transformers_clip_same_as_openclip():
    """The reference's own parity test (transformers_openai_clip.py:155-171):
    the two wrappers compute the same encodings given the same weights."""
    from perceptor_tpu import models
    from perceptor_tpu.models.transformers_openai_clip import TransformersOpenAICLIP

    hf = TransformersOpenAICLIP(
        "openai/clip-vit-base-patch32", tokenizer=_tiny_tokenizer()
    )
    open_clip = models.CLIP("ViT-B-32", tokenizer=_tiny_tokenizer())
    # same deterministic random init (same config -> same eval_shape tree)
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 64, 64))
    a = hf.encode_images(images)
    b = open_clip.encode_images(images)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)  # bf16 fusion noise


def test_laion_hf_names_resolve_to_openclip_archs():
    """The reference accepts the laion2B HF ids (its docstring list,
    transformers_openai_clip.py:38-44); each must map onto a known
    open_clip architecture config (plain GELU for laion towers)."""
    from perceptor_tpu.models.clip import configs as clip_configs
    from perceptor_tpu.models.transformers_openai_clip import NAME_TO_ARCH

    for name, arch in NAME_TO_ARCH.items():
        config = clip_configs.get_config(arch)
        assert config.quick_gelu == name.startswith("openai/"), name
