"""GlideCLIP tests: torch parity against the vendored encoders + wrapper."""

import importlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer
from perceptor_tpu.models.glide_clip import (
    CONFIGS,
    GlideCLIP,
    GlideImageEncoder,
    GlideTextEncoder,
    convert_glide_image,
    convert_glide_text,
)


def _load_reference_encoders():
    pytest.importorskip("torch")
    pytest.importorskip("attr")
    if "refglide" not in sys.modules:
        pkg = types.ModuleType("refglide")
        pkg.__path__ = ["/root/reference/perceptor/models/glide_clip"]
        sys.modules["refglide"] = pkg
    return importlib.import_module("refglide.encoders")


@pytest.mark.slow
def test_parity_glide_text_encoder():
    import torch

    enc = _load_reference_encoders()
    torch.manual_seed(0)
    cfg = CONFIGS["tiny"]
    torch_model = enc.TextEncoder(
        n_bpe_vocab=cfg.n_vocab, max_text_len=cfg.max_text_len,
        n_embd=cfg.n_embd, n_head=cfg.text_heads, n_xf_blocks=cfg.text_blocks,
        n_head_state=cfg.head_state, device=torch.device("cpu"),
    ).eval()
    params = convert_glide_text(torch_model.state_dict(), cfg)

    torch.manual_seed(1)
    tokens = torch.randint(0, cfg.n_vocab, (2, cfg.max_text_len))
    lens = torch.tensor([5, 12])
    with torch.no_grad():
        expected = torch_model(tokens, lens).numpy()
    module = GlideTextEncoder(cfg, dtype=jnp.float32)
    actual = module.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(tokens.numpy()),
        jnp.asarray(lens.numpy()),
    )
    np.testing.assert_allclose(np.asarray(actual), expected, atol=2e-5)


@pytest.mark.slow
def test_parity_glide_image_encoder():
    import torch

    enc = _load_reference_encoders()
    torch.manual_seed(0)
    cfg = CONFIGS["tiny"]
    torch_model = enc.ImageEncoder(
        image_size=cfg.image_size, patch_size=cfg.patch_size, n_embd=cfg.n_embd,
        n_head=cfg.image_heads, n_xf_blocks=cfg.image_blocks,
        n_head_state=cfg.head_state, n_timestep=cfg.n_timestep,
        device=torch.device("cpu"),
    ).eval()
    params = convert_glide_image(torch_model.state_dict(), cfg)

    torch.manual_seed(1)
    images = torch.rand(2, 3, cfg.image_size, cfg.image_size) * 255
    ts = torch.tensor([3, 7])
    with torch.no_grad():
        expected = torch_model(images, ts).numpy()
    module = GlideImageEncoder(cfg, dtype=jnp.float32)
    actual = module.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(images.numpy()),
        jnp.asarray(ts.numpy()),
    )
    np.testing.assert_allclose(np.asarray(actual), expected, atol=2e-5)


def test_glide_clip_wrapper():
    model = GlideCLIP("tiny", tokenizer=SimpleTokenizer(merges=[]))
    text_encodings = model.encode_texts(["hello world"])
    assert text_encodings.shape == (1, 16)
    diffused = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 32, 32))
    image_encodings = model.encode_images(diffused, jnp.array([3, 7]))
    assert image_encodings.shape == (2, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(image_encodings), axis=-1), 1.0, atol=1e-3
    )
    # gradient flows through the noise-aware encoder
    grads = jax.grad(
        lambda d: model.encode_images_fn(
            model.params, d, jnp.array([3, 7])
        ).sum()
    )(diffused)
    assert bool(jnp.any(grads != 0))
