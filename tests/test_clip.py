import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.models.clip import CLIPConfig, convert
from perceptor_tpu.models.clip.model import CLIP as CLIPModule

TINY = CLIPConfig(
    embed_dim=16,
    image_size=(32, 32),
    patch_size=8,
    vision_width=24,
    vision_layers=2,
    vision_heads=2,
    context_length=12,
    vocab_size=64,
    text_width=20,
    text_layers=2,
    text_heads=2,
    quick_gelu=True,
)


@pytest.fixture(scope="module")
def hf_tiny():
    """Tiny random HF CLIPModel matching TINY (ground truth for parity)."""
    torch = pytest.importorskip("torch")
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel

    hf_config = HFCLIPConfig(
        projection_dim=TINY.embed_dim,
        text_config=dict(
            hidden_size=TINY.text_width,
            intermediate_size=TINY.text_width * 4,
            num_attention_heads=TINY.text_heads,
            num_hidden_layers=TINY.text_layers,
            max_position_embeddings=TINY.context_length,
            vocab_size=TINY.vocab_size,
            hidden_act="quick_gelu",
            eos_token_id=TINY.vocab_size - 1,
        ),
        vision_config=dict(
            hidden_size=TINY.vision_width,
            intermediate_size=TINY.vision_width * 4,
            num_attention_heads=TINY.vision_heads,
            num_hidden_layers=TINY.vision_layers,
            image_size=TINY.image_size[0],
            patch_size=TINY.patch_size,
            hidden_act="quick_gelu",
        ),
    )
    torch.manual_seed(0)
    model = CLIPModel(hf_config).eval()
    return model


def test_vision_parity_with_hf(hf_tiny):
    """Weights-compatible numerics vs transformers CLIP (the reference's own
    parity pattern, transformers_openai_clip.py:155-171)."""
    torch = __import__("torch")

    params = convert.from_hf(hf_tiny.state_dict(), TINY)
    module = CLIPModule(TINY, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    images = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        expected = hf_tiny.get_image_features(
            pixel_values=torch.tensor(images)
        ).numpy()

    got = module.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(images),
        method=CLIPModule.encode_image,
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-5, rtol=1e-4)


def test_text_parity_with_hf(hf_tiny):
    torch = __import__("torch")

    params = convert.from_hf(hf_tiny.state_dict(), TINY)
    module = CLIPModule(TINY, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    # tokens: random ids, eot (= max id) at a random position, zero padding
    tokens = np.zeros((3, TINY.context_length), dtype=np.int64)
    for i in range(3):
        length = rng.integers(3, TINY.context_length)
        tokens[i, :length] = rng.integers(1, TINY.vocab_size - 1, size=length)
        tokens[i, length - 1] = TINY.vocab_size - 1  # eot

    with torch.no_grad():
        expected = hf_tiny.get_text_features(
            input_ids=torch.tensor(tokens),
            attention_mask=torch.ones_like(torch.tensor(tokens)),
        ).numpy()

    got = module.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(tokens.astype(np.int32)),
        method=CLIPModule.encode_text,
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-5, rtol=1e-4)


def test_openclip_state_dict_conversion_roundtrip(hf_tiny):
    """Build an open_clip-layout state dict from the HF one and check both
    converters land on identical params (validates the open_clip mapping)."""
    sd = {k: v for k, v in hf_tiny.state_dict().items()}
    params_hf = convert.from_hf(sd, TINY)

    # construct open_clip-style names from HF values
    oc = {}
    oc["visual.conv1.weight"] = sd["vision_model.embeddings.patch_embedding.weight"]
    oc["visual.class_embedding"] = sd["vision_model.embeddings.class_embedding"]
    oc["visual.positional_embedding"] = sd[
        "vision_model.embeddings.position_embedding.weight"
    ]
    oc["visual.ln_pre.weight"] = sd["vision_model.pre_layrnorm.weight"]
    oc["visual.ln_pre.bias"] = sd["vision_model.pre_layrnorm.bias"]
    oc["visual.ln_post.weight"] = sd["vision_model.post_layernorm.weight"]
    oc["visual.ln_post.bias"] = sd["vision_model.post_layernorm.bias"]
    oc["visual.proj"] = sd["visual_projection.weight"].T
    import torch

    for tower, hf_prefix, layers in [
        ("visual.transformer", "vision_model.encoder.layers", TINY.vision_layers),
        ("transformer", "text_model.encoder.layers", TINY.text_layers),
    ]:
        for i in range(layers):
            src = f"{hf_prefix}.{i}"
            dst = f"{tower}.resblocks.{i}"
            oc[f"{dst}.ln_1.weight"] = sd[f"{src}.layer_norm1.weight"]
            oc[f"{dst}.ln_1.bias"] = sd[f"{src}.layer_norm1.bias"]
            oc[f"{dst}.ln_2.weight"] = sd[f"{src}.layer_norm2.weight"]
            oc[f"{dst}.ln_2.bias"] = sd[f"{src}.layer_norm2.bias"]
            oc[f"{dst}.attn.in_proj_weight"] = torch.cat(
                [
                    sd[f"{src}.self_attn.q_proj.weight"],
                    sd[f"{src}.self_attn.k_proj.weight"],
                    sd[f"{src}.self_attn.v_proj.weight"],
                ]
            )
            oc[f"{dst}.attn.in_proj_bias"] = torch.cat(
                [
                    sd[f"{src}.self_attn.q_proj.bias"],
                    sd[f"{src}.self_attn.k_proj.bias"],
                    sd[f"{src}.self_attn.v_proj.bias"],
                ]
            )
            oc[f"{dst}.attn.out_proj.weight"] = sd[f"{src}.self_attn.out_proj.weight"]
            oc[f"{dst}.attn.out_proj.bias"] = sd[f"{src}.self_attn.out_proj.bias"]
            oc[f"{dst}.mlp.c_fc.weight"] = sd[f"{src}.mlp.fc1.weight"]
            oc[f"{dst}.mlp.c_fc.bias"] = sd[f"{src}.mlp.fc1.bias"]
            oc[f"{dst}.mlp.c_proj.weight"] = sd[f"{src}.mlp.fc2.weight"]
            oc[f"{dst}.mlp.c_proj.bias"] = sd[f"{src}.mlp.fc2.bias"]
    oc["token_embedding.weight"] = sd["text_model.embeddings.token_embedding.weight"]
    oc["positional_embedding"] = sd[
        "text_model.embeddings.position_embedding.weight"
    ]
    oc["ln_final.weight"] = sd["text_model.final_layer_norm.weight"]
    oc["ln_final.bias"] = sd["text_model.final_layer_norm.bias"]
    oc["text_projection"] = sd["text_projection.weight"].T
    oc["logit_scale"] = sd["logit_scale"]

    params_oc = convert.from_openclip(oc, TINY)

    flat_hf = jax.tree_util.tree_leaves_with_path(params_hf)
    flat_oc = dict(jax.tree_util.tree_leaves_with_path(params_oc))
    # identical key sets and values
    assert len(flat_hf) == len(flat_oc)
    for path, value in flat_hf:
        np.testing.assert_allclose(value, flat_oc[path], atol=1e-6)


def test_gradient_flows_through_encode_images():
    """Gradient-flow smoke test (reference models/open_clip.py:143-152)."""
    from perceptor_tpu.models.open_clip import OpenCLIP

    model = OpenCLIP("ViT-B-32", "test", config=TINY)

    def loss(images):
        return jnp.mean(model.encode_images(images))

    images = jnp.ones((1, 3, 64, 64)) * 0.5
    grad = jax.grad(loss)(images)
    assert bool(jnp.any(grad != 0))


def test_spherical_distance_range():
    from perceptor_tpu.models.open_clip import OpenCLIP

    rng = np.random.default_rng(0)
    a = rng.normal(size=(2, 16)).astype(np.float32)
    b = rng.normal(size=(3, 16)).astype(np.float32)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
    d = OpenCLIP.spherical_distance(jnp.asarray(a), jnp.asarray(b))
    assert d.shape == (2, 3)
    assert (np.asarray(d) >= 0).all()
    same = OpenCLIP.spherical_distance(jnp.asarray(a), jnp.asarray(a))
    np.testing.assert_allclose(np.diag(np.asarray(same)), 0.0, atol=1e-5)
