"""BLIP tests: hermetic tiny wrapper + parity of the two towers against
locally-built HF transformers models (BertModel / ViTModel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu import losses
from perceptor_tpu.models.blip import (
    BLIP,
    BertTextEncoder,
    BLIPConfig,
    convert_blip,
)
from perceptor_tpu.models.latent_diffusion.bert import BERTTokenizer
from perceptor_tpu.models.slip import TimmViT

_TINY_VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "cat", "photo", "of",
               "##s", "the"]


@pytest.mark.slow
def test_parity_bert_text_tower_vs_hf():
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    cfg = BLIPConfig(
        text_width=32, text_layers=2, text_heads=2, vocab_size=64,
        max_text_length=16,
    )
    hf = BertModel(
        BertConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=128,
            max_position_embeddings=512, hidden_act="gelu",
            position_embedding_type="absolute",
        ),
        add_pooling_layer=False,
    ).eval()
    sd = {f"text_encoder.{k}": v for k, v in hf.state_dict().items()}
    # token_type embeddings: BLIP text mode uses type 0 everywhere; fold the
    # type-0 row into the word embeddings for comparison
    tt = sd.pop("text_encoder.embeddings.token_type_embeddings.weight")
    sd["text_encoder.embeddings.word_embeddings.weight"] = (
        sd["text_encoder.embeddings.word_embeddings.weight"] + tt[0]
    )
    # add dummy pieces convert_blip requires for the visual tower
    params_text_only = convert_blip(
        {**sd,
         **_dummy_visual_sd(torch),
         "vision_proj.weight": torch.zeros(16, 32),
         "vision_proj.bias": torch.zeros(16),
         "text_proj.weight": torch.zeros(16, 32),
         "text_proj.bias": torch.zeros(16)},
        BLIPConfig(
            image_size=32, patch_size=16, vision_width=32, vision_layers=2,
            vision_heads=2, embed_dim=16, text_width=32, text_layers=2,
            text_heads=2, vocab_size=64, max_text_length=16,
        ),
    )["text"]

    torch.manual_seed(0)
    tokens = torch.randint(0, 64, (2, 16))
    mask = torch.ones(2, 16, dtype=torch.long)
    mask[0, 10:] = 0
    with torch.no_grad():
        expected = hf(
            input_ids=tokens, attention_mask=mask
        ).last_hidden_state.numpy()

    module = BertTextEncoder(cfg, dtype=jnp.float32)
    actual = module.apply(
        {"params": jax.tree.map(jnp.asarray, params_text_only)},
        jnp.asarray(tokens.numpy()),
        jnp.asarray(mask.numpy()),
    )
    np.testing.assert_allclose(np.asarray(actual), expected, atol=2e-5)


def _dummy_visual_sd(torch):
    """Minimal timm-named visual tower state dict for convert_blip."""
    sd = {
        "visual_encoder.patch_embed.proj.weight": torch.zeros(32, 3, 16, 16),
        "visual_encoder.patch_embed.proj.bias": torch.zeros(32),
        "visual_encoder.cls_token": torch.zeros(1, 1, 32),
        "visual_encoder.pos_embed": torch.zeros(1, 5, 32),
        "visual_encoder.norm.weight": torch.ones(32),
        "visual_encoder.norm.bias": torch.zeros(32),
    }
    for i in range(2):
        p = f"visual_encoder.blocks.{i}"
        sd.update({
            f"{p}.norm1.weight": torch.ones(32), f"{p}.norm1.bias": torch.zeros(32),
            f"{p}.norm2.weight": torch.ones(32), f"{p}.norm2.bias": torch.zeros(32),
            f"{p}.attn.qkv.weight": torch.zeros(96, 32),
            f"{p}.attn.qkv.bias": torch.zeros(96),
            f"{p}.attn.proj.weight": torch.zeros(32, 32),
            f"{p}.attn.proj.bias": torch.zeros(32),
            f"{p}.mlp.fc1.weight": torch.zeros(128, 32),
            f"{p}.mlp.fc1.bias": torch.zeros(128),
            f"{p}.mlp.fc2.weight": torch.zeros(32, 128),
            f"{p}.mlp.fc2.bias": torch.zeros(32),
        })
    return sd


@pytest.mark.slow
def test_parity_timm_vit_vs_hf():
    torch = pytest.importorskip("torch")
    from transformers import ViTConfig, ViTModel

    hf = ViTModel(
        ViTConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=128, image_size=32, patch_size=16,
            hidden_act="gelu", layer_norm_eps=1e-6,
        ),
        add_pooling_layer=False,
    ).eval()
    sd = hf.state_dict()

    params = {
        "patch_embed": {
            "kernel": sd["embeddings.patch_embeddings.projection.weight"]
            .numpy().transpose(2, 3, 1, 0),
            "bias": sd["embeddings.patch_embeddings.projection.bias"].numpy(),
        },
        "cls_token": sd["embeddings.cls_token"].numpy(),
        "pos_embed": sd["embeddings.position_embeddings"].numpy(),
        "norm": {"scale": sd["layernorm.weight"].numpy(),
                 "bias": sd["layernorm.bias"].numpy()},
    }
    for i in range(2):
        p = f"encoder.layer.{i}"
        qkv_w = np.concatenate([
            sd[f"{p}.attention.attention.{n}.weight"].numpy() for n in
            ("query", "key", "value")
        ], axis=0)
        qkv_b = np.concatenate([
            sd[f"{p}.attention.attention.{n}.bias"].numpy() for n in
            ("query", "key", "value")
        ], axis=0)
        params[f"qkv_{i}"] = {"kernel": qkv_w.T, "bias": qkv_b}
        params[f"attn_proj_{i}"] = {
            "kernel": sd[f"{p}.attention.output.dense.weight"].numpy().T,
            "bias": sd[f"{p}.attention.output.dense.bias"].numpy(),
        }
        params[f"norm1_{i}"] = {
            "scale": sd[f"{p}.layernorm_before.weight"].numpy(),
            "bias": sd[f"{p}.layernorm_before.bias"].numpy(),
        }
        params[f"norm2_{i}"] = {
            "scale": sd[f"{p}.layernorm_after.weight"].numpy(),
            "bias": sd[f"{p}.layernorm_after.bias"].numpy(),
        }
        params[f"fc1_{i}"] = {
            "kernel": sd[f"{p}.intermediate.dense.weight"].numpy().T,
            "bias": sd[f"{p}.intermediate.dense.bias"].numpy(),
        }
        params[f"fc2_{i}"] = {
            "kernel": sd[f"{p}.output.dense.weight"].numpy().T,
            "bias": sd[f"{p}.output.dense.bias"].numpy(),
        }

    torch.manual_seed(0)
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = hf(pixel_values=x).last_hidden_state[:, 0].numpy()

    module = TimmViT(32, 2, 2, 16, dtype=jnp.float32)
    actual = module.apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x.numpy())
    )
    np.testing.assert_allclose(np.asarray(actual), expected, atol=2e-5)


def test_blip_wrapper_and_loss():
    tokenizer = BERTTokenizer(vocab=_TINY_VOCAB, max_length=16)
    model = BLIP("tiny", tokenizer=tokenizer)
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 48, 48))
    image_encodings = model.encode_images(images)
    assert image_encodings.shape == (1, 16)
    text_encodings = model.encode_texts(["a photo of a cat"])
    assert text_encodings.shape == (1, 16)
    distances = model.image_text_contrastive_spherical_distance(
        image_encodings, text_encodings
    )
    assert distances.shape == (1, 1)

    loss = losses.BLIP("tiny", tokenizer=tokenizer)
    loss.add_texts_(["a cat"])
    value = loss.forward(images)
    assert np.isfinite(float(value))
    grads = jax.grad(lambda im: loss.forward(im))(images)
    assert bool(jnp.any(grads != 0))
