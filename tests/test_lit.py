"""LiT tests: hermetic tiny wrapper + full-model parity against a
locally-built torch twin (HF ViTModel + BertModel + linear text head
composed exactly as LiT composes them — reference perceptor/losses/lit.py
wraps the pytorch-zero-lit dual encoder)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu import losses, models
from perceptor_tpu.models.latent_diffusion.bert import BERTTokenizer
from perceptor_tpu.models.lit import MODEL_CONFIGS, LiT, convert_lit

_TINY_VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "cat", "photo", "of",
               "##s", "the"]


def _tokenizer():
    return BERTTokenizer(vocab=_TINY_VOCAB, max_length=16)


def test_lit_config_table():
    b = MODEL_CONFIGS["LiT-B16B_2"]
    assert (b.vision_width, b.vision_layers, b.text_width, b.text_layers) == (
        768, 12, 768, 12,
    )
    l = MODEL_CONFIGS["LiT-L16L"]
    assert (l.vision_width, l.vision_layers, l.text_width, l.text_layers) == (
        1024, 24, 1024, 24,
    )
    assert b.max_text_length == 16  # LiT's short text context
    with pytest.raises(ValueError):
        LiT("LiT-nonexistent")


def test_lit_wrapper_and_loss():
    tokenizer = _tokenizer()
    model = models.LiT("tiny", tokenizer=tokenizer)
    assert model.image_size == (32, 32)
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 48, 48))
    image_encodings = model.encode_images(images)
    assert image_encodings.shape == (1, 32)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(image_encodings), axis=-1), 1.0, atol=1e-5
    )
    text_encodings = model.encode_texts(["a photo of a cat", "the cats"])
    assert text_encodings.shape == (2, 32)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(text_encodings), axis=-1), 1.0, atol=1e-5
    )

    loss = losses.LiT("tiny", tokenizer=tokenizer)
    loss.add_texts_(["a cat"]).add_images_(images)
    value = loss.forward(images)
    assert np.isfinite(float(value))
    grads = jax.grad(lambda im: loss.forward(im))(images)
    assert bool(jnp.any(grads != 0))


def test_lit_full_model_parity_vs_torch_twin():
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel, ViTConfig, ViTModel

    cfg = MODEL_CONFIGS["tiny"]
    vit = ViTModel(
        ViTConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=128, image_size=32, patch_size=16,
            hidden_act="gelu", layer_norm_eps=1e-6,
        ),
        add_pooling_layer=False,
    ).eval()
    bert = BertModel(
        BertConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=128,
            max_position_embeddings=512, hidden_act="gelu",
            position_embedding_type="absolute",
        ),
        add_pooling_layer=False,
    ).eval()
    torch.manual_seed(0)
    head = torch.nn.Linear(32, 32).eval()

    # rename the HF ViT state dict into the timm layout convert_lit expects
    vsd = vit.state_dict()
    sd = {
        "image_tower.patch_embed.proj.weight":
            vsd["embeddings.patch_embeddings.projection.weight"],
        "image_tower.patch_embed.proj.bias":
            vsd["embeddings.patch_embeddings.projection.bias"],
        "image_tower.cls_token": vsd["embeddings.cls_token"],
        "image_tower.pos_embed": vsd["embeddings.position_embeddings"],
        "image_tower.norm.weight": vsd["layernorm.weight"],
        "image_tower.norm.bias": vsd["layernorm.bias"],
    }
    for i in range(2):
        p, t = f"encoder.layer.{i}", f"image_tower.blocks.{i}"
        sd[f"{t}.attn.qkv.weight"] = torch.cat(
            [vsd[f"{p}.attention.attention.{n}.weight"] for n in
             ("query", "key", "value")], dim=0)
        sd[f"{t}.attn.qkv.bias"] = torch.cat(
            [vsd[f"{p}.attention.attention.{n}.bias"] for n in
             ("query", "key", "value")], dim=0)
        sd[f"{t}.attn.proj.weight"] = vsd[f"{p}.attention.output.dense.weight"]
        sd[f"{t}.attn.proj.bias"] = vsd[f"{p}.attention.output.dense.bias"]
        sd[f"{t}.norm1.weight"] = vsd[f"{p}.layernorm_before.weight"]
        sd[f"{t}.norm1.bias"] = vsd[f"{p}.layernorm_before.bias"]
        sd[f"{t}.norm2.weight"] = vsd[f"{p}.layernorm_after.weight"]
        sd[f"{t}.norm2.bias"] = vsd[f"{p}.layernorm_after.bias"]
        sd[f"{t}.mlp.fc1.weight"] = vsd[f"{p}.intermediate.dense.weight"]
        sd[f"{t}.mlp.fc1.bias"] = vsd[f"{p}.intermediate.dense.bias"]
        sd[f"{t}.mlp.fc2.weight"] = vsd[f"{p}.output.dense.weight"]
        sd[f"{t}.mlp.fc2.bias"] = vsd[f"{p}.output.dense.bias"]
    sd.update({f"text_tower.{k}": v for k, v in bert.state_dict().items()})
    sd["text_head.weight"] = head.weight.data
    sd["text_head.bias"] = head.bias.data

    params = jax.tree.map(jnp.asarray, convert_lit(sd, cfg))

    tokenizer = _tokenizer()
    model = LiT.__wrapped__("tiny", tokenizer=tokenizer)  # bypass the memo
    model.params = params
    model._jit_text = jax.jit(model._encode_tokens)
    model._jit_image = jax.jit(model.encode_images_fn)
    # fp32 towers for the numeric comparison
    model.visual = type(model.visual)(
        cfg.vision_width, cfg.vision_layers, cfg.vision_heads, cfg.patch_size,
        dtype=jnp.float32,
    )
    model.text = type(model.text)(cfg, dtype=jnp.float32)

    torch.manual_seed(1)
    x = torch.rand(2, 3, 32, 32)
    tokens = tokenizer(["a photo of a cat", "the cats"])
    mask = (tokens != tokenizer.pad).astype("int64")
    with torch.no_grad():
        img_feat = vit(pixel_values=x * 2 - 1).last_hidden_state[:, 0]
        expected_img = torch.nn.functional.normalize(img_feat, dim=-1).numpy()
        txt_cls = bert(
            input_ids=torch.as_tensor(tokens, dtype=torch.long),
            attention_mask=torch.as_tensor(mask),
        ).last_hidden_state[:, 0]
        expected_txt = torch.nn.functional.normalize(head(txt_cls), dim=-1).numpy()

    actual_img = model.encode_images(jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(actual_img), expected_img, atol=2e-5)
    actual_txt = model.encode_texts(["a photo of a cat", "the cats"])
    np.testing.assert_allclose(np.asarray(actual_txt), expected_txt, atol=2e-5)
