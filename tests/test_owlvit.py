"""OWL-ViT tests: HF full-model parity + hermetic tiny wrapper/loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu import losses
from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer
from perceptor_tpu.models.owlvit import (
    OWLViT,
    OWLViTConfig,
    OWLViTDetection,
    convert_owlvit,
)


@pytest.mark.slow
def test_parity_owlvit_vs_hf():
    torch = pytest.importorskip("torch")
    from transformers import OwlViTConfig as HFConfig
    from transformers import OwlViTForObjectDetection

    hf_config = HFConfig(
        text_config=dict(
            vocab_size=64, hidden_size=32, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=8, hidden_act="quick_gelu",
        ),
        vision_config=dict(
            hidden_size=32, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=2, image_size=64, patch_size=32,
            hidden_act="quick_gelu",
        ),
        projection_dim=32,
    )
    torch.manual_seed(0)
    hf = OwlViTForObjectDetection(hf_config).eval()

    cfg = OWLViTConfig(
        image_size=64, patch_size=32, vision_width=32, vision_layers=2,
        vision_heads=2, text_width=32, text_heads=2, text_layers=2,
        vocab_size=64, context_length=8, embed_dim=32,
    )
    params = convert_owlvit(hf.state_dict(), cfg)

    torch.manual_seed(1)
    pixel_values = torch.randn(1, 3, 64, 64)  # HF ties query rows to batch
    input_ids = torch.randint(1, 63, (3, 8))
    input_ids[:, -1] = 63  # EOT = max id (argmax pooling)
    attention_mask = torch.ones_like(input_ids)
    with torch.no_grad():
        out = hf(
            pixel_values=pixel_values, input_ids=input_ids,
            attention_mask=attention_mask,
        )
    module = OWLViTDetection(cfg, dtype=jnp.float32)
    logits, boxes = module.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(pixel_values.numpy()),
        jnp.asarray(input_ids.numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(logits), out.logits.numpy(), atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(boxes), out.pred_boxes.numpy(), atol=3e-5
    )


def test_owlvit_wrapper_and_loss():
    tokenizer = SimpleTokenizer(merges=[])
    model = OWLViT("tiny", tokenizer=tokenizer)
    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 48, 48))
    encodings = model.encode_texts([["hello", "world"]])
    predictions = model(images, encodings)
    n_patches = (64 // 32) ** 2
    assert predictions.logits.shape == (2, n_patches, 2)
    assert predictions.boxes.shape == (2, n_patches, 4)
    assert predictions.scores.shape == (2, n_patches)

    loss = losses.OWLViT(name="tiny", tokenizer=tokenizer)
    loss.add_texts_(["hello", "world"])
    value = loss.forward(images, top_k=2)
    assert np.isfinite(float(value))
    grads = jax.grad(lambda im: loss.forward(im, top_k=2))(images)
    assert bool(jnp.any(grads != 0))


def test_owlvit_single_encoding_bank():
    tokenizer = SimpleTokenizer(merges=[])
    loss = losses.OWLViT(name="tiny", tokenizer=tokenizer)
    loss.add_texts_(["hello"])
    with pytest.raises(ValueError):
        loss.add_texts_(["again"])
