"""PyTorch CLIP checkpoint -> flax param tree converters.

Two source layouts, one target:
  - open_clip / original OpenAI `state_dict` (packed qkv `attn.in_proj_*`,
    `mlp.c_fc/c_proj`) — the checkpoints the reference wrapper loads
    (reference perceptor/models/open_clip.py:66-73).
  - HF `transformers.CLIPModel` `state_dict` (split q/k/v, `mlp.fc1/fc2`) —
    reference perceptor/models/transformers_openai_clip.py:25.

Checkpoint I/O is host-side numpy; nothing here touches a device.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(value) -> np.ndarray:
    if hasattr(value, "detach"):
        value = value.detach().cpu().float().numpy()
    return np.asarray(value, dtype=np.float32)


def _linear(sd, prefix) -> Dict[str, np.ndarray]:
    return {"kernel": _np(sd[f"{prefix}.weight"]).T, "bias": _np(sd[f"{prefix}.bias"])}


def _layernorm(sd, prefix) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _openclip_block(sd, prefix) -> Dict:
    width = _np(sd[f"{prefix}.ln_1.weight"]).shape[0]
    in_w = _np(sd[f"{prefix}.attn.in_proj_weight"])  # (3W, W)
    in_b = _np(sd[f"{prefix}.attn.in_proj_bias"])  # (3W,)
    qw, kw, vw = np.split(in_w, 3, axis=0)
    qb, kb, vb = np.split(in_b, 3, axis=0)
    assert qw.shape == (width, width)
    return {
        "ln_1": _layernorm(sd, f"{prefix}.ln_1"),
        "ln_2": _layernorm(sd, f"{prefix}.ln_2"),
        "attn": {
            "q_proj": {"kernel": qw.T, "bias": qb},
            "k_proj": {"kernel": kw.T, "bias": kb},
            "v_proj": {"kernel": vw.T, "bias": vb},
            "out_proj": _linear(sd, f"{prefix}.attn.out_proj"),
        },
        "mlp": {
            "fc1": _linear(sd, f"{prefix}.mlp.c_fc"),
            "fc2": _linear(sd, f"{prefix}.mlp.c_proj"),
        },
    }


def _bn(sd, prefix) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }


def _conv_nobias(sd, prefix) -> Dict[str, np.ndarray]:
    return {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}


def _modified_resnet_visual(sd, config) -> Dict:
    """ModifiedResNet visual (visual.conv1-3/bn1-3, visual.layer{1-4}.{i},
    visual.attnpool) -> clip/resnet.py params."""
    visual: Dict = {}
    for i in (1, 2, 3):
        visual[f"conv{i}"] = _conv_nobias(sd, f"visual.conv{i}")
        visual[f"bn{i}"] = _bn(sd, f"visual.bn{i}")
    for stage, count in enumerate(config.vision_layers):
        for i in range(count):
            t = f"visual.layer{stage + 1}.{i}"
            block = {
                "conv1": _conv_nobias(sd, f"{t}.conv1"),
                "bn1": _bn(sd, f"{t}.bn1"),
                "conv2": _conv_nobias(sd, f"{t}.conv2"),
                "bn2": _bn(sd, f"{t}.bn2"),
                "conv3": _conv_nobias(sd, f"{t}.conv3"),
                "bn3": _bn(sd, f"{t}.bn3"),
            }
            # downsample: OrderedDict("-1" avgpool, "0" conv, "1" bn)
            if f"{t}.downsample.0.weight" in sd:
                block["downsample_conv"] = _conv_nobias(sd, f"{t}.downsample.0")
                block["downsample_bn"] = _bn(sd, f"{t}.downsample.1")
            visual[f"layer{stage + 1}_{i}"] = block
    visual["attnpool"] = {
        "positional_embedding": _np(sd["visual.attnpool.positional_embedding"]),
        "q_proj": _linear(sd, "visual.attnpool.q_proj"),
        "k_proj": _linear(sd, "visual.attnpool.k_proj"),
        "v_proj": _linear(sd, "visual.attnpool.v_proj"),
        "c_proj": _linear(sd, "visual.attnpool.c_proj"),
    }
    return visual


def from_openclip(state_dict, config) -> Dict:
    """open_clip / OpenAI CLIP state_dict -> params for models.clip.model.CLIP."""
    sd = state_dict
    if config.is_resnet:
        visual = _modified_resnet_visual(sd, config)
    else:
        visual = {
            "conv1": {"kernel": _np(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0)},
            "class_embedding": _np(sd["visual.class_embedding"]),
            "positional_embedding": _np(sd["visual.positional_embedding"]),
            "ln_pre": _layernorm(sd, "visual.ln_pre"),
            "ln_post": _layernorm(sd, "visual.ln_post"),
            "proj": _np(sd["visual.proj"]),
            "transformer": {
                f"resblocks_{i}": _openclip_block(sd, f"visual.transformer.resblocks.{i}")
                for i in range(config.vision_layers)
            },
        }
    text = {
        "token_embedding": _np(sd["token_embedding.weight"]),
        "positional_embedding": _np(sd["positional_embedding"]),
        "ln_final": _layernorm(sd, "ln_final"),
        "text_projection": _np(sd["text_projection"]),
        "transformer": {
            f"resblocks_{i}": _openclip_block(sd, f"transformer.resblocks.{i}")
            for i in range(config.text_layers)
        },
    }
    return {
        "visual": visual,
        "text": text,
        "logit_scale": _np(sd["logit_scale"]),
    }


def _hf_block(sd, prefix) -> Dict:
    return {
        "ln_1": _layernorm(sd, f"{prefix}.layer_norm1"),
        "ln_2": _layernorm(sd, f"{prefix}.layer_norm2"),
        "attn": {
            "q_proj": _linear(sd, f"{prefix}.self_attn.q_proj"),
            "k_proj": _linear(sd, f"{prefix}.self_attn.k_proj"),
            "v_proj": _linear(sd, f"{prefix}.self_attn.v_proj"),
            "out_proj": _linear(sd, f"{prefix}.self_attn.out_proj"),
        },
        "mlp": {
            "fc1": _linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": _linear(sd, f"{prefix}.mlp.fc2"),
        },
    }


def from_hf(state_dict, config) -> Dict:
    """HF transformers CLIPModel state_dict -> params for models.clip.model.CLIP."""
    sd = state_dict
    visual = {
        "conv1": {
            "kernel": _np(
                sd["vision_model.embeddings.patch_embedding.weight"]
            ).transpose(2, 3, 1, 0)
        },
        "class_embedding": _np(sd["vision_model.embeddings.class_embedding"]),
        "positional_embedding": _np(
            sd["vision_model.embeddings.position_embedding.weight"]
        ),
        # note: HF's actual key spelling is "pre_layrnorm"
        "ln_pre": _layernorm(sd, "vision_model.pre_layrnorm"),
        "ln_post": _layernorm(sd, "vision_model.post_layernorm"),
        "proj": _np(sd["visual_projection.weight"]).T,
        "transformer": {
            f"resblocks_{i}": _hf_block(sd, f"vision_model.encoder.layers.{i}")
            for i in range(config.vision_layers)
        },
    }
    text = {
        "token_embedding": _np(sd["text_model.embeddings.token_embedding.weight"]),
        "positional_embedding": _np(
            sd["text_model.embeddings.position_embedding.weight"]
        ),
        "ln_final": _layernorm(sd, "text_model.final_layer_norm"),
        "text_projection": _np(sd["text_projection.weight"]).T,
        "transformer": {
            f"resblocks_{i}": _hf_block(sd, f"text_model.encoder.layers.{i}")
            for i in range(config.text_layers)
        },
    }
    return {
        "visual": visual,
        "text": text,
        "logit_scale": _np(sd["logit_scale"]),
    }
