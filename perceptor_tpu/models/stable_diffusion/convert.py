"""diffusers/HF Stable Diffusion checkpoints -> flax param trees.

The reference loads weights via `from_pretrained` (reference
stable_diffusion.py:82-97); the TPU equivalent is this host-side
numpy converter from the diffusers state_dict layout onto the module trees
in unet.py / vae.py / text_encoder.py. Conversion rules:

    conv   (O, I, kh, kw) -> (kh, kw, I, O)
    linear (O, I)         -> (I, O)
    norm   weight -> scale

Both pre-0.25 (1x1-conv proj_in/out, query/key/value VAE attention) and
modern (linear proj, to_q/to_k/to_v) diffusers layouts are handled.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from perceptor_tpu.models.clip.convert import _hf_block, _layernorm, _np
from perceptor_tpu.models.stable_diffusion.config import (
    TextConfig,
    UNetConfig,
    VAEConfig,
)


def _conv(sd, prefix) -> Dict[str, np.ndarray]:
    kernel = _np(sd[f"{prefix}.weight"])
    if kernel.ndim == 2:  # linear acting as 1x1 conv
        kernel = kernel[:, :, None, None]
    return {
        "kernel": kernel.transpose(2, 3, 1, 0),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _linear(sd, prefix, bias=True) -> Dict[str, np.ndarray]:
    kernel = _np(sd[f"{prefix}.weight"])
    if kernel.ndim == 4:  # 1x1 conv acting as linear
        kernel = kernel[:, :, 0, 0]
    out = {"kernel": kernel.T}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _norm(sd, prefix) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _conv_or_linear(sd, prefix):
    """proj_in/proj_out: conv in old diffusers, linear in new — my modules
    use 1x1 convs, so promote 2-dim weights."""
    return _conv(sd, prefix)


def _resnet(sd, prefix, time_emb=True) -> Dict:
    out = {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
    }
    if time_emb and f"{prefix}.time_emb_proj.weight" in sd:
        out["time_emb_proj"] = _linear(sd, f"{prefix}.time_emb_proj")
    if f"{prefix}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{prefix}.conv_shortcut")
    elif f"{prefix}.nin_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{prefix}.nin_shortcut")
    return out


def _cross_attention(sd, prefix) -> Dict:
    return {
        "to_q": _linear(sd, f"{prefix}.to_q"),
        "to_k": _linear(sd, f"{prefix}.to_k"),
        "to_v": _linear(sd, f"{prefix}.to_v"),
        "to_out_0": _linear(sd, f"{prefix}.to_out.0"),
    }


def _spatial_transformer(sd, prefix, depth) -> Dict:
    out = {
        "norm": _norm(sd, f"{prefix}.norm"),
        "proj_in": _conv_or_linear(sd, f"{prefix}.proj_in"),
        "proj_out": _conv_or_linear(sd, f"{prefix}.proj_out"),
    }
    for k in range(depth):
        block = f"{prefix}.transformer_blocks.{k}"
        out[f"transformer_blocks_{k}"] = {
            "norm1": _norm(sd, f"{block}.norm1"),
            "norm2": _norm(sd, f"{block}.norm2"),
            "norm3": _norm(sd, f"{block}.norm3"),
            "attn1": _cross_attention(sd, f"{block}.attn1"),
            "attn2": _cross_attention(sd, f"{block}.attn2"),
            "ff": {
                "net_0_proj": _linear(sd, f"{block}.ff.net.0.proj"),
                "net_2": _linear(sd, f"{block}.ff.net.2"),
            },
        }
    return out


def unet_from_diffusers(sd: Dict, cfg: UNetConfig) -> Dict:
    params = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding": {
            "linear_1": _linear(sd, "time_embedding.linear_1"),
            "linear_2": _linear(sd, "time_embedding.linear_2"),
        },
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
        "mid_block_resnets_0": _resnet(sd, "mid_block.resnets.0"),
        "mid_block_resnets_1": _resnet(sd, "mid_block.resnets.1"),
        "mid_block_attentions_0": _spatial_transformer(
            sd, "mid_block.attentions.0", cfg.transformer_depth
        ),
    }
    n_levels = len(cfg.channel_mults)
    for i in range(n_levels):
        for j in range(cfg.n_res_blocks):
            params[f"down_blocks_{i}_resnets_{j}"] = _resnet(
                sd, f"down_blocks.{i}.resnets.{j}"
            )
            if cfg.cross_attention[i]:
                params[f"down_blocks_{i}_attentions_{j}"] = _spatial_transformer(
                    sd, f"down_blocks.{i}.attentions.{j}", cfg.transformer_depth
                )
        if i < n_levels - 1:
            params[f"down_blocks_{i}_downsamplers_0"] = {
                "conv": _conv(sd, f"down_blocks.{i}.downsamplers.0.conv")
            }
    for i in range(n_levels):
        level = n_levels - 1 - i
        for j in range(cfg.n_res_blocks + 1):
            params[f"up_blocks_{i}_resnets_{j}"] = _resnet(
                sd, f"up_blocks.{i}.resnets.{j}"
            )
            if cfg.cross_attention[level]:
                params[f"up_blocks_{i}_attentions_{j}"] = _spatial_transformer(
                    sd, f"up_blocks.{i}.attentions.{j}", cfg.transformer_depth
                )
        if level > 0:
            params[f"up_blocks_{i}_upsamplers_0"] = {
                "conv": _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")
            }
    return params


def _vae_attention(sd, prefix) -> Dict:
    # modern layout: to_q/to_k/to_v/to_out.0 + group_norm; pre-0.16:
    # query/key/value/proj_attn.
    if f"{prefix}.to_q.weight" in sd:
        return {
            "group_norm": _norm(sd, f"{prefix}.group_norm"),
            "to_q": _linear(sd, f"{prefix}.to_q"),
            "to_k": _linear(sd, f"{prefix}.to_k"),
            "to_v": _linear(sd, f"{prefix}.to_v"),
            "to_out_0": _linear(sd, f"{prefix}.to_out.0"),
        }
    return {
        "group_norm": _norm(sd, f"{prefix}.group_norm"),
        "to_q": _linear(sd, f"{prefix}.query"),
        "to_k": _linear(sd, f"{prefix}.key"),
        "to_v": _linear(sd, f"{prefix}.value"),
        "to_out_0": _linear(sd, f"{prefix}.proj_attn"),
    }


def _vae_mid(sd, prefix) -> Dict:
    return {
        "resnets_0": _resnet(sd, f"{prefix}.resnets.0", time_emb=False),
        "resnets_1": _resnet(sd, f"{prefix}.resnets.1", time_emb=False),
        "attentions_0": _vae_attention(sd, f"{prefix}.attentions.0"),
    }


def vae_from_diffusers(sd: Dict, cfg: VAEConfig) -> Dict:
    n_levels = len(cfg.channel_mults)
    encoder = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "mid_block": _vae_mid(sd, "encoder.mid_block"),
        "conv_norm_out": _norm(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
    }
    for i in range(n_levels):
        for j in range(cfg.n_res_blocks):
            encoder[f"down_blocks_{i}_resnets_{j}"] = _resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}", time_emb=False
            )
        if i < n_levels - 1:
            encoder[f"down_blocks_{i}_downsamplers_0_conv"] = _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv"
            )
    decoder = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid_block": _vae_mid(sd, "decoder.mid_block"),
        "conv_norm_out": _norm(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
    }
    for i in range(n_levels):
        for j in range(cfg.n_res_blocks + 1):
            decoder[f"up_blocks_{i}_resnets_{j}"] = _resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}", time_emb=False
            )
        if i < n_levels - 1:
            decoder[f"up_blocks_{i}_upsamplers_0_conv"] = _conv(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv"
            )
    return {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


def text_from_hf(sd: Dict, cfg: TextConfig, prefix: str = "text_model") -> Dict:
    """HF CLIPTextModel state_dict -> params for CLIPTextEncoder."""
    return {
        "token_embedding": _np(sd[f"{prefix}.embeddings.token_embedding.weight"]),
        "positional_embedding": _np(
            sd[f"{prefix}.embeddings.position_embedding.weight"]
        ),
        "ln_final": _layernorm(sd, f"{prefix}.final_layer_norm"),
        "transformer": {
            f"resblocks_{i}": _hf_block(sd, f"{prefix}.encoder.layers.{i}")
            for i in range(cfg.layers)
        },
    }


def _subdict(sd: Dict, prefix: str) -> Dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def from_diffusers(
    sd: Dict, unet_cfg: UNetConfig, vae_cfg: VAEConfig, text_cfg: TextConfig
) -> Dict:
    """Full-pipeline state dict (keys prefixed unet./vae./text_encoder.)
    -> {"unet": ..., "vae": ..., "text_encoder": ...}."""
    return {
        "unet": unet_from_diffusers(_subdict(sd, "unet."), unet_cfg),
        "vae": vae_from_diffusers(_subdict(sd, "vae."), vae_cfg),
        "text_encoder": text_from_hf(_subdict(sd, "text_encoder."), text_cfg),
    }


# -- CompVis (.ckpt) layout ---------------------------------------------------

_COMPVIS_RES = {
    "in_layers.0": "norm1",
    "in_layers.2": "conv1",
    "emb_layers.1": "time_emb_proj",
    "out_layers.0": "norm2",
    "out_layers.3": "conv2",
    "skip_connection": "conv_shortcut",
}


def compvis_to_diffusers_unet(
    state_dict: Dict, cfg: UNetConfig, prefix: str = "model.diffusion_model."
) -> Dict:
    """CompVis/LDM UNet state dict (openaimodel.py layout:
    input_blocks.{i}.{m} / middle_block.{m} / output_blocks.{i}.{m}) ->
    diffusers key names, so `unet_from_diffusers` can consume original
    stable-diffusion .ckpt checkpoints (reference ships the CompVis tree at
    latent_diffusion/ldm/; sd-v1 weights are interchangeable between the
    two layouts)."""
    sd = {
        k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)
    }
    if not sd:
        sd = dict(state_dict)
    out: Dict = {}

    def move(src, dst):
        for suffix in ("weight", "bias"):
            if f"{src}.{suffix}" in sd:
                out[f"{dst}.{suffix}"] = sd[f"{src}.{suffix}"]

    def move_tree(src, dst):
        n = len(src) + 1
        for k, v in sd.items():
            if k.startswith(src + "."):
                out[dst + "." + k[n:]] = v

    def move_res(src, dst):
        for old, new in _COMPVIS_RES.items():
            move(f"{src}.{old}", f"{dst}.{new}")

    move("time_embed.0", "time_embedding.linear_1")
    move("time_embed.2", "time_embedding.linear_2")
    move("input_blocks.0.0", "conv_in")
    move("out.0", "conv_norm_out")
    move("out.2", "conv_out")
    move_res("middle_block.0", "mid_block.resnets.0")
    move_res("middle_block.2", "mid_block.resnets.1")
    move_tree("middle_block.1", "mid_block.attentions.0")

    n_levels = len(cfg.channel_mults)
    r = cfg.n_res_blocks
    for b in range(n_levels):
        for j in range(r):
            i = 1 + b * (r + 1) + j
            move_res(f"input_blocks.{i}.0", f"down_blocks.{b}.resnets.{j}")
            if cfg.cross_attention[b]:
                move_tree(
                    f"input_blocks.{i}.1", f"down_blocks.{b}.attentions.{j}"
                )
        if b < n_levels - 1:
            i = (b + 1) * (r + 1)
            move(f"input_blocks.{i}.0.op", f"down_blocks.{b}.downsamplers.0.conv")
    for b in range(n_levels):
        level = n_levels - 1 - b
        for j in range(r + 1):
            i = b * (r + 1) + j
            move_res(f"output_blocks.{i}.0", f"up_blocks.{b}.resnets.{j}")
            has_attn = cfg.cross_attention[level]
            if has_attn:
                move_tree(
                    f"output_blocks.{i}.1", f"up_blocks.{b}.attentions.{j}"
                )
            if level > 0 and j == r:
                up_idx = 2 if has_attn else 1
                move(
                    f"output_blocks.{i}.{up_idx}.conv",
                    f"up_blocks.{b}.upsamplers.0.conv",
                )
    return out


def unet_from_compvis(state_dict: Dict, cfg: UNetConfig, **kwargs) -> Dict:
    return unet_from_diffusers(
        compvis_to_diffusers_unet(state_dict, cfg, **kwargs), cfg
    )


def from_compvis(
    sd: Dict, unet_cfg: UNetConfig, vae_cfg: VAEConfig, text_cfg: TextConfig
) -> Dict:
    """Original CompVis/.ckpt layout (model.diffusion_model.* +
    first_stage_model.* + cond_stage_model.transformer.*) -> full params."""
    from perceptor_tpu.models.latent_diffusion.first_stage import (
        convert_compvis_autoencoder,
    )

    return {
        "unet": unet_from_compvis(sd, unet_cfg),
        "vae": convert_compvis_autoencoder(sd, vae_cfg),
        "text_encoder": text_from_hf(
            _subdict(sd, "cond_stage_model.transformer."), text_cfg
        ),
    }
