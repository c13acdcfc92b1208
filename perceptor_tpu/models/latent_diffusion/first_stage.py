"""LDM first stages: VQ autoencoder + CompVis-layout weight converter.

Functional spec: reference perceptor/models/latent_diffusion/ldm/models/autoencoder.py
(VQModelInterface :325: encode without quantization, decode optionally
quantizes first) with the vector quantizer from taming-transformers, and
the CompVis Encoder/Decoder backbone
(ldm/modules/diffusionmodules/model.py) shared with the KL stage — the
same architecture as models/stable_diffusion/vae.py, so those modules are
reused; only the checkpoint naming differs (CompVis `encoder.down.{i}.
block.{j}` vs diffusers `encoder.down_blocks.{i}.resnets.{j}`), handled by
`convert_compvis_autoencoder`.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from perceptor_tpu.models.stable_diffusion.config import VAEConfig
from perceptor_tpu.models.stable_diffusion.vae import Decoder, Encoder

VQ_F4 = VAEConfig(
    latent_channels=3,
    channel_mults=(1, 2, 4),
    double_z=False,
    scaling_factor=1.0,
)
KL_F8 = VAEConfig(scaling_factor=1.0)  # LDM txt2img applies 0.18215 outside

TINY_VQ = VAEConfig(
    latent_channels=3,
    base_channels=16,
    channel_mults=(1, 2),
    n_res_blocks=1,
    double_z=False,
    scaling_factor=1.0,
)


class VectorQuantizer(nn.Module):
    """Nearest-codebook quantization with straight-through gradients
    (taming-transformers VectorQuantizer2 inference semantics)."""

    n_embed: int
    embed_dim: int

    @nn.compact
    def __call__(self, z):
        """z (N, C, H, W) -> quantized (N, C, H, W)."""
        codebook = self.param(
            "embedding",
            nn.initializers.uniform(scale=2.0 / self.n_embed),
            (self.n_embed, self.embed_dim),
        )
        flat = z.transpose(0, 2, 3, 1).reshape(-1, self.embed_dim)
        distances = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2 * flat @ codebook.T
            + jnp.sum(codebook**2, axis=1)[None]
        )
        indices = jnp.argmin(distances, axis=1)
        quantized = codebook[indices].reshape(
            z.shape[0], z.shape[2], z.shape[3], self.embed_dim
        ).transpose(0, 3, 1, 2)
        # straight-through estimator
        return z + jax.lax.stop_gradient(quantized - z)


class VQModel(nn.Module):
    """VQ autoencoder; boundary NCHW, images in [-1,1] x-space (LDM keeps
    first-stage IO in x-space; wrappers handle [0,1] conversion)."""

    config: VAEConfig
    n_embed: int = 8192
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(self.config.latent_channels, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(
            self.config.latent_channels, (1, 1), name="post_quant_conv"
        )
        self.quantize = VectorQuantizer(self.n_embed, self.config.latent_channels)

    def encode(self, xs):
        """xs (N,3,H,W) in [-1,1] -> continuous latents (VQModelInterface
        encode skips quantization, autoencoder.py:325-336)."""
        h = self.encoder(xs.transpose(0, 2, 3, 1).astype(self.dtype))
        h = self.quant_conv(h)
        return h.transpose(0, 3, 1, 2).astype(jnp.float32)

    def decode(self, latents, force_not_quantize: bool = False):
        """latents -> xs in [-1,1]; quantizes first unless forced
        (autoencoder.py:338-346)."""
        if not force_not_quantize:
            latents = self.quantize(latents)
        h = self.post_quant_conv(latents.transpose(0, 2, 3, 1).astype(self.dtype))
        return self.decoder(h).transpose(0, 3, 1, 2).astype(jnp.float32)

    def __call__(self, xs):
        return self.decode(self.encode(xs))


def convert_compvis_autoencoder(
    state_dict: Dict, cfg: VAEConfig, prefix: str = "first_stage_model."
) -> Dict:
    """CompVis autoencoder state_dict -> params for Encoder/Decoder/VQModel.

    CompVis naming: encoder.down.{i}.block.{j}.{norm1,conv1,norm2,conv2,
    nin_shortcut}, encoder.down.{i}.downsample.conv, encoder.mid.
    {block_1,attn_1,block_2}, encoder.norm_out, encoder.conv_out; decoder
    mirrors with up.{i} indexed in REVERSE level order (model.py Decoder).
    """
    from perceptor_tpu.models.clip.convert import _np

    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}

    def conv(name):
        return {
            "kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[f"{name}.bias"]),
        }

    def norm(name):
        return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}

    def resnet(name):
        out = {
            "norm1": norm(f"{name}.norm1"),
            "conv1": conv(f"{name}.conv1"),
            "norm2": norm(f"{name}.norm2"),
            "conv2": conv(f"{name}.conv2"),
        }
        if f"{name}.nin_shortcut.weight" in sd:
            out["conv_shortcut"] = conv(f"{name}.nin_shortcut")
        return out

    def attn(name):
        def proj(sub):
            kernel = _np(sd[f"{name}.{sub}.weight"])  # (C, C, 1, 1) conv
            return {"kernel": kernel[:, :, 0, 0].T, "bias": _np(sd[f"{name}.{sub}.bias"])}

        return {
            "group_norm": norm(f"{name}.norm"),
            "to_q": proj("q"),
            "to_k": proj("k"),
            "to_v": proj("v"),
            "to_out_0": proj("proj_out"),
        }

    def mid(name):
        out = {
            "resnets_0": resnet(f"{name}.block_1"),
            "resnets_1": resnet(f"{name}.block_2"),
        }
        if cfg.mid_attention:
            out["attentions_0"] = attn(f"{name}.attn_1")
        return out

    n_levels = len(cfg.channel_mults)
    encoder = {
        "conv_in": conv("encoder.conv_in"),
        "mid_block": mid("encoder.mid"),
        "conv_norm_out": norm("encoder.norm_out"),
        "conv_out": conv("encoder.conv_out"),
    }
    for i in range(n_levels):
        for j in range(cfg.n_res_blocks):
            encoder[f"down_blocks_{i}_resnets_{j}"] = resnet(
                f"encoder.down.{i}.block.{j}"
            )
            if f"encoder.down.{i}.attn.{j}.q.weight" in sd:
                encoder[f"down_blocks_{i}_attentions_{j}"] = attn(
                    f"encoder.down.{i}.attn.{j}"
                )
        if i < n_levels - 1:
            encoder[f"down_blocks_{i}_downsamplers_0_conv"] = conv(
                f"encoder.down.{i}.downsample.conv"
            )
    decoder = {
        "conv_in": conv("decoder.conv_in"),
        "mid_block": mid("decoder.mid"),
        "conv_norm_out": norm("decoder.norm_out"),
        "conv_out": conv("decoder.conv_out"),
    }
    # CompVis decoder.up is indexed by level (0 = outermost); our up_blocks_{i}
    # run innermost-first, so up_blocks_{i} == decoder.up.{n_levels-1-i}
    for i in range(n_levels):
        compvis_level = n_levels - 1 - i
        for j in range(cfg.n_res_blocks + 1):
            decoder[f"up_blocks_{i}_resnets_{j}"] = resnet(
                f"decoder.up.{compvis_level}.block.{j}"
            )
            if f"decoder.up.{compvis_level}.attn.{j}.q.weight" in sd:
                decoder[f"up_blocks_{i}_attentions_{j}"] = attn(
                    f"decoder.up.{compvis_level}.attn.{j}"
                )
        if i < n_levels - 1:
            decoder[f"up_blocks_{i}_upsamplers_0_conv"] = conv(
                f"decoder.up.{compvis_level}.upsample.conv"
            )
    params = {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": conv("quant_conv"),
        "post_quant_conv": conv("post_quant_conv"),
    }
    if "quantize.embedding.weight" in sd:
        params["quantize"] = {"embedding": _np(sd["quantize.embedding.weight"])}
    return params
