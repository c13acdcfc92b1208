"""ruDALL-E Gumbel-VQGAN drawer.

Functional spec: reference perceptor/drawers/rudalle/ —
brute_rudalle.py:7-23 (parameterize the continuous `quant` latent, decode
through the frozen VAE), model.py:14-107 (GumbelVQ: taming Encoder with
attention at 32px, GumbelQuantize soft one-hot -> codebook matmul,
Decoder), decoder_dwt.py:10-54 (DWT variant decoding 12 wavelet channels
+ inverse Haar/db1 DWT, backed by the vendored pytorch_wavelets SFB2D),
config vqgan.gumbelf8-sber.config.yml (ch 128, mult (1,1,2,4), z 256,
embed 256, n_embed 8192, attn at 32px).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from perceptor_tpu import utils
from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.drawers.interface import DrawingInterface
from perceptor_tpu.models.latent_diffusion.first_stage import (
    convert_compvis_autoencoder,
)
from perceptor_tpu.models.stable_diffusion.config import VAEConfig
from perceptor_tpu.models.stable_diffusion.vae import Decoder, Encoder
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict

# vqgan.gumbelf8-sber: mult (1,1,2,4) at 256px -> attn where res==32 is
# encoder level 3 / decoder innermost level 0
GUMBEL_F8 = VAEConfig(
    latent_channels=256,  # z_channels
    channel_mults=(1, 1, 2, 4),
    double_z=False,
    scaling_factor=1.0,
    encoder_attn_levels=(3,),
    decoder_attn_levels=(0,),
)
TINY_GUMBEL = VAEConfig(
    latent_channels=16,
    base_channels=8,
    channel_mults=(1, 2),
    n_res_blocks=1,
    double_z=False,
    scaling_factor=1.0,
)

EMBED_DIM = 256
N_EMBED = 8192


def haar_idwt(low: jax.Array, high: jax.Array) -> jax.Array:
    """Inverse single-level 2D Haar (db1) DWT, zero-padding mode.

    low (N, C, H, W), high (N, C, 3, H, W) with bands ordered (LH, HL, HH)
    per pytorch_wavelets convention -> (N, C, 2H, 2W).
    """
    ll = low
    lh, hl, hh = high[:, :, 0], high[:, :, 1], high[:, :, 2]
    # db1 synthesis: each output 2x2 block is an orthonormal combination
    a = (ll + lh + hl + hh) / 2.0
    b = (ll - lh + hl - hh) / 2.0
    c = (ll + lh - hl - hh) / 2.0
    d = (ll - lh - hl + hh) / 2.0
    n, ch, h, w = ll.shape
    # block layout [[a, c], [b, d]]: a=top-left, b=bottom-left, c=top-right
    out = jnp.stack([a, c, b, d], axis=-1).reshape(n, ch, h, w, 2, 2)
    return out.transpose(0, 1, 2, 4, 3, 5).reshape(n, ch, h * 2, w * 2)


def haar_dwt(x: jax.Array):
    """Forward single-level Haar DWT (used for round-trip testing)."""
    n, c, h, w = x.shape
    blocks = x.reshape(n, c, h // 2, 2, w // 2, 2).transpose(0, 1, 2, 4, 3, 5)
    a = blocks[..., 0, 0]
    b = blocks[..., 1, 0]
    c_ = blocks[..., 0, 1]
    d = blocks[..., 1, 1]
    ll = (a + b + c_ + d) / 2.0
    lh = (a - b + c_ - d) / 2.0
    hl = (a + b - c_ - d) / 2.0
    hh = (a - b - c_ + d) / 2.0
    return ll, jnp.stack([lh, hl, hh], axis=2)


class GumbelVQGAN(nn.Module):
    """Gumbel VQGAN (encode stochastic via gumbel softmax; decode hard)."""

    config: VAEConfig
    embed_dim: int = EMBED_DIM
    n_embed: int = N_EMBED
    dwt: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        import dataclasses as dc

        cfg = self.config
        self.encoder = Encoder(cfg, dtype=self.dtype)
        decoder_cfg = dc.replace(cfg, in_channels=12 if self.dwt else 3)
        self.decoder = Decoder(decoder_cfg, dtype=self.dtype)
        self.quant_conv = nn.Conv(self.embed_dim, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(
            cfg.latent_channels, (1, 1), name="post_quant_conv"
        )
        self.proj = nn.Conv(self.n_embed, (1, 1), name="proj")
        self.embed = self.param(
            "embed", nn.initializers.normal(1.0), (self.n_embed, self.embed_dim)
        )

    def encode(self, xs, key=None, temperature: float = 1.0):
        """xs [-1,1] -> quantized latents (model.py GumbelVQ.encode: hard
        gumbel-softmax over codebook logits). Deterministic argmax when
        key is None."""
        h = self.encoder(xs.transpose(0, 2, 3, 1).astype(self.dtype))
        h = self.quant_conv(h)
        logits = self.proj(h)  # (N, H, W, n_embed)
        if key is not None:
            gumbel = -jnp.log(
                -jnp.log(jax.random.uniform(key, logits.shape) + 1e-20) + 1e-20
            )
            logits = logits + gumbel
        indices = jnp.argmax(logits / temperature, axis=-1)
        soft = jax.nn.softmax(logits / temperature, axis=-1)
        hard = jax.nn.one_hot(indices, self.n_embed, dtype=soft.dtype)
        one_hot = soft + jax.lax.stop_gradient(hard - soft)  # straight-through
        quant = one_hot @ self.embed.astype(one_hot.dtype)
        return quant.transpose(0, 3, 1, 2).astype(jnp.float32)

    def __call__(self, xs, key=None):
        return self.decode(self.encode(xs, key))

    def decode(self, quant):
        """quant (N, embed_dim, h, w) -> images in [0,1]
        (model.py GumbelVQ.decode + drawer's [0,1] convention)."""
        h = self.post_quant_conv(quant.transpose(0, 2, 3, 1).astype(self.dtype))
        dec = self.decoder(h).transpose(0, 3, 1, 2).astype(jnp.float32)
        if self.dwt:
            n, c, hh, ww = dec.shape
            low = dec[:, :3]
            high = dec[:, 3:].reshape(n, 3, 3, hh, ww)
            dec = haar_idwt(low, high)
        return (jnp.clip(dec, -1.0, 1.0) + 1.0) / 2.0


def convert_gumbel_vqgan(state_dict: Dict, cfg: VAEConfig) -> Dict:
    """taming GumbelVQ checkpoint -> flax params."""
    from perceptor_tpu.models.clip.convert import _np

    sd = {k: v for k, v in state_dict.items()}
    base = convert_compvis_autoencoder(sd, cfg, prefix="")
    params = {
        "encoder": base["encoder"],
        "decoder": base["decoder"],
        "quant_conv": base["quant_conv"],
        "post_quant_conv": base["post_quant_conv"],
        "proj": {
            "kernel": _np(sd["quantize.proj.weight"])[:, :, 0, 0].T[None, None],
            "bias": _np(sd["quantize.proj.bias"]),
        },
        "embed": _np(sd["quantize.embed.weight"]),
    }
    # fix proj kernel: conv 1x1 (O, I, 1, 1) -> (1, 1, I, O)
    kernel = _np(sd["quantize.proj.weight"])
    params["proj"]["kernel"] = kernel.transpose(2, 3, 1, 0)
    return params


class BruteRuDalle(DrawingInterface):
    """(reference brute_rudalle.py:7-23)."""

    def __init__(self, init_images, dwt: bool = False, tiny: bool = False,
                 key=None):
        cfg = TINY_GUMBEL if tiny else GUMBEL_F8
        self.module = GumbelVQGAN(
            cfg,
            embed_dim=16 if tiny else EMBED_DIM,
            n_embed=64 if tiny else N_EMBED,
            dwt=dwt,
            dtype=jnp.bfloat16,
        )
        name = "vqgan.gumbelf8-sber-dwt" if dwt else "vqgan.gumbelf8-sber"
        path = None if tiny else find_checkpoint(name, f"rudalle_{name}")
        if path is not None:
            state = load_state_dict(path)
            state = state.get("state_dict", state)
            # dwt checkpoints prefix with "model."
            state = {
                (k[len("model."):] if k.startswith("model.") else k): v
                for k, v in state.items()
            }
            self.model_params = jax.device_put(
                convert_gumbel_vqgan(state, cfg), jax.devices()[0]
            )
        else:
            size = 32
            self.model_params = init_by_shape(
                self.module.init,
                jax.random.PRNGKey(0),
                jnp.zeros((1, 3, size, size)),
            )["params"]
        self._jit_decode = jax.jit(
            lambda params, quant: self.module.apply(
                {"params": params}, quant, method=GumbelVQGAN.decode
            )
        )
        self._jit_encode = jax.jit(
            lambda params, xs: self.module.apply(
                {"params": params}, xs, method=GumbelVQGAN.encode
            )
        )
        self.params = self.encode(jnp.asarray(init_images, dtype=jnp.float32))

    def synthesize(self, params=None):
        params = params if params is not None else self.params
        return self.decode(params)

    def synthesize_fn(self, model_params, params):
        """Pure synthesize: VQGAN weights as an argument (engine-safe)."""
        return self.module.apply(
            {"params": model_params}, params, method=GumbelVQGAN.decode
        )

    def encode(self, images):
        """images [0,1] -> quantized latents (reference :18-20)."""
        return self._jit_encode(self.model_params, images * 2.0 - 1.0)

    def decode(self, latent):
        """latents -> images [0,1] (reference :22-23)."""
        return self._jit_decode(self.model_params, latent)
