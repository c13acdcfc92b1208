from perceptor_tpu.models.stable_diffusion.stable_diffusion import (
    Conditioning,
    StableDiffusion,
)
from perceptor_tpu.models.stable_diffusion.unet import UNet
from perceptor_tpu.models.stable_diffusion.vae import AutoencoderKL
from perceptor_tpu.models.stable_diffusion.text_encoder import CLIPTextEncoder
from perceptor_tpu.models.stable_diffusion import config

__all__ = [
    "Conditioning",
    "StableDiffusion",
    "UNet",
    "AutoencoderKL",
    "CLIPTextEncoder",
    "config",
]
