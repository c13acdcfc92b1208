from perceptor_tpu.models.velocity_diffusion.velocity_diffusion import (
    VelocityDiffusion,
)
from perceptor_tpu.models.velocity_diffusion.net import VDiffusionUNet
from perceptor_tpu.models.velocity_diffusion import configs

__all__ = ["VelocityDiffusion", "VDiffusionUNet", "configs"]
