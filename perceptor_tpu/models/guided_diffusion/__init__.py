from perceptor_tpu.models.guided_diffusion.guided_diffusion import GuidedDiffusion
from perceptor_tpu.models.guided_diffusion.unet import ADMUNet
from perceptor_tpu.models.guided_diffusion import config

__all__ = ["GuidedDiffusion", "ADMUNet", "config"]
