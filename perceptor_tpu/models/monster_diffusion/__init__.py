from perceptor_tpu.models.monster_diffusion.monster_diffusion import MonsterDiffusion
from perceptor_tpu.models.monster_diffusion.net import MonsterUNet, MonsterConfig

__all__ = ["MonsterDiffusion", "MonsterUNet", "MonsterConfig"]
