from perceptor_tpu.utils.cache import cache
from perceptor_tpu.utils.pil_image import pil_image
from perceptor_tpu.utils.gradients import (
    nonzero_mean,
    nonzero_scale,
    combine_gradients,
)

__all__ = [
    "cache",
    "pil_image",
    "nonzero_mean",
    "nonzero_scale",
    "combine_gradients",
]
