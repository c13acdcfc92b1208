from perceptor_tpu.transforms.interface import TransformInterface
from perceptor_tpu.ops.clamp import clamp_with_grad
from perceptor_tpu.ops.resize import resize
from perceptor_tpu.transforms.dynamic_threshold import (
    dynamic_threshold,
    DynamicThreshold,
)
from perceptor_tpu.transforms.clamp import ClampWithGrad
from perceptor_tpu.transforms.cutouts import (
    crop_and_resize,
    random_cutout_boxes,
    random_cutouts,
)
from perceptor_tpu.transforms.resize_transform import Resize

__all__ = [
    "TransformInterface",
    "clamp_with_grad",
    "ClampWithGrad",
    "resize",
    "Resize",
    "crop_and_resize",
    "random_cutout_boxes",
    "random_cutouts",
    "dynamic_threshold",
    "DynamicThreshold",
    "SuperResolution",
]


def __getattr__(name):
    if name == "SuperResolution":
        from perceptor_tpu.transforms.super_resolution import SuperResolution

        globals()[name] = SuperResolution
        return SuperResolution
    raise AttributeError(f"module 'perceptor_tpu.transforms' has no attribute {name!r}")
