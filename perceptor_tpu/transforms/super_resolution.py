"""SuperResolution transform: encode = ESRGAN upsample, decode = resize down
(reference perceptor/transforms/super_resolution.py:9-26)."""

from __future__ import annotations

from perceptor_tpu.transforms.interface import TransformInterface
from perceptor_tpu.ops.resize import resize


class SuperResolution(TransformInterface):
    def __init__(self, name: str = "x4", half: bool = True):
        from perceptor_tpu import models

        self.name = name
        self.model = models.SuperResolution(name, half)

    def encode(self, images):
        return self.model.upsample(images)

    def decode(self, upsampled_images, size=None):
        if size is None:
            size = [s // self.model.scale for s in upsampled_images.shape[-2:]]
        return resize(upsampled_images, out_shape=size)
