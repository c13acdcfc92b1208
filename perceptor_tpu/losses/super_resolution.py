"""Super-resolution self-consistency loss + UNet-SN discriminator loss.

Rebuild of reference perceptor/losses/super_resolution/super_resolution.py:8-36
(downscale -> ESRGAN upsample (stop-grad) -> MSE against the original) and
discriminator.py:13-30 (-mean logit * 0.001).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.losses.interface import LossInterface
from perceptor_tpu.models.super_resolution import (
    UNetDiscriminatorSN,
    convert_unet_discriminator,
)
from perceptor_tpu.ops.resize import resize
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict


class SuperResolution(LossInterface):
    def __init__(self, name: str = "x2", pre_downscale=None, half: bool = True,
                 mode: str = "bicubic"):
        from perceptor_tpu import transforms

        self.transform = transforms.SuperResolution(name, half)
        self.mode = mode
        self.pre_downscale = (
            self.transform.model.scale if pre_downscale is None else pre_downscale
        )

    def forward(self, images):
        downsampled_size = [s // self.pre_downscale for s in images.shape[-2:]]
        downsampled = resize(images, out_shape=downsampled_size, resample=self.mode)
        upsampled = self.transform.encode(downsampled)
        if upsampled.shape != images.shape:
            upsampled = resize(
                upsampled, out_shape=tuple(images.shape[-2:]), resample=self.mode
            )
        # the SR path is a frozen target (reference wraps it in no_grad)
        upsampled = jax.lax.stop_gradient(upsampled)
        return jnp.square(images - upsampled).mean()


class SuperResolutionDiscriminator(LossInterface):
    def __init__(self, name: str = "RealESRGAN_x4plus_netD"):
        self.name = name
        self.module = UNetDiscriminatorSN()
        path = find_checkpoint(f"super_resolution_discriminator_{name}", name)
        if path is not None:
            self.params = jax.device_put(
                convert_unet_discriminator(load_state_dict(path)), jax.devices()[0]
            )
        else:
            self.params = init_by_shape(
                self.module.init, jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32))
            )["params"]
        self._jit = jax.jit(
            lambda params, images: self.module.apply({"params": params}, images)
        )

    def forward(self, images):
        """-mean discriminator logit (reference discriminator.py:28-30)."""
        return -self._jit(self.params, images).mean() * 0.001
