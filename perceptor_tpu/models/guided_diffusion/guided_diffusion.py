"""GuidedDiffusion wrapper ("standard" 512px / "pixelart" 256px).

Rebuild of reference perceptor/models/guided_diffusion/guided_diffusion.py:14-155:
linear-beta schedule tables, Karras-snapped `schedule_indices` (:58-96),
`predictions()` -> IndexedEpsPredictions taking UNet output [:, :3]
(learn_sigma heads dropped, :135-146), `diffuse_images` (:148-155).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from perceptor_tpu import utils
from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.models.guided_diffusion import config as adm_config
from perceptor_tpu.models.guided_diffusion.unet import ADMUNet
from perceptor_tpu.predictions import IndexedEpsPredictions, diffusion_space
from perceptor_tpu.schedules import indexed_schedule, linear_alphas_sigmas
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict


@utils.cache
class GuidedDiffusion:
    def __init__(self, name: str = "standard", fp16: bool = True, remat: bool = False):
        """Args mirror reference guided_diffusion.py:15-39; names:
        standard (512px ImageNet finetune), pixelart (PADexpanded)."""
        if name not in adm_config.MODEL_CONFIGS:
            raise ValueError(f"Unknown model name {name}")
        self.name = name
        cfg = adm_config.MODEL_CONFIGS[name]
        if remat:
            import dataclasses

            cfg = dataclasses.replace(cfg, remat=True)
        self.config = cfg
        self.shape = adm_config.SHAPES[name]
        self.module = ADMUNet(cfg, dtype=jnp.bfloat16 if fp16 else jnp.float32)

        alphas, sigmas = linear_alphas_sigmas()
        self.schedule_alphas = jnp.asarray(alphas)
        self.schedule_sigmas = jnp.asarray(sigmas)

        self.params = self._load_or_init_params()
        self._jit_noise = jax.jit(self._predicted_noise_fn)

    def _load_or_init_params(self):
        path = find_checkpoint(f"guided_diffusion_{self.name}", self.name)
        if path is not None:
            from perceptor_tpu.models.guided_diffusion import convert

            return jax.device_put(
                convert.from_torch(load_state_dict(path)), jax.devices()[0]
            )
        size = min(self.config.image_size, 64)
        return init_by_shape(
            self.module.init,
            jax.random.PRNGKey(0),
            jnp.zeros((1, self.config.in_channels, size, size)),
            jnp.zeros((1,)),
        )["params"]

    def schedule_indices(
        self, n_steps=500, from_index=999, to_index=0, rho=7.0
    ) -> np.ndarray:
        """(k, 2) static (from, to) pairs snapped to the linear-beta grid
        (reference :58-96)."""
        return indexed_schedule(
            np.asarray(self.schedule_alphas),
            np.asarray(self.schedule_sigmas),
            n_steps=n_steps,
            from_index=from_index,
            to_index=to_index,
            rho=rho,
            strict=False,
        )

    def random_diffused(self, shape, key) -> jax.Array:
        n, c, h, w = shape
        if h % 8 or w % 8:
            raise ValueError("Height and width must be divisible by 8")
        return diffusion_space.decode(jax.random.normal(key, shape))

    def _indices(self, indices):
        indices = jnp.asarray(indices)
        if indices.ndim == 0:
            indices = indices[None]
        return indices.astype(jnp.int32)

    def alphas(self, indices):
        return self.schedule_alphas[self._indices(indices)][:, None, None, None]

    def sigmas(self, indices):
        return self.schedule_sigmas[self._indices(indices)][:, None, None, None]

    def _predicted_noise_fn(self, params, diffused_images, indices):
        """UNet forward, eps channels only (reference :126-133: output[:, :3]
        because learn_sigma)."""
        out = self.module.apply(
            {"params": params},
            diffusion_space.encode(diffused_images),
            indices.astype(jnp.float32),
        )
        return out[:, :3]

    def predicted_noise(self, diffused_images, from_indices) -> jax.Array:
        indices = self._indices(from_indices)
        if indices.shape[0] == 1 and diffused_images.shape[0] > 1:
            indices = jnp.broadcast_to(indices, (diffused_images.shape[0],))
        return self._jit_noise(self.params, diffused_images, indices)

    def predictions(self, diffused_images, indices) -> IndexedEpsPredictions:
        indices = self._indices(indices)
        if indices.shape[0] == 1 and diffused_images.shape[0] > 1:
            indices = jnp.broadcast_to(indices, (diffused_images.shape[0],))
        return IndexedEpsPredictions(
            from_diffused_images=diffused_images,
            from_indices=indices,
            predicted_noise=self.predicted_noise(diffused_images, indices),
            schedule_alphas=self.schedule_alphas,
            schedule_sigmas=self.schedule_sigmas,
        )

    forward = predictions

    def diffuse_images(self, denoised_images, indices, noise=None, key=None):
        """q-sample (reference :148-155)."""
        xs = diffusion_space.encode(denoised_images)
        if noise is None:
            if key is None:
                raise ValueError("diffuse_images is stochastic: pass noise= or key=")
            noise = jax.random.normal(key, xs.shape, xs.dtype)
        return diffusion_space.decode(
            xs * self.alphas(indices) + noise * self.sigmas(indices)
        )
