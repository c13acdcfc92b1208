"""LDM Face (celebahq-ldm-vq-4, unconditional).

Rebuild of reference perceptor/models/latent_diffusion/face.py:15-110:
same index API as Text2Image, 3-channel f4 VQ latents (:74-76), 256x256
guard (:87-91). Architecture per configs/latent-diffusion/celebahq-ldm-vq-4.yaml.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from perceptor_tpu import utils
from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.models.guided_diffusion.config import ADMConfig
from perceptor_tpu.models.guided_diffusion.unet import ADMUNet
from perceptor_tpu.models.latent_diffusion import first_stage
from perceptor_tpu.models.latent_diffusion.ddim import build_ldm_sample_run
from perceptor_tpu.models.latent_diffusion.first_stage import VQModel
from perceptor_tpu.predictions import diffusion_space
from perceptor_tpu.schedules import scaled_linear_alphas_sigmas
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict

# celebahq-ldm-vq-4.yaml model.params schedule
TIMESTEPS = 1000
LINEAR_START = 0.0015
LINEAR_END = 0.0195

FACE_UNET = ADMConfig(
    image_size=64,
    model_channels=224,
    channel_mult=(1, 2, 3, 4),
    num_res_blocks=2,
    attention_ds=(2, 4, 8),
    num_head_channels=32,
    in_channels=3,
    out_channels=3,
)

TINY_FACE_UNET = ADMConfig(
    image_size=8,
    model_channels=16,
    channel_mult=(1, 2),
    num_res_blocks=1,
    attention_ds=(2,),
    num_head_channels=8,
    in_channels=3,
    out_channels=3,
)


@utils.cache
class Face:
    def __init__(self, eta: float = 0.0, fp16: bool = True, tiny: bool = False):
        self.eta = eta
        dtype = jnp.bfloat16 if fp16 else jnp.float32
        self.unet_config = TINY_FACE_UNET if tiny else FACE_UNET
        self.vq_config = first_stage.TINY_VQ if tiny else first_stage.VQ_F4
        self.unet = ADMUNet(self.unet_config, dtype=dtype)
        self.first_stage = VQModel(self.vq_config, dtype=dtype)

        alphas, sigmas = scaled_linear_alphas_sigmas(
            TIMESTEPS, LINEAR_START, LINEAR_END
        )
        self.schedule_alphas = jnp.asarray(alphas)
        self.schedule_sigmas = jnp.asarray(sigmas)

        self.params = self._load_or_init_params()
        self._jit_eps = jax.jit(
            lambda params, latents, ts: self.unet.apply(
                {"params": params["unet"]}, latents, ts
            )
        )
        self._jit_decode = jax.jit(
            lambda params, latents: self.first_stage.apply(
                {"params": params["first_stage"]}, latents, method=VQModel.decode
            )
        )

    def _load_or_init_params(self):
        path = find_checkpoint("latent_diffusion_face", "celebahq-ldm-vq-4")
        if path is not None:
            from perceptor_tpu.models.guided_diffusion import convert as adm_convert
            from perceptor_tpu.utils.checkpoints import native_params

            sd = load_state_dict(path)
            native = native_params(sd)
            if native is not None:
                return jax.device_put(native, jax.devices()[0])
            unet_sd = {
                k[len("model.diffusion_model."):]: v
                for k, v in sd.items()
                if k.startswith("model.diffusion_model.")
            }
            return jax.device_put(
                {
                    "unet": adm_convert.from_torch(unet_sd),
                    "first_stage": first_stage.convert_compvis_autoencoder(
                        sd, self.vq_config
                    ),
                },
                jax.devices()[0],
            )
        size = 8
        key = jax.random.PRNGKey(0)
        down = self.vq_config.downscale
        return {
            "unet": init_by_shape(
                self.unet.init, key, jnp.zeros((1, 3, size, size)), jnp.zeros((1,))
            )["params"],
            "first_stage": init_by_shape(
                self.first_stage.init, key, jnp.zeros((1, 3, size * down, size * down))
            )["params"],
        }

    # -- reference API ----------------------------------------------------------

    def schedule_indices(self, from_index=999, to_index=50, n_steps=None) -> np.ndarray:
        if from_index < to_index:
            raise ValueError("from_index must be greater than to_index")
        if n_steps is None:
            n_steps = (from_index - to_index) // 2
        indices = np.linspace(from_index, to_index, n_steps).astype(np.int64)
        if (indices[:-1] == indices[1:]).any():
            raise ValueError("Schedule indices must be unique")
        return np.stack([indices[:-1], indices[1:]], axis=1)

    def latent_shape(self, height, width):
        down = self.vq_config.downscale
        return [self.vq_config.latent_channels, height // down, width // down]

    def _check_size(self, height, width):
        if not hasattr(self, "_tiny_guard") and self.unet_config is FACE_UNET:
            if (height, width) != (256, 256):
                raise ValueError(
                    "celebahq face model generates 256x256 images"
                )

    def random_latents(self, images_shape, key) -> jax.Array:
        self._check_size(*images_shape[-2:])
        return jax.random.normal(
            key, (images_shape[0], *self.latent_shape(*images_shape[-2:]))
        )

    def latents(self, images):
        """images [0,1] -> continuous VQ latents."""
        return self.first_stage.apply(
            {"params": self.params["first_stage"]},
            diffusion_space.encode(images),
            method=VQModel.encode,
        )

    def alphas_cumprod(self, index):
        return jnp.square(self.schedule_alphas[index])[None, None, None, None]

    def sqrt_one_minus_alphas_cumprod(self, index):
        return self.schedule_sigmas[index][None, None, None, None]

    def diffuse(self, latents, index, noise=None, key=None):
        if noise is None:
            if key is None:
                raise ValueError("diffuse is stochastic: pass noise= or key=")
            noise = jax.random.normal(key, latents.shape, latents.dtype)
        return (
            latents * jnp.sqrt(self.alphas_cumprod(index))
            + noise * self.sqrt_one_minus_alphas_cumprod(index)
        )

    def eps(self, latents, index):
        if index >= 1000:
            raise ValueError("index must be less than 1000")
        ts = jnp.full((latents.shape[0],), index, jnp.float32)
        return self._jit_eps(self.params, latents, ts)

    def denoise(self, latents, index, eps=None):
        if eps is None:
            eps = self.eps(latents, index)
        return (
            latents - self.sqrt_one_minus_alphas_cumprod(index) * eps
        ) / jnp.sqrt(self.alphas_cumprod(index))

    forward = denoise

    def images(self, latents):
        return diffusion_space.decode(self._jit_decode(self.params, latents))

    def step(self, from_latents, predicted_denoised_latents, from_index, to_index,
             noise=None, key=None):
        if to_index > from_index:
            raise ValueError("to_index must be smaller than from_index")
        if noise is None:
            if key is not None:
                noise = jax.random.normal(
                    key, predicted_denoised_latents.shape,
                    predicted_denoised_latents.dtype,
                )
            elif self.eta > 0:
                raise ValueError("step with eta>0 is stochastic: pass key=")
            else:
                noise = jnp.zeros_like(predicted_denoised_latents)
        from_ac = self.alphas_cumprod(from_index)
        to_ac = self.alphas_cumprod(to_index)
        from_sqrt_1m = self.sqrt_one_minus_alphas_cumprod(from_index)
        to_sigmas = self.eta * jnp.sqrt(
            (1 - to_ac) / (1 - from_ac) * (1 - from_ac / to_ac)
        )
        eps = (from_latents - predicted_denoised_latents * jnp.sqrt(from_ac)) / from_sqrt_1m
        dir_xt = jnp.sqrt(1.0 - to_ac - to_sigmas**2) * eps
        return jnp.sqrt(to_ac) * predicted_denoised_latents + dir_xt + to_sigmas * noise

    # -- fused sampler ---------------------------------------------------------

    def sample(
        self,
        n_images: int = 1,
        n_steps: int = 50,
        size=(256, 256),
        eta: Optional[float] = None,
        key=None,
        from_index: int = 999,
        to_index: int = 50,
        mesh=None,
        rules=None,
        method: str = "ddim",
    ) -> jax.Array:
        """Unconditional face sampling (the reference's user loop over
        denoise/step, reference face.py:87-110) as ONE memoized lax.scan
        program: per pair eps -> denoise -> DDIM step, final denoise ->
        VQ first-stage decode. ``eta`` defaults to the constructor field
        and is traced. ``method="dpm++"`` swaps in DPM-Solver++(2M)
        (deterministic; rejects eta>0). Returns images in [0, 1]."""
        eta = self.eta if eta is None else eta
        if method not in ("ddim", "dpm++"):
            raise ValueError(f"unknown sampling method: {method!r}")
        if method == "dpm++" and float(eta) > 0.0:
            raise ValueError("dpm++ is deterministic: eta does not apply")
        key = key if key is not None else jax.random.PRNGKey(0)
        init_key, scan_key = jax.random.split(key)
        latents = self.random_latents((n_images, 3, *size), init_key)
        pairs = jnp.asarray(
            self.schedule_indices(from_index, to_index, n_steps)
        )
        params = self.params
        if mesh is not None:
            from perceptor_tpu import parallel

            params, latents, pairs, scan_key = parallel.shard_for_sampling(
                mesh, params, latents, pairs, scan_key, rules=rules
            )
        from perceptor_tpu.parallel.plan import activate, plan_for_mesh

        plan = plan_for_mesh(mesh) if mesh is not None else None
        stochastic = float(eta) > 0.0
        runs = self.__dict__.setdefault("_sample_runs", {})
        run = runs.get((stochastic, method, plan))
        if run is None:
            run = self._build_sample_run(stochastic, method)
            runs[(stochastic, method, plan)] = run
        with activate(plan):  # trace-time ring/Ulysses attention routing
            return run(
                params, latents, pairs, None, scan_key, jnp.float32(0.0),
                jnp.float32(eta),
            )

    def _build_sample_run(self, stochastic, method="ddim"):
        """Jitted scan for `sample()`'s static flag combination
        (shared builder: latent_diffusion/ddim.py)."""

        def make_eps_fn(params, cond, guidance_scale, n):
            del cond, guidance_scale  # unconditional

            def eps_fn(latents, index):
                ts = jnp.full((n,), index, jnp.float32)
                return self.unet.apply({"params": params["unet"]}, latents, ts)

            return eps_fn

        def decode(params, denoised):
            return diffusion_space.decode(
                self.first_stage.apply(
                    {"params": params["first_stage"]}, denoised,
                    method=VQModel.decode,
                )
            )

        return build_ldm_sample_run(
            self, stochastic, make_eps_fn, decode, method=method
        )
