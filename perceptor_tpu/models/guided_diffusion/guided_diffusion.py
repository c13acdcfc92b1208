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
            from perceptor_tpu.utils.checkpoints import native_params

            sd = load_state_dict(path)
            native = native_params(sd)
            params = native if native is not None else convert.from_torch(sd)
            return jax.device_put(params, jax.devices()[0])
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

    def predictions_fn(
        self, params, diffused_images, indices, conditioning=None
    ) -> IndexedEpsPredictions:
        """Pure `predictions` (params as an argument, jit/engine-safe —
        the signature engine.guided_sample drives). ADM is unconditional;
        `conditioning` must be None."""
        if conditioning is not None:
            raise ValueError("GuidedDiffusion is unconditional")
        indices = self._indices(indices)
        if indices.shape[0] == 1 and diffused_images.shape[0] > 1:
            indices = jnp.broadcast_to(indices, (diffused_images.shape[0],))
        return IndexedEpsPredictions(
            from_diffused_images=diffused_images,
            from_indices=indices,
            predicted_noise=self._predicted_noise_fn(
                params, diffused_images, indices
            ),
            schedule_alphas=self.schedule_alphas,
            schedule_sigmas=self.schedule_sigmas,
        )

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

    # -- fused sampler ---------------------------------------------------------

    def sample(
        self,
        n_images: int = 1,
        n_steps: int = 50,
        size=None,
        eta: float = 0.0,
        key=None,
        from_index: int = 999,
        to_index: int = 0,
        rho: float = 3.0,
        init_images=None,
        mesh=None,
        rules=None,
        method: str = "ddim",
    ) -> jax.Array:
        """The reference's sampling loop (its test loop, reference
        guided_diffusion.py:158-196: predictions -> DDIM step per pair,
        final denoised_images; rho=3.0 there) fused into ONE memoized
        lax.scan program. ``init_images`` + ``from_index < 999`` gives
        img2img (the reference's init-image test, :199-227).
        ``method="dpm++"`` swaps the DDIM update for DPM-Solver++(2M)
        (deterministic; rejects eta>0). Returns the final denoised images
        in [0, 1]."""
        if method not in ("ddim", "dpm++"):
            raise ValueError(f"unknown sampling method: {method!r}")
        if method == "dpm++" and float(eta) > 0.0:
            raise ValueError("dpm++ is deterministic: eta does not apply")
        key = key if key is not None else jax.random.PRNGKey(0)
        init_key, scan_key = jax.random.split(key)
        size = size if size is not None else self.shape[1:]
        pairs = jnp.asarray(
            self.schedule_indices(
                n_steps, from_index=from_index, to_index=to_index, rho=rho
            )
        )
        if init_images is None:
            diffused = self.random_diffused((n_images, 3, *size), init_key)
        else:
            diffused = self.diffuse_images(
                jnp.asarray(init_images), int(pairs[0, 0]), key=init_key
            )
        params = self.params
        if mesh is not None:
            from perceptor_tpu import parallel

            params, diffused, pairs, scan_key = parallel.shard_for_sampling(
                mesh, params, diffused, pairs, scan_key, rules=rules
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
            return run(params, diffused, pairs, scan_key, jnp.float32(eta))

    def _build_sample_run(self, stochastic, method="ddim"):
        """Jitted scan for `sample()`'s static flag combination."""

        @jax.jit
        def run(params, diffused, pairs, key, eta):
            n = diffused.shape[0]

            def predict(diffused, indices):
                return self.predictions_fn(
                    params, diffused, jnp.broadcast_to(indices, (n,))
                )

            def body(carry, step_input):
                i, pair = step_input
                if method == "dpm++":
                    diffused, prev_x0, prev_h, key = carry
                else:
                    diffused, key = carry
                predictions = predict(diffused, pair[0])
                to_idx = jnp.broadcast_to(pair[1], (n,))
                if method == "dpm++":
                    stepped, prev_h = predictions.dpm_solver_pp_step(
                        to_idx, prev_x0, prev_h, i == 0
                    )
                    return (stepped, predictions.denoised_xs, prev_h, key), None
                if stochastic:
                    key, step_key = jax.random.split(key)
                    stepped = predictions.step(to_idx, eta=eta, key=step_key)
                else:
                    stepped = predictions.step(to_idx)
                return (stepped, key), None

            steps = (jnp.arange(pairs.shape[0]), pairs)
            if method == "dpm++":
                carry0 = (
                    diffused,
                    jnp.zeros_like(diffused),
                    jnp.ones((n, 1, 1, 1), diffused.dtype),
                    key,
                )
                (diffused, *_), _ = jax.lax.scan(body, carry0, steps)
            else:
                (diffused, _), _ = jax.lax.scan(body, (diffused, key), steps)
            return predict(diffused, pairs[-1, 1]).denoised_images

        return run
