"""LDM Text2Image (CompVis txt2img-f8-large, 1.4B).

Rebuild of reference perceptor/models/latent_diffusion/text2image.py:15-161:
linear `schedule_indices` (:41-51), 4-channel f8 latents (:53-55), BERT
conditioning with negative prompts (:71-78), eps -> denoise (:86-93),
DDIM `step` with eta (:110-144), and CFG built into `eps()` (:146-161).
Architecture per configs/latent-diffusion/txt2img-1p4B-eval.yaml.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from perceptor_tpu import utils
from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.models.guided_diffusion.config import ADMConfig
from perceptor_tpu.models.guided_diffusion.unet import ADMUNet
from perceptor_tpu.models.latent_diffusion import bert as bert_lib
from perceptor_tpu.models.latent_diffusion import first_stage
from perceptor_tpu.models.latent_diffusion.ddim import build_ldm_sample_run
from perceptor_tpu.models.stable_diffusion.vae import AutoencoderKL
from perceptor_tpu.predictions import diffusion_space
from perceptor_tpu.schedules import scaled_linear_alphas_sigmas
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict

# txt2img-1p4B-eval.yaml model.params: the LDM "linear" schedule is
# linear in sqrt(beta) space (ddpm.py make_beta_schedule), identical to
# SD's scaled-linear. scale_factor applied via vae_config.scaling_factor.
TIMESTEPS = 1000
LINEAR_START = 0.00085
LINEAR_END = 0.012
SCALE_FACTOR = 0.18215

TXT2IMG_UNET = ADMConfig(
    image_size=32,
    model_channels=320,
    channel_mult=(1, 2, 4, 4),
    num_res_blocks=2,
    attention_ds=(1, 2, 4),
    num_heads=8,
    in_channels=4,
    out_channels=4,
    spatial_transformer=True,
    context_dim=1280,
)

TINY_UNET = ADMConfig(
    image_size=8,
    model_channels=16,
    channel_mult=(1, 2),
    num_res_blocks=1,
    attention_ds=(2,),
    num_heads=2,
    in_channels=4,
    out_channels=4,
    spatial_transformer=True,
    context_dim=32,
)


@utils.cache
class Text2Image:
    def __init__(
        self,
        guidance_scale: Optional[float] = 5.0,
        eta: float = 0.0,
        fp16: bool = True,
        tiny: bool = False,
        tokenizer: Optional[bert_lib.BERTTokenizer] = None,
    ):
        self.guidance_scale = guidance_scale
        self.eta = eta
        dtype = jnp.bfloat16 if fp16 else jnp.float32
        self.unet_config = TINY_UNET if tiny else TXT2IMG_UNET
        self.bert_config = bert_lib.TINY_BERT if tiny else bert_lib.BERTConfig()
        from perceptor_tpu.models.stable_diffusion.config import (
            SD_V1_VAE,
            TINY_VAE,
        )
        import dataclasses

        base_vae = TINY_VAE if tiny else SD_V1_VAE
        self.vae_config = dataclasses.replace(
            base_vae, scaling_factor=SCALE_FACTOR
        )
        self.unet = ADMUNet(self.unet_config, dtype=dtype)
        self.first_stage = AutoencoderKL(self.vae_config, dtype=dtype)
        self.bert = bert_lib.BERTEncoder(self.bert_config, dtype=dtype)
        self._tokenizer = tokenizer

        alphas, sigmas = scaled_linear_alphas_sigmas(
            TIMESTEPS, LINEAR_START, LINEAR_END
        )
        self.schedule_alphas = jnp.asarray(alphas)
        self.schedule_sigmas = jnp.asarray(sigmas)

        self.params = self._load_or_init_params()
        # guidance_scale branches at trace time -> static
        self._jit_eps = jax.jit(self._eps_fn, static_argnums=(4,))
        self._jit_bert = jax.jit(
            lambda params, tokens: self.bert.apply({"params": params["bert"]}, tokens)
        )
        # vae_config.scaling_factor == 0.18215, so encode/decode already
        # carry the LDM scale_factor convention
        self._jit_decode = jax.jit(
            lambda params, latents: self.first_stage.apply(
                {"params": params["first_stage"]}, latents,
                method=AutoencoderKL.decode,
            )
        )

    def _load_or_init_params(self):
        path = find_checkpoint("latent_diffusion_text2image", "txt2img-1p4B")
        if path is not None:
            from perceptor_tpu.utils.checkpoints import native_params

            sd = load_state_dict(path)
            native = native_params(sd)
            params = native if native is not None else self._convert(sd)
            return jax.device_put(params, jax.devices()[0])
        size = 8
        key = jax.random.PRNGKey(0)
        return {
            "unet": init_by_shape(
                self.unet.init,
                key,
                jnp.zeros((1, 4, size, size)),
                jnp.zeros((1,)),
                jnp.zeros((1, 4, self.unet_config.context_dim)),
            )["params"],
            "first_stage": init_by_shape(
                self.first_stage.init, key, jnp.zeros((1, 3, size * 8, size * 8))
            )["params"],
            "bert": init_by_shape(
                self.bert.init,
                key,
                jnp.zeros((1, self.bert_config.max_seq_len), jnp.int32),
            )["params"],
        }

    def _convert(self, sd):
        from perceptor_tpu.models.guided_diffusion import convert as adm_convert

        unet_sd = {
            k[len("model.diffusion_model."):]: v
            for k, v in sd.items()
            if k.startswith("model.diffusion_model.")
        }
        # CompVis KL stage uses CompVis naming
        first = first_stage.convert_compvis_autoencoder(sd, self.vae_config)
        return {
            "unet": adm_convert.from_torch(unet_sd),
            "first_stage": first,
            "bert": bert_lib.convert_bert(sd, self.bert_config),
        }

    @property
    def tokenizer(self):
        if self._tokenizer is None:
            self._tokenizer = bert_lib.BERTTokenizer(
                max_length=self.bert_config.max_seq_len
            )
        return self._tokenizer

    # -- reference API ------------------------------------------------------------

    def schedule_indices(self, from_index=999, to_index=50, n_steps=None) -> np.ndarray:
        """Linear index ramp (reference :40-50)."""
        if from_index < to_index:
            raise ValueError("from_index must be greater than to_index")
        if n_steps is None:
            n_steps = (from_index - to_index) // 2
        indices = np.linspace(from_index, to_index, n_steps).astype(np.int64)
        if (indices[:-1] == indices[1:]).any():
            raise ValueError("Schedule indices must be unique")
        return np.stack([indices[:-1], indices[1:]], axis=1)

    def latent_shape(self, height, width):
        down = self.vae_config.downscale
        return [self.vae_config.latent_channels, height // down, width // down]

    def random_latents(self, images_shape, key) -> jax.Array:
        return jax.random.normal(
            key, (images_shape[0], *self.latent_shape(*images_shape[-2:]))
        )

    def latents(self, images, key=None):
        """images [0,1] -> scaled first-stage latents (reference :64-68)."""
        return self.first_stage.apply(
            {"params": self.params["first_stage"]},
            images,
            key,
            method=AutoencoderKL.encode,
        )

    def conditioning(self, text_prompts: Sequence[str],
                     negative_text_prompts: Sequence[str] = ("",)) -> jax.Array:
        """cat([positive, negative]) BERT encodings (reference :70-78)."""
        tokens = self.tokenizer(list(text_prompts) + list(negative_text_prompts))
        return self._jit_bert(self.params, jnp.asarray(tokens))

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

    def _eps_fn(self, params, latents, index, conditioning, guidance_scale):
        ts = jnp.full((latents.shape[0],), index, jnp.float32)
        if guidance_scale is None or guidance_scale == 1.0:
            return self.unet.apply({"params": params["unet"]}, latents, ts, conditioning)
        n = latents.shape[0]
        positive, negative = conditioning[:n], conditioning[n:]
        stacked = self.unet.apply(
            {"params": params["unet"]},
            jnp.concatenate([latents, latents]),
            jnp.concatenate([ts, ts]),
            jnp.concatenate([positive, jnp.broadcast_to(negative, positive.shape)]),
        )
        eps_conditioned, eps_negative = jnp.split(stacked, 2)
        return eps_negative + guidance_scale * (eps_conditioned - eps_negative)

    def eps(self, latents, index, conditioning):
        """Noise prediction with built-in CFG (reference :146-161)."""
        if index >= 1000:
            raise ValueError("index must be less than 1000")
        return self._jit_eps(
            self.params, latents, int(index), conditioning, self.guidance_scale
        )

    def denoise(self, latents, index, conditioning=None, eps=None):
        """(reference :86-93)."""
        if eps is None:
            eps = self.eps(latents, index, conditioning)
        return (
            latents - self.sqrt_one_minus_alphas_cumprod(index) * eps
        ) / jnp.sqrt(self.alphas_cumprod(index))

    forward = denoise

    def images(self, latents):
        """Latents -> images [0,1] (reference :95-97)."""
        return self._jit_decode(self.params, latents)

    def step(self, from_latents, predicted_denoised_latents, from_index, to_index,
             noise=None, key=None):
        """DDIM update with eta (reference :110-144)."""
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
        texts: Sequence[str],
        negative_texts: Sequence[str] = ("",),
        n_steps: int = 50,
        size=(256, 256),  # txt2img-1p4B is 256px-native (unet image_size 32 x f8)
        guidance_scale: Optional[float] = None,
        eta: Optional[float] = None,
        key=None,
        from_index: int = 999,
        to_index: int = 50,
        mesh=None,
        rules=None,
        method: str = "ddim",
    ) -> jax.Array:
        """The reference's sampling loop (its test loop, reference
        text2image.py:164-179: per pair eps-with-built-in-CFG -> denoise
        -> DDIM step; final denoise -> first-stage decode) fused into ONE
        lax.scan program. ``guidance_scale``/``eta`` default to the
        constructor fields and are TRACED (sweeping them reuses one
        executable; only eta==0 vs >0 and CFG on/off retrace).
        ``method="dpm++"`` swaps the DDIM update for DPM-Solver++(2M)
        (predictions/dpm_solver.py) — same cost per step, usable at ~20
        steps; deterministic, so it rejects eta>0. Returns images in
        [0, 1]."""
        guidance_scale = (
            self.guidance_scale if guidance_scale is None else guidance_scale
        )
        eta = self.eta if eta is None else eta
        if method not in ("ddim", "dpm++"):
            raise ValueError(f"unknown sampling method: {method!r}")
        if method == "dpm++" and float(eta) > 0.0:
            raise ValueError("dpm++ is deterministic: eta does not apply")
        key = key if key is not None else jax.random.PRNGKey(0)
        init_key, scan_key = jax.random.split(key)
        latents = self.random_latents((len(texts), 3, *size), init_key)
        cond = self.conditioning(list(texts), list(negative_texts))
        pairs = jnp.asarray(
            self.schedule_indices(from_index, to_index, n_steps)
        )
        params = self.params
        if mesh is not None:
            from perceptor_tpu import parallel

            params, latents, pairs, cond, scan_key = (
                parallel.shard_for_sampling(
                    mesh, params, latents, pairs, cond, scan_key, rules=rules
                )
            )
        from perceptor_tpu.parallel.plan import activate, plan_for_mesh

        plan = plan_for_mesh(mesh) if mesh is not None else None
        stochastic = float(eta) > 0.0
        use_cfg = not (guidance_scale is None or guidance_scale == 1.0)
        runs = self.__dict__.setdefault("_sample_runs", {})
        run = runs.get((stochastic, use_cfg, method, plan))
        if run is None:
            run = self._build_sample_run(stochastic, use_cfg, method)
            runs[(stochastic, use_cfg, method, plan)] = run
        with activate(plan):  # trace-time ring/Ulysses attention routing
            return run(
                params, latents, pairs, cond, scan_key,
                jnp.float32(1.0 if guidance_scale is None else guidance_scale),
                jnp.float32(eta),
            )

    def _build_sample_run(self, stochastic, use_cfg, method="ddim"):
        """Jitted scan for `sample()`'s static flag combination
        (shared builder: latent_diffusion/ddim.py)."""

        def make_eps_fn(params, cond, guidance_scale, n):
            positive, negative = cond[:n], cond[n:]

            def eps_fn(latents, index):
                ts = jnp.full((n,), index, jnp.float32)
                if not use_cfg:
                    return self.unet.apply(
                        {"params": params["unet"]}, latents, ts, positive
                    )
                stacked = self.unet.apply(
                    {"params": params["unet"]},
                    jnp.concatenate([latents, latents]),
                    jnp.concatenate([ts, ts]),
                    jnp.concatenate(
                        [positive, jnp.broadcast_to(negative, positive.shape)]
                    ),
                )
                eps_cond, eps_neg = jnp.split(stacked, 2)
                return eps_neg + guidance_scale * (eps_cond - eps_neg)

            return eps_fn

        def decode(params, denoised):
            return self.first_stage.apply(
                {"params": params["first_stage"]}, denoised,
                method=AutoencoderKL.decode,
            )

        return build_ldm_sample_run(
            self, stochastic, make_eps_fn, decode, method=method
        )
