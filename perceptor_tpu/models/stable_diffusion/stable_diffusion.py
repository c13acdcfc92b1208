"""StableDiffusion wrapper: UNet + KL-VAE + CLIP text conditioning.

Rebuild of reference perceptor/models/stable_diffusion/stable_diffusion.py:32-491:
  - DDPM scaled-linear schedule as alpha/sigma tables (:98-114)
  - Karras-rho `schedule_indices` snapped to the 1000-index grid (:132-173)
  - `predictions()` -> LatentIndexedEpsPredictions (eps algebra, :241-293)
  - `encode`/`decode` through the VAE (:176-198)
  - `conditioning(texts)` via the CLIP text tower (:295-323)
  - inpainting latent masks + 9-channel UNet input (:325-375)
  - `sample()` with classifier-free guidance + RePaint resample (:384-491)

TPU-native differences:
  - CFG runs uncond+cond in ONE batched UNet call (the reference makes two
    sequential UNet calls, :460-469) — batch 2N keeps the MXU fed.
  - `sample()` is a single compiled lax.scan program (zero host round-trips
    per step); `sample_iter()` keeps the reference's generator ergonomics.
  - fp16 autocast + xformers + attention slicing (:68-106) are replaced by
    bf16 compute, ops.attention, and optional remat.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from perceptor_tpu import utils
from perceptor_tpu.core.init import init_on_cpu
from perceptor_tpu.ops.clamp import clamp_with_grad
from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer, tokenize
from perceptor_tpu.models.stable_diffusion import config as sd_config
from perceptor_tpu.models.stable_diffusion.text_encoder import CLIPTextEncoder
from perceptor_tpu.models.stable_diffusion.unet import UNet
from perceptor_tpu.models.stable_diffusion.vae import AutoencoderKL
from perceptor_tpu.predictions import LatentIndexedEpsPredictions
from perceptor_tpu.schedules import indexed_schedule, scaled_linear_alphas_sigmas
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict

INPAINTING_NAME = "runwayml/stable-diffusion-inpainting"

# Published SD-1.x linear latent->RGB preview factors (the 4x3 map every
# latent-preview implementation shares; approximate decode for guidance/
# preview, NOT a VAE replacement). Rows are the 4 latent channels.
_LATENT_RGB_FACTORS = np.array(
    [
        [0.298, 0.207, 0.208],
        [0.187, 0.286, 0.173],
        [-0.158, 0.189, 0.264],
        [-0.184, -0.271, -0.473],
    ],
    dtype=np.float32,
)


@jax.tree_util.register_pytree_node_class
class Conditioning:
    """Conditioning bundle (reference conditioning.py:6-44): text encoder
    states plus, for the inpainting checkpoint, the latent mask and the
    masked-image latents that extend the UNet input to 9 channels."""

    def __init__(self, model_name, encodings, inpainting_latent_masks=None,
                 inpainting_latents=None):
        self.model_name = model_name
        self.encodings = encodings
        self.inpainting_latent_masks = inpainting_latent_masks
        self.inpainting_latents = inpainting_latents

    def __neg__(self):
        """(conditioning.py:24-29)."""
        return Conditioning(
            self.model_name, -self.encodings,
            self.inpainting_latent_masks, self.inpainting_latents,
        )

    def input(self, diffused_latents):
        """UNet input assembly (conditioning.py:31-40): the inpainting
        model concatenates [latents, binarized mask, masked latents].
        (Keyed on field presence rather than the checkpoint name so tiny
        test configs behave identically.)"""
        if self.inpainting_latent_masks is None:
            return diffused_latents
        masks = (self.inpainting_latent_masks >= 0.5).astype(jnp.float32)
        n = diffused_latents.shape[0]
        return jnp.concatenate(
            [
                diffused_latents,
                jnp.broadcast_to(masks, (n, *masks.shape[1:])),
                jnp.broadcast_to(
                    self.inpainting_latents,
                    (n, *self.inpainting_latents.shape[1:]),
                ),
            ],
            axis=1,
        )

    def tree_flatten(self):
        return (
            (self.encodings, self.inpainting_latent_masks,
             self.inpainting_latents),
            self.model_name,
        )

    @classmethod
    def tree_unflatten(cls, model_name, children):
        return cls(model_name, *children)


def _gaussian_blur(images, sigma: float):
    """kornia.filters.gaussian_blur2d semantics (reference :337-338):
    kernel size int(sigma*2)+1, normalized gaussian, reflect padding."""
    ks = int(sigma * 2) + 1
    xs = np.arange(ks, dtype=np.float64) - (ks - 1) / 2.0
    kernel1d = np.exp(-0.5 * (xs / sigma) ** 2)
    kernel1d = (kernel1d / kernel1d.sum()).astype(np.float32)
    pad = ks // 2
    c = images.shape[1]
    kh = jnp.asarray(kernel1d).reshape(1, 1, ks, 1)
    kv = jnp.asarray(kernel1d).reshape(1, 1, 1, ks)
    out = jnp.pad(images, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    out = jax.lax.conv_general_dilated(
        out, jnp.tile(kh, (c, 1, 1, 1)), (1, 1), "VALID",
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    out = jnp.pad(out, ((0, 0), (0, 0), (0, 0), (pad, pad)), mode="reflect")
    return jax.lax.conv_general_dilated(
        out, jnp.tile(kv, (c, 1, 1, 1)), (1, 1), "VALID",
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


@utils.cache
class StableDiffusion:
    def __init__(
        self,
        name: str = "runwayml/stable-diffusion-v1-5",
        fp16: bool = True,
        remat: bool = False,
        tokenizer: Optional[SimpleTokenizer] = None,
    ):
        """Args mirror reference stable_diffusion.py:33-41 (`fp16` maps to
        bf16 compute on TPU; `attention_slicing` is unnecessary — remat +
        flash attention cover the memory pressure)."""
        if name not in sd_config.MODEL_CONFIGS and name not in (
            "tiny", "tiny-inpainting"
        ):
            raise ValueError(f"unknown stable diffusion name: {name}")
        self.name = name
        if name in ("tiny", "tiny-inpainting"):
            unet_cfg, vae_cfg, text_cfg = (
                sd_config.TINY_UNET
                if name == "tiny"
                else sd_config.TINY_INPAINT_UNET,
                sd_config.TINY_VAE,
                sd_config.TINY_TEXT,
            )
        else:
            unet_cfg, vae_cfg, text_cfg = sd_config.MODEL_CONFIGS[name]
        if remat:
            unet_cfg = sd_config.UNetConfig(
                **{**unet_cfg.__dict__, "remat": True}
            )
        dtype = jnp.bfloat16 if fp16 else jnp.float32
        self.unet_config, self.vae_config, self.text_config = (
            unet_cfg,
            vae_cfg,
            text_cfg,
        )
        self.unet = UNet(unet_cfg, dtype=dtype)
        self.vae = AutoencoderKL(vae_cfg, dtype=dtype)
        self.text_encoder = CLIPTextEncoder(text_cfg, dtype=dtype)
        self._tokenizer = tokenizer

        alphas, sigmas = scaled_linear_alphas_sigmas()
        self.schedule_alphas = jnp.asarray(alphas)
        self.schedule_sigmas = jnp.asarray(sigmas)

        self.params = self._load_or_init_params()

        # jit the hot pure functions once (eager op-by-op dispatch is
        # pathological under a remote-compile TPU tunnel).
        self._jit_unet = jax.jit(
            lambda params, latents, indices, context: self.unet.apply(
                {"params": params["unet"]}, latents, indices, context
            )
        )
        self._jit_unet_conditioned = jax.jit(
            lambda params, latents, indices, cond: self.unet.apply(
                {"params": params["unet"]},
                cond.input(latents),
                indices,
                cond.encodings,
            )
        )
        self._jit_text = jax.jit(
            lambda params, tokens: self.text_encoder.apply(
                {"params": params["text_encoder"]}, tokens
            )
        )
        self._jit_decode = jax.jit(
            lambda params, latents: self.vae.apply(
                {"params": params["vae"]}, latents, method=AutoencoderKL.decode
            )
        )
        self._jit_encode = jax.jit(
            lambda params, images, key: self.vae.apply(
                {"params": params["vae"]}, images, key, method=AutoencoderKL.encode
            )
        )
        self._jit_encode_mode = jax.jit(
            lambda params, images: self.vae.apply(
                {"params": params["vae"]}, images, method=AutoencoderKL.encode
            )
        )

    # -- parameters -----------------------------------------------------------

    def _load_or_init_params(self):
        params = self._load_or_init_params_fp32()
        if self.unet.dtype == jnp.bfloat16:
            # bf16 STORAGE for matmul/conv weights: the compute path casts
            # to bf16 anyway, so this is numerically identical while halving
            # weight HBM reads (the reference's fp16-revision analogue,
            # reference stable_diffusion.py:86-97)
            from perceptor_tpu.core.dtypes import cast_matmul_params_bf16

            params = cast_matmul_params_bf16(params)
        return params

    def _load_or_init_params_fp32(self):
        path = find_checkpoint(
            f"stable_diffusion_{self.name.replace('/', '_')}", self.name
        )
        if path is not None:
            from perceptor_tpu.models.stable_diffusion import convert
            from perceptor_tpu.utils.checkpoints import native_params

            sd = load_state_dict(path)
            native = native_params(sd)
            if native is not None:  # pre-converted artifact (utils.checkpoints)
                return native
            sd = sd.get("state_dict", sd)
            is_compvis = any(
                k.startswith("model.diffusion_model.") for k in sd
            )
            loader = convert.from_compvis if is_compvis else convert.from_diffusers
            return loader(
                sd, self.unet_config, self.vae_config, self.text_config
            )
        size = 16 if self.name.startswith("tiny") else 64
        latent = jnp.zeros(
            (1, self.unet_config.in_channels, size, size), jnp.float32
        )
        key = jax.random.PRNGKey(0)
        return {
            "unet": init_on_cpu(
                self.unet.init,
                key,
                latent,
                jnp.zeros((1,), jnp.float32),
                jnp.zeros((1, 8, self.unet_config.context_dim), jnp.float32),
            )["params"],
            "vae": init_on_cpu(
                self.vae.init,
                key,
                jnp.zeros((1, 3, size * 8, size * 8), jnp.float32),
            )["params"],
            "text_encoder": init_on_cpu(
                self.text_encoder.init,
                key,
                jnp.zeros((1, self.text_config.context_length), jnp.int32),
            )["params"],
        }

    @property
    def tokenizer(self) -> SimpleTokenizer:
        if self._tokenizer is None:
            self._tokenizer = SimpleTokenizer()
        return self._tokenizer

    # -- schedule ----------------------------------------------------------------

    def schedule_indices(
        self,
        n_steps: int = 50,
        from_index: int = 999,
        to_index: int = 0,
        rho: float = 7.0,
    ) -> np.ndarray:
        """(k, 2) static (from, to) index pairs (reference :132-173)."""
        return indexed_schedule(
            np.asarray(self.schedule_alphas),
            np.asarray(self.schedule_sigmas),
            n_steps=n_steps,
            from_index=from_index,
            to_index=to_index,
            rho=rho,
            strict=False,
        )

    # -- pure functions (fused-step building blocks) --------------------------------

    def predicted_noise_fn(self, params, diffused_latents, indices, conditioning):
        """UNet forward: the reference's `predicted_noise` (:262-273).
        `conditioning` is encoder states or a `Conditioning` (inpainting:
        the 9-channel input is assembled inside the jitted call)."""
        indices = jnp.asarray(indices)
        if indices.ndim == 0:
            indices = jnp.broadcast_to(indices, (diffused_latents.shape[0],))
        if isinstance(conditioning, Conditioning):
            return self._jit_unet_conditioned(
                params, diffused_latents, indices, conditioning
            )
        return self._jit_unet(params, diffused_latents, indices, conditioning)

    def encode_fn(self, params, images, key=None):
        if key is None:
            return self._jit_encode_mode(params, images)
        return self._jit_encode(params, images, key)

    def decode_fn(self, params, latents):
        return self._jit_decode(params, latents)

    def preview_images_fn(self, latents):
        """Linear latent -> RGB preview (no VAE): the published SD-1.x
        4x3 preview factors every latent-preview UI uses. Approximate
        (1/8-resolution, linear), but differentiable and ~free — the
        engine's ``loss_images="preview"`` guidance mode runs the loss
        VJP through THIS instead of the VAE decode, which dominates the
        fused guided step's cost (docs/PERFORMANCE.md step anatomy)."""
        rgb = jnp.einsum(
            "nchw,cd->ndhw",
            latents,
            jnp.asarray(_LATENT_RGB_FACTORS, dtype=latents.dtype),
        )
        return clamp_with_grad(rgb * 0.5 + 0.5, 0.0, 1.0)

    def text_encode_fn(self, params, tokens):
        return self._jit_text(params, tokens)

    # -- reference API ----------------------------------------------------------------

    def predictions(
        self, diffused_latents, indices, conditioning
    ) -> LatentIndexedEpsPredictions:
        """(reference :241-293)."""
        indices = jnp.asarray(indices)
        if indices.ndim == 0:
            indices = jnp.broadcast_to(indices, (diffused_latents.shape[0],))
        return LatentIndexedEpsPredictions(
            from_diffused_latents=diffused_latents,
            from_indices=indices,
            predicted_noise=self.predicted_noise_fn(
                self.params, diffused_latents, indices, conditioning
            ),
            schedule_alphas=self.schedule_alphas,
            schedule_sigmas=self.schedule_sigmas,
            encode=lambda images: self.encode_fn(self.params, images),
            decode=lambda latents: self.decode_fn(self.params, latents),
        )

    def predictions_fn(
        self, params, diffused_latents, indices, conditioning
    ) -> LatentIndexedEpsPredictions:
        """Pure `predictions` (params as an argument, jit/engine-safe)."""
        indices = jnp.asarray(indices)
        if indices.ndim == 0:
            indices = jnp.broadcast_to(indices, (diffused_latents.shape[0],))
        return LatentIndexedEpsPredictions(
            from_diffused_latents=diffused_latents,
            from_indices=indices,
            predicted_noise=self.predicted_noise_fn(
                params, diffused_latents, indices, conditioning
            ),
            schedule_alphas=self.schedule_alphas,
            schedule_sigmas=self.schedule_sigmas,
            encode=lambda images: self.encode_fn(params, images),
            decode=lambda latents: self.decode_fn(params, latents),
        )

    def encode(self, images, key=None):
        """images (N,3,H,W) [0,1] -> scaled latents (reference :176-192)."""
        self._check_size(images.shape[-2:])
        return self.encode_fn(self.params, images, key)

    def decode(self, latents):
        return self.decode_fn(self.params, latents)

    @contextmanager
    def finetuneable_vae(self):
        """Mutate-and-restore VAE finetuning scope (reference :200-215).

        The reference deep-copies the VAE state_dict, flips
        ``requires_grad`` back on, yields, then restores. In JAX both
        halves are already functional — ``decode_fn(params, latents)``
        takes params explicitly, so VAE gradients need no flag — which
        leaves the restore as this scope's job: assign updated params to
        ``model.params`` inside the block (e.g. from an optax step on
        ``model.params["vae"]``) and the frozen originals come back on
        exit::

            with model.finetuneable_vae() as m:
                grads = jax.grad(
                    lambda vp: loss(m.decode_fn({**m.params, "vae": vp}, latents))
                )(m.params["vae"])
                m.params = {**m.params, "vae": optax.apply_updates(...)}
                images = m.decode(latents)   # finetuned decode
            # original frozen VAE restored here
        """
        saved = jax.tree.map(lambda leaf: leaf, self.params)
        try:
            yield self
        finally:
            self.params = saved

    def latent_masks(self, masks, blur: Optional[float] = 4.0) -> jax.Array:
        """masks (N,1,H,W) in [0,1] -> blurred latent-res masks
        (reference :325-341: kornia gaussian blur + bilinear /8)."""
        from perceptor_tpu.ops.resize import interpolate_bilinear

        masks = jnp.asarray(masks, jnp.float32)
        n, c, h, w = masks.shape
        self._check_size((h, w))
        if c != 1:
            raise ValueError("Masks must be 1-channel")
        if float(masks.max()) > 1 or float(masks.min()) < 0:
            raise ValueError("Masks must be between 0 and 1")
        if blur is not None and blur > 0:
            masks = _gaussian_blur(masks, blur)
        down = self.vae_config.downscale
        return interpolate_bilinear(
            masks, (h // down, w // down), align_corners=False
        )

    def conditioning(
        self,
        texts: Sequence[str],
        inpainting_masks=None,
        inpainting_images=None,
        mask_blur: float = 4.0,
    ):
        """texts -> (N, 77, width) encoder states (reference :295-323).

        For the inpainting checkpoint (reference :343-375) returns a
        `Conditioning` carrying the latent mask and masked-image latents;
        other checkpoints return the raw encoder states.
        """
        tokens = tokenize(
            texts, self.text_config.context_length, tokenizer=self.tokenizer
        )
        encodings = self.text_encode_fn(self.params, jnp.asarray(tokens))
        if self.unet_config.in_channels == 4 + 1 + 4:  # inpainting UNet
            if inpainting_masks is None or inpainting_images is None:
                raise ValueError(
                    "the inpainting checkpoint needs inpainting_masks and "
                    "inpainting_images (reference stable_diffusion.py:358)"
                )
            masks = jnp.asarray(inpainting_masks, jnp.float32)
            images = jnp.asarray(inpainting_images, jnp.float32)
            latent_masks = self.latent_masks(masks, mask_blur)
            # masked image: keep pixels where mask <= 0.5, fill 0.5
            # elsewhere (reference :360-363)
            masked = images * (masks <= 0.5) + 0.5 * (masks > 0.5)
            latents = self.encode_fn(self.params, masked)
            return Conditioning(self.name, encodings, latent_masks, latents)
        return encodings

    def diffuse_latents(self, latents, indices, key) -> jax.Array:
        """q-sample: alpha * x0 + sigma * noise (reference :216-227)."""
        indices = jnp.asarray(indices)
        if indices.ndim == 0:
            indices = jnp.broadcast_to(indices, (latents.shape[0],))
        alphas = self.schedule_alphas[indices][:, None, None, None]
        sigmas = self.schedule_sigmas[indices][:, None, None, None]
        noise = jax.random.normal(key, latents.shape, latents.dtype)
        return latents * alphas + noise * sigmas

    def random_diffused_latents(self, shape: Tuple[int, ...], key) -> jax.Array:
        """(N, H, W) pixel shape -> fully-diffused latents (reference :229-238)."""
        n, height, width = shape
        self._check_size((height, width))
        down = self.vae_config.downscale
        return jax.random.normal(
            key, (n, self.vae_config.latent_channels, height // down, width // down)
        )

    def _check_size(self, size):
        down = self.vae_config.downscale
        if size[0] % down or size[1] % down:
            raise ValueError(f"image size must be divisible by {down}, got {size}")

    # -- samplers --------------------------------------------------------------------------

    def sample(
        self,
        texts: Sequence[str],
        negative_texts: Optional[Sequence[str]] = None,
        n_steps: int = 50,
        guidance_scale: float = 7.0,
        size: Tuple[int, int] = (512, 512),
        eta: float = 0.0,
        key=None,
        from_index: int = 999,
        to_index: int = 0,
        n_resample: int = 0,
        init_images=None,
        inpainting_masks=None,
        mask_blur: float = 4.0,
        replace_diffused: bool = True,
        cache_interval: int = 1,
        mesh=None,
        rules=None,
        prime: bool = False,
        method: str = "ddim",
        verbose: bool = False,
    ) -> jax.Array:
        """Text -> images as ONE compiled program (lax.scan over the
        schedule). Functional replacement for the reference's host-side
        generator loop (:384-491), including img2img (`init_images` +
        `from_index`), RePaint resampling (`n_resample`), and inpainting
        (`inpainting_masks` with the inpainting checkpoint;
        `replace_diffused` re-injects the known region each step,
        reference :477-484).

        `method="dpm++"` swaps the DDIM update for DPM-Solver++(2M)
        (predictions/dpm_solver.py): same one-model-eval-per-step cost,
        ~20 steps for 50-step-DDIM quality. Deterministic — incompatible
        with `eta>0` and `n_resample`.

        `cache_interval > 1` enables OPT-IN DeepCache-style block caching
        (arXiv:2312.03209): the UNet's deep U is recomputed every
        `cache_interval`-th step and reused (shallow level only) in
        between — ~k-fold fewer deep-block FLOPs at a small, bounded
        quality cost. The default (1) is exact. Incompatible with
        n_resample (each RePaint inner eval would need its own refresh).

        `mesh`/`rules` shard the whole sampling scan over a device mesh:
        UNet/VAE/text params partitioned by the tensor-parallel rules
        (parallel/partition.py defaults when `rules=None`), the latent
        batch over the data axis (when divisible; replicated otherwise).
        Single-device behavior is unchanged when mesh is None."""
        if method not in ("ddim", "dpm++"):
            raise ValueError(f"unknown sampling method: {method!r}")
        if method == "dpm++" and (eta or n_resample):
            raise ValueError(
                "dpm++ is deterministic: eta/n_resample do not apply"
            )
        key = key if key is not None else jax.random.PRNGKey(0)
        texts = list(texts)
        uncond = self.conditioning(
            list(negative_texts) if negative_texts else [""] * len(texts),
            inpainting_masks=inpainting_masks,
            inpainting_images=init_images,
            mask_blur=mask_blur,
        )
        cond = self.conditioning(
            texts,
            inpainting_masks=inpainting_masks,
            inpainting_images=init_images,
            mask_blur=mask_blur,
        )
        pairs = jnp.asarray(
            self.schedule_indices(
                n_steps, from_index=from_index, to_index=to_index
            )
        )
        init_key, scan_key = jax.random.split(key)
        if init_images is None:
            if from_index != 999:
                raise ValueError(
                    "init_images must be provided if from_index < 999"
                )
            latents = self.random_diffused_latents(
                (len(texts), *size), init_key
            )
            init_latents = None
        else:
            init_latents = self.encode_fn(
                self.params, jnp.asarray(init_images, jnp.float32)
            )
            latents = self.diffuse_latents(
                init_latents, int(pairs[0, 0]), init_key
            )
        params = self.params
        if mesh is not None:
            from perceptor_tpu import parallel

            params = parallel.shard_params(
                params, mesh, **({} if rules is None else {"rules": rules})
            )
        out = self._sample_scan(
            params, latents, pairs, uncond, cond, guidance_scale, eta,
            scan_key, n_resample=n_resample, init_latents=init_latents,
            replace_diffused=replace_diffused, cache_interval=cache_interval,
            mesh=mesh, prime=prime, method=method, verbose=verbose,
        )
        if prime:
            # compile (and warm) the decode program for this latent shape
            self.decode_fn(params, latents)
            return None
        return self.decode_fn(params, out)

    def _sample_scan(
        self, params, latents, pairs, uncond, cond, guidance_scale, eta, key,
        n_resample: int = 0, init_latents=None, replace_diffused: bool = False,
        cache_interval: int = 1, mesh=None, prime: bool = False,
        method: str = "ddim", verbose: bool = False,
    ):
        if cache_interval > 1 and n_resample > 0:
            raise ValueError("cache_interval and n_resample are incompatible")
        stochastic = float(eta) > 0.0
        is_cond_obj = isinstance(cond, Conditioning)
        context2 = jnp.concatenate(
            [
                uncond.encodings if is_cond_obj else uncond,
                cond.encodings if is_cond_obj else cond,
            ]
        )
        cond2 = Conditioning(
            self.name,
            context2,
            cond.inpainting_latent_masks if is_cond_obj else None,
            cond.inpainting_latents if is_cond_obj else None,
        )
        masks = cond.inpainting_latent_masks if is_cond_obj else None
        do_replace = bool(
            replace_diffused and masks is not None and init_latents is not None
        )
        if init_latents is None:
            init_latents = jnp.zeros_like(latents)

        plan = None
        if mesh is not None:
            from jax.sharding import NamedSharding
            from perceptor_tpu import parallel

            plan = parallel.plan_for_mesh(mesh)
            if plan is not None and latents.shape[2] % plan.n_context == 0:
                # context-parallel: latents sharded over H (and batch over
                # data when divisible) — the UNet's shard_spatial keeps
                # this layout through the scan
                spatial = NamedSharding(
                    mesh, plan.spatial_spec(4, 2, latents.shape[0])
                )
                latents = jax.device_put(latents, spatial)
                init_latents = jax.device_put(init_latents, spatial)
            elif latents.shape[0] % mesh.shape[parallel.AXIS_DATA] == 0:
                latents = parallel.shard_batch(latents, mesh)
                init_latents = parallel.shard_batch(init_latents, mesh)
            else:
                latents = parallel.replicate(latents, mesh)
                init_latents = parallel.replicate(init_latents, mesh)
            pairs = parallel.replicate(pairs, mesh)
            cond2 = parallel.replicate(cond2, mesh)
            key = parallel.replicate(key, mesh)

        run_args = (
            params, latents, pairs, cond2, init_latents, key,
            jnp.float32(guidance_scale), jnp.float32(eta),
            int(n_resample), do_replace, int(cache_interval), stochastic,
            str(method),
        )
        from contextlib import nullcontext

        from perceptor_tpu.parallel.plan import context_parallel, record_routing

        if verbose:
            # routing decisions are made at TRACE time: a memoized run that
            # already compiled would be a silent jit-cache hit, so build a
            # fresh program (the persistent compile cache still absorbs the
            # XLA cost — only tracing repeats)
            run = self._build_sample_run()
            recorder = record_routing()
        else:
            run = self._get_sample_run(plan)
            recorder = nullcontext()

        with (
            context_parallel(plan) if plan is not None else nullcontext()
        ), recorder as report:
            if prime:
                # AOT: trace + compile (persisting into the jax compilation
                # cache) without executing — first-use latency is a choice.
                # The executable is retained for inspection
                # (last_compiled.as_text() -> utils/hlo collective guard).
                self.last_compiled = run.lower(*run_args).compile()
                out = None
            else:
                out = run(*run_args)
        if verbose:
            self.last_routing_report = report
            print(report.summary())
        return out

    def _get_sample_run(self, plan=None):
        """ONE jitted sampling-scan program per model instance AND
        context-parallel plan: the static options ride as static_argnums,
        so jax's own jit cache keys the compiled executables — no
        per-config wrapper bookkeeping (defining `run` fresh per call
        would miss that cache and re-trace). The plan must key separately
        because routing happens at trace time (parallel/plan.py)."""
        runs = self.__dict__.setdefault("_sample_runs", {})
        if plan not in runs:
            runs[plan] = self._build_sample_run()
        return runs[plan]

    def _build_sample_run(self):
        """The jitted sampling-scan program. Generic over everything but
        the module/schedule (statics ride as trailing args); shared by
        `sample()` and `export_sample()`."""
        import functools

        @functools.partial(jax.jit, static_argnums=(8, 9, 10, 11, 12))
        def run(params, latents, pairs, cond2, init_latents, key,
                guidance_scale, eta, n_resample, do_replace, cache_interval,
                stochastic, method="ddim"):
            n = latents.shape[0]

            def unet2(lat2, ts2, cache, use_cache):
                """Batched-CFG UNet eval, optionally through the DeepCache
                partial path (unet.py __call__ docstring)."""
                apply = functools.partial(
                    self.unet.apply, {"params": params["unet"]},
                    lat2, ts2, cond2.encodings,
                )
                if cache_interval <= 1:
                    return apply(), cache  # cache rides through untouched

                def full(c):
                    return apply(return_cache=True)

                def partial_pass(c):
                    return apply(cache=c), c

                return jax.lax.cond(use_cache, partial_pass, full, cache)

            def cfg_predictions(latents, from_idx, cache=None, use_cache=None):
                # CFG pair in one batched UNet call
                lat2 = jnp.concatenate([latents, latents])
                noise2, cache = unet2(
                    cond2.input(lat2),
                    jnp.concatenate([from_idx, from_idx]),
                    cache,
                    use_cache,
                )
                noise_uncond, noise_cond = jnp.split(noise2, 2)

                def make(noise):
                    return LatentIndexedEpsPredictions(
                        from_diffused_latents=latents,
                        from_indices=from_idx,
                        predicted_noise=noise,
                        schedule_alphas=self.schedule_alphas,
                        schedule_sigmas=self.schedule_sigmas,
                    )

                cfg = make(noise_uncond).classifier_free_guidance(
                    make(noise_cond), guidance_scale
                )
                return cfg, cache

            def body(carry, step_input):
                if method == "dpm++":
                    latents, prev_x0, prev_h, cache, key = carry
                else:
                    latents, cache, key = carry
                i, pair = step_input
                from_idx = jnp.broadcast_to(pair[0], (n,))
                to_idx = jnp.broadcast_to(pair[1], (n,))
                for _ in range(n_resample):  # RePaint (reference :443-459)
                    key, resample_key = jax.random.split(key)
                    predictions, _ = cfg_predictions(latents, from_idx)
                    latents = predictions.resample(to_idx, key=resample_key)
                use_cache = (
                    (i % cache_interval) != 0 if cache_interval > 1 else None
                )
                predictions, cache = cfg_predictions(
                    latents, from_idx, cache, use_cache
                )
                key, step_key = jax.random.split(key)
                if method == "dpm++":
                    latents, prev_h = predictions.dpm_solver_pp_step(
                        to_idx, prev_x0, prev_h, i == 0
                    )
                    prev_x0 = predictions.denoised_xs
                elif stochastic:
                    latents = predictions.step(to_idx, eta=eta, key=step_key)
                else:
                    latents = predictions.step(to_idx)
                if do_replace:  # re-inject the known region (:477-484)
                    key, noise_key = jax.random.split(key)
                    alphas = self.schedule_alphas[to_idx][:, None, None, None]
                    sigmas = self.schedule_sigmas[to_idx][:, None, None, None]
                    fresh = jax.random.normal(
                        noise_key, latents.shape, latents.dtype
                    )
                    diffused_init = init_latents * alphas + fresh * sigmas
                    m = cond2.inpainting_latent_masks
                    latents = diffused_init * (1 - m) + latents * m
                if method == "dpm++":
                    return (latents, prev_x0, prev_h, cache, key), None
                return (latents, cache, key), None

            if cache_interval > 1:
                # cache slot initialized to zeros of the deep-feature shape
                # (step 0 always runs the full path and overwrites it)
                lat2 = jnp.concatenate([latents, latents])
                ts2 = jnp.zeros((2 * n,))
                _, cache_shape = jax.eval_shape(
                    lambda l, t: self.unet.apply(
                        {"params": params["unet"]}, cond2.input(l), t,
                        cond2.encodings, return_cache=True,
                    ),
                    lat2, ts2,
                )
                cache0 = jnp.zeros(cache_shape.shape, cache_shape.dtype)
            else:
                cache0 = jnp.zeros(())

            if method == "dpm++":
                carry0 = (
                    latents,
                    jnp.zeros_like(latents),
                    jnp.ones((n, 1, 1, 1), latents.dtype),
                    cache0,
                    key,
                )
                (latents, *_), _ = jax.lax.scan(
                    body, carry0, (jnp.arange(pairs.shape[0]), pairs)
                )
                return latents
            (latents, _, _), _ = jax.lax.scan(
                body, (latents, cache0, key),
                (jnp.arange(pairs.shape[0]), pairs),
            )
            return latents

        return run

    def prime(self, sizes=((512, 512),), n_steps: int = 50, **kwargs) -> None:
        """AOT-compile `sample()` for the given image sizes/options so the
        first real call is compile-free (see docs/PERFORMANCE.md "Compile
        times"). kwargs are forwarded to sample() and must match the
        static options of the later calls (eta/n_resample/cache_interval)."""
        for size in sizes:
            self.sample([""], n_steps=n_steps, size=size, prime=True, **kwargs)

    def export_sample(
        self,
        batch: int = 1,
        size: Tuple[int, int] = (512, 512),
        n_steps: int = 50,
        from_index: int = 999,
        to_index: int = 0,
        eta: float = 0.0,
        n_resample: int = 0,
        cache_interval: int = 1,
        platforms=None,
        method: str = "ddim",
    ) -> bytes:
        """Serialize the full text2image program (CFG sampling scan + VAE
        decode as ONE function) as a portable ``jax.export`` artifact.

        The returned program's signature is
        ``(params, context2, diffused_latents, key, guidance_scale) ->
        images``, where ``context2`` is the stacked
        ``[negative, positive]`` text-encoder states of shape
        ``(2*batch, context_length, context_dim)`` (produce them with the
        exported conditioning program or ``model.conditioning``) and
        ``diffused_latents`` is ``(batch, C, H/8, W/8)`` noise from
        ``random_diffused_latents``. The schedule (``n_steps`` rho-spaced
        indices) is baked in as a constant; weights are an argument.
        Load with ``utils.serving.load_program``. See utils/serving.py for
        why this beats the persistent compilation cache for deployment.
        """
        self._check_size(size)
        if cache_interval > 1 and n_resample > 0:
            raise ValueError("cache_interval and n_resample are incompatible")
        if method not in ("ddim", "dpm++"):
            raise ValueError(f"unknown sampling method: {method!r}")
        if method == "dpm++" and (eta or n_resample):
            raise ValueError(
                "dpm++ is deterministic: eta/n_resample do not apply"
            )
        pairs = jnp.asarray(
            self.schedule_indices(
                n_steps, from_index=from_index, to_index=to_index
            )
        )
        stochastic = float(eta) > 0.0
        run = self._get_sample_run()

        def serve(params, context2, latents, key, guidance_scale):
            cond2 = Conditioning(self.name, context2)
            out = run(
                params, latents, pairs, cond2, jnp.zeros_like(latents), key,
                guidance_scale, jnp.float32(eta), int(n_resample), False,
                int(cache_interval), stochastic, str(method),
            )
            return self.decode_fn(params, out)

        down = self.vae_config.downscale
        latent_size = (size[0] // down, size[1] // down)
        example = (
            self.params,
            jnp.zeros(
                (
                    2 * batch,
                    self.text_config.context_length,
                    self.unet_config.context_dim,
                ),
                jnp.float32,
            ),
            jnp.zeros(
                (batch, self.vae_config.latent_channels, *latent_size),
                jnp.float32,
            ),
            jax.random.PRNGKey(0),
            jnp.float32(7.0),
        )
        from perceptor_tpu.utils import serving

        return serving.serialize_program(serve, *example, platforms=platforms)

    def export_conditioning(self, batch: int = 1, platforms=None) -> bytes:
        """Serialize the text-conditioning program
        ``(params, tokens) -> encoder states`` for ``2*batch`` prompts
        (the uncond/cond stack `export_sample` consumes). Tokenize on the
        host with ``models.clip.tokenizer.tokenize``."""
        def serve(params, tokens):
            return self.text_encoder.apply(
                {"params": params["text_encoder"]}, tokens
            )

        example = (
            self.params,
            jnp.zeros(
                (2 * batch, self.text_config.context_length), jnp.int32
            ),
        )
        from perceptor_tpu.utils import serving

        return serving.serialize_program(serve, *example, platforms=platforms)

    def sample_iter(
        self,
        texts: Sequence[str],
        negative_texts: Optional[Sequence[str]] = None,
        n_steps: int = 50,
        guidance_scale: float = 7.0,
        size: Tuple[int, int] = (512, 512),
        key=None,
    ):
        """Generator yielding predictions per step (reference generator
        semantics, :384-491) — for callbacks/preview; sample() is faster."""
        key = key if key is not None else jax.random.PRNGKey(0)
        texts = list(texts)
        uncond = self.conditioning(
            list(negative_texts) if negative_texts else [""] * len(texts)
        )
        cond = self.conditioning(texts)
        pairs = self.schedule_indices(n_steps)
        key, init_key = jax.random.split(key)
        latents = self.random_diffused_latents((len(texts), *size), init_key)
        for from_index, to_index in pairs:
            uncond_pred = self.predictions(latents, int(from_index), uncond)
            cond_pred = self.predictions(latents, int(from_index), cond)
            cfg = uncond_pred.classifier_free_guidance(cond_pred, guidance_scale)
            latents = cfg.step(int(to_index))
            yield cfg
