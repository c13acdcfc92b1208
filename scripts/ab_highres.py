"""A/B probe: the fused guided step above 512px (768/1024) on one chip.

The torch reference cannot run CLIP-guided SD at 1024px on a 24 GB GPU
without attention slicing (reference stable_diffusion.py:102-106 exists
precisely because of this); the TPU build's flash attention + fused
GroupNorm keep the working set small enough to run the full fused step
(UNet fwd + VAE decode + CLIP + VJP through all of it) unsliced.

Usage: python scripts/ab_highres.py [size ...]   (default: 768 1024)
Prints ms/step, steps/s, and peak HBM per size.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def build(size: int, unet_remat: bool = False, batch: int = 1):
    from perceptor_tpu.core.init import init_by_shape
    from perceptor_tpu.core.dtypes import cast_matmul_params_bf16
    from perceptor_tpu.models.stable_diffusion import (
        AutoencoderKL,
        UNet,
        config as sd_config,
    )
    from perceptor_tpu.models.clip import configs as clip_configs
    from perceptor_tpu.models.clip.model import CLIP as CLIPModule
    from perceptor_tpu.ops.resize import resize
    from perceptor_tpu.models.open_clip import CLIP_MEAN, CLIP_STD
    from perceptor_tpu.losses.prompt_bank import spherical_distance_squared
    from perceptor_tpu.predictions import LatentIndexedEpsPredictions
    from perceptor_tpu.schedules import scaled_linear_alphas_sigmas
    import dataclasses

    unet_cfg = sd_config.SD_V1_UNET
    if unet_remat:
        unet_cfg = dataclasses.replace(unet_cfg, remat=True)
    vae_cfg = sd_config.SD_V1_VAE
    latent_size = size // vae_cfg.downscale

    unet = UNet(unet_cfg, dtype=jnp.bfloat16)
    vae = AutoencoderKL(vae_cfg, dtype=jnp.bfloat16)
    clip_config = clip_configs.get_config("ViT-B-32", "openai")
    clip = CLIPModule(clip_config, dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    latents = jax.random.normal(
        key, (batch, unet_cfg.in_channels, latent_size, latent_size)
    )
    context = jax.random.normal(
        jax.random.PRNGKey(1), (batch, 77, unet_cfg.context_dim)
    )
    unet_params = init_by_shape(unet.init, key, latents, jnp.zeros((1,)), context)[
        "params"
    ]
    vae_params = init_by_shape(vae.init, key, jnp.zeros((1, 3, 64, 64)))["params"]
    clip_params = init_by_shape(
        clip.init,
        key,
        jnp.zeros((1, 3, *clip_config.image_size)),
        jnp.zeros((1, clip_config.context_length), jnp.int32),
    )["params"]
    unet_params = cast_matmul_params_bf16(unet_params)
    vae_params = cast_matmul_params_bf16(vae_params)
    clip_params = cast_matmul_params_bf16(clip_params)

    alphas, sigmas = scaled_linear_alphas_sigmas()
    alphas, sigmas = jnp.asarray(alphas), jnp.asarray(sigmas)
    target = jax.random.normal(jax.random.PRNGKey(2), (1, clip_config.embed_dim))
    target = target / jnp.linalg.norm(target, axis=-1, keepdims=True)
    mean = jnp.asarray(CLIP_MEAN).reshape(1, 3, 1, 1)
    std = jnp.asarray(CLIP_STD).reshape(1, 3, 1, 1)
    from_idx = jnp.array([800])
    to_idx = jnp.array([780])

    def clip_loss(clip_params, images):
        images = resize(images, out_shape=clip_config.image_size)
        images = (images - mean) / std
        enc = clip.apply({"params": clip_params}, images, method=CLIPModule.encode_image)
        enc = enc / jnp.maximum(jnp.linalg.norm(enc, axis=-1, keepdims=True), 1e-12)
        return spherical_distance_squared(enc, target).mean()

    def make_predictions(latents, noise):
        return LatentIndexedEpsPredictions(
            from_diffused_latents=latents,
            from_indices=from_idx,
            predicted_noise=noise,
            schedule_alphas=alphas,
            schedule_sigmas=sigmas,
        )

    from functools import partial

    @partial(jax.jit, static_argnums=(5,))
    def guided_scan(unet_params, vae_params, clip_params, latents, context, n):
        def body(latents, _):
            def loss_fn(latents):
                noise = unet.apply(
                    {"params": unet_params}, latents, from_idx * 1.0, context
                )
                predictions = make_predictions(latents, noise)
                images = vae.apply(
                    {"params": vae_params}, predictions.denoised_xs, method="decode"
                )
                return clip_loss(clip_params, images), noise

            (loss, noise), grads = jax.value_and_grad(loss_fn, has_aux=True)(latents)
            predictions = make_predictions(latents, noise)
            stepped = predictions.guided(grads, guidance_scale=0.5).step(to_idx)
            return stepped, loss

        return jax.lax.scan(body, latents, None, length=n)

    return guided_scan, (unet_params, vae_params, clip_params), latents, context


def probe(size: int, n: int = 4, unet_remat: bool = False, batch: int = 1,
          mfu: bool = True):
    from perceptor_tpu.utils.profiling import memory_stats

    scan, params, latents, context = build(size, unet_remat, batch)
    t0 = time.time()
    out, losses = scan(*params, latents, context, n)
    _ = float(jnp.sum(out))
    compile_s = time.time() - t0

    t0 = time.time()
    out, losses = scan(*params, latents, context, n)
    _ = float(jnp.sum(out))
    elapsed = time.time() - t0

    mem = {}
    try:
        mem = memory_stats()
    except Exception:
        pass
    peak_bytes = mem.get("peak_bytes_in_use", 0)
    # the axon tunnel's device object reports no memory_stats — print
    # n/a instead of a misleading 0.00
    peak_gb = peak_bytes / 2**30 if peak_bytes else float("nan")
    mfu_txt = ""
    if mfu:
        # counted matmul/conv FLOPs of the exact timed program ->
        # roofline column for the high-res rows (VERDICT r3 next #1)
        from perceptor_tpu.utils import flops as flops_lib

        total = flops_lib.count_flops(
            lambda: scan(*params, latents, context, n)
        )
        pct = 100 * flops_lib.mfu(total, elapsed)
        mfu_txt = (
            f" counted_tflops/step={total / n / 1e12:.2f} mfu={pct:.1f}%"
        )
    print(
        f"size={size} remat={unet_remat}: {elapsed / n * 1e3:.1f} ms/step "
        f"({n / elapsed:.2f} steps/s) compile={compile_s:.0f}s "
        f"peak_hbm={peak_gb:.2f} GiB loss_finite={bool(jnp.isfinite(losses[-1]))}"
        + mfu_txt,
        flush=True,
    )


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [768, 1024]
    remat = "--remat" in sys.argv
    for size in sizes:
        probe(size, unet_remat=remat)
