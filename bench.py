"""Headline benchmark: CLIP-guided StableDiffusion denoise steps/sec/chip at 512px.

The BASELINE.json metric: one *fused guided denoise step* = UNet forward
+ VAE decode + CLIP (ViT-B-32) loss + VJP back through all of it + guided()
+ DDIM step, compiled as ONE XLA program (SURVEY §3.3 is the reference call
stack this fuses). Weights are random-init (zero-egress environment) —
identical FLOPs/memory to pretrained.

Baseline: the target is >=5 steps/s/chip == >=3x an A100 running the
PyTorch reference (BASELINE.md), i.e. the implied reference throughput is
5/3 steps/s; `vs_baseline` reports value / (5/3).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: repeated bench runs skip the ~10min compile
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

QUICK = os.environ.get("BENCH_QUICK", "") == "1"


def _parse_mesh_arg(argv):
    """`--mesh DxT` -> (data, tensor) or None. "1x1" runs single-chip
    unchanged; anything larger needs that many attached devices (turnkey
    for real multi-chip hardware; sharding correctness is covered by the
    virtual-mesh tests + dryrun_multichip)."""
    for i, arg in enumerate(argv):
        if arg == "--mesh" and i + 1 < len(argv):
            d, t = argv[i + 1].lower().split("x")
            return int(d), int(t)
        if arg.startswith("--mesh="):
            d, t = arg.split("=", 1)[1].lower().split("x")
            return int(d), int(t)
    return None


def build(mesh_spec=None):
    from perceptor_tpu.core.init import init_by_shape
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

    if QUICK:
        unet_cfg, vae_cfg = sd_config.TINY_UNET, sd_config.TINY_VAE
        size = 64
    else:
        unet_cfg, vae_cfg = sd_config.SD_V1_UNET, sd_config.SD_V1_VAE
        size = 512
    latent_size = size // vae_cfg.downscale

    unet = UNet(unet_cfg, dtype=jnp.bfloat16)
    vae = AutoencoderKL(vae_cfg, dtype=jnp.bfloat16)
    clip_config = clip_configs.get_config("ViT-B-32", "openai")
    clip = CLIPModule(clip_config, dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    latents = jax.random.normal(key, (1, unet_cfg.in_channels, latent_size, latent_size))
    context = jax.random.normal(
        jax.random.PRNGKey(1), (1, 77, unet_cfg.context_dim)
    )
    unet_params = init_by_shape(
        unet.init, key, latents, jnp.zeros((1,)), context
    )["params"]
    vae_params = init_by_shape(vae.init, key, jnp.zeros((1, 3, size, size)))["params"]
    clip_params = init_by_shape(
        clip.init,
        key,
        jnp.zeros((1, 3, *clip_config.image_size)),
        jnp.zeros((1, clip_config.context_length), jnp.int32),
    )["params"]

    # bf16 weight STORAGE (the compute path already casts to bf16): halves
    # the ~8 GB/step of weight HBM reads in the fused step
    from perceptor_tpu.core.dtypes import cast_matmul_params_bf16

    unet_params = cast_matmul_params_bf16(unet_params)
    vae_params = cast_matmul_params_bf16(vae_params)
    clip_params = cast_matmul_params_bf16(clip_params)

    import numpy as np

    # closure constants stay HOST-side (numpy): a closed-over DEVICE array
    # must be fetched back through the axon tunnel when .lower() serializes
    # it as an MLIR constant — measured 7-150 s for the FIRST fetch of a
    # process (scripts/compile_split.py findings, docs/PERFORMANCE.md
    # "Compile times"). Host constants serialize from RAM for free.
    alphas, sigmas = scaled_linear_alphas_sigmas()
    alphas, sigmas = np.asarray(alphas), np.asarray(sigmas)
    target = np.random.default_rng(2).normal(size=(1, clip_config.embed_dim))
    target = (target / np.linalg.norm(target, axis=-1, keepdims=True)).astype(
        np.float32
    )
    mean = np.asarray(CLIP_MEAN, np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(CLIP_STD, np.float32).reshape(1, 3, 1, 1)

    from_idx = np.array([800])
    to_idx = np.array([780])

    def clip_loss(clip_params, images):
        images = resize(images, out_shape=clip_config.image_size)
        images = (images - mean) / std
        encodings = clip.apply(
            {"params": clip_params}, images, method=CLIPModule.encode_image
        )
        encodings = encodings / jnp.maximum(
            jnp.linalg.norm(encodings, axis=-1, keepdims=True), 1e-12
        )
        return spherical_distance_squared(encodings, target).mean()

    def make_predictions(latents, noise):
        return LatentIndexedEpsPredictions(
            from_diffused_latents=latents,
            from_indices=from_idx,
            predicted_noise=noise,
            schedule_alphas=alphas,
            schedule_sigmas=sigmas,
        )

    @jax.jit
    def guided_denoise_step(unet_params, vae_params, clip_params, latents, context):
        def loss_fn(latents):
            noise = unet.apply({"params": unet_params}, latents, from_idx * 1.0, context)
            predictions = make_predictions(latents, noise)
            images = vae.apply(
                {"params": vae_params},
                predictions.denoised_xs,
                method="decode",
            )
            return clip_loss(clip_params, images), noise

        (loss, noise), grads = jax.value_and_grad(loss_fn, has_aux=True)(latents)
        predictions = make_predictions(latents, noise)
        stepped = predictions.guided(grads, guidance_scale=0.5).step(to_idx)
        return stepped, loss

    from functools import partial

    @partial(jax.jit, static_argnums=(5,))
    def guided_denoise_scan(unet_params, vae_params, clip_params, latents, context, n):
        """n guided steps as ONE program (lax.scan): zero per-step host
        dispatch, the honest end-to-end sampler shape (engine.guided_sample)."""

        def body(latents, _):
            stepped, loss = guided_denoise_step(
                unet_params, vae_params, clip_params, latents, context
            )
            return stepped, loss

        return jax.lax.scan(body, latents, None, length=n)

    params = (unet_params, vae_params, clip_params)
    if mesh_spec is not None and mesh_spec != (1, 1):
        from perceptor_tpu import parallel

        data, tensor = mesh_spec
        mesh = parallel.create_mesh(
            data=data, tensor=tensor, devices=jax.devices()[: data * tensor]
        )
        unet_params, vae_params, clip_params = (
            parallel.shard_params(p, mesh) for p in params
        )
        params = (unet_params, vae_params, clip_params)
        if latents.shape[0] % data == 0:
            latents = parallel.shard_batch(latents, mesh)
            context = parallel.shard_batch(context, mesh)
        else:
            latents = parallel.replicate(latents, mesh)
            context = parallel.replicate(context, mesh)
    return guided_denoise_step, guided_denoise_scan, params, latents, context


def _parse_family_arg(argv):
    for i, arg in enumerate(argv):
        if arg == "--family" and i + 1 < len(argv):
            return argv[i + 1]
        if arg.startswith("--family="):
            return arg.split("=", 1)[1]
    return None


def main():
    family = _parse_family_arg(sys.argv[1:])
    if family is not None:
        # per-family fused-sampler / guided-config benchmarks
        # (docs/PERFORMANCE.md "Per-family throughput")
        import bench_families

        bench_families.main(
            family, quick=QUICK, mfu="--mfu" in sys.argv[1:]
        )
        return
    mesh_spec = _parse_mesh_arg(sys.argv[1:])
    step, scan, (unet_params, vae_params, clip_params), latents, context = build(
        mesh_spec
    )

    if "--prime" in sys.argv[1:]:
        # AOT-compile the bench programs into the persistent cache and
        # exit: first-use latency becomes a choice, not a surprise
        # (docs/PERFORMANCE.md "Compile times").
        n = 3 if QUICK else 30
        t0 = time.time()
        step.lower(unet_params, vae_params, clip_params, latents, context).compile()
        scan.lower(
            unet_params, vae_params, clip_params, latents, context, n
        ).compile()
        print(
            json.dumps({"primed": True, "compile_s": round(time.time() - t0, 1)})
        )
        return

    # the FIRST device->host fetch of a process pays a one-time tunnel
    # transfer-path warmup (7-90 s measured, docs/PERFORMANCE.md "Round-3
    # cold-start diagnosis"); pay it here on 4 floats so the compile and
    # throughput numbers below measure the program, not the transport.
    # Its measured cost is recorded in the emitted env dict.
    from perceptor_tpu.utils.bench_env import bench_env, cache_snapshot

    t0 = time.time()
    _ = float(jnp.sum(latents[0, 0, 0, :4]))
    warmup_s = time.time() - t0

    # 30 steps: long enough that the fixed per-dispatch RPC overhead of the
    # remote-TPU tunnel (~46 ms, docs/PERFORMANCE.md "MFU") is <2% of the
    # measurement, i.e. the number reflects the device rate
    n = 3 if QUICK else 30
    # compile + warmup (one scanned program covering all n steps)
    cache_before = cache_snapshot()
    t0 = time.time()
    out, losses = scan(unet_params, vae_params, clip_params, latents, context, n)
    _ = float(jnp.sum(out))
    compile_s = time.time() - t0
    cache_after = cache_snapshot()

    t0 = time.time()
    out, losses = scan(unet_params, vae_params, clip_params, latents, context, n)
    # hard sync: host readback (block_until_ready can be a no-op through the
    # axon tunnel); the scan's data dependencies force all n steps to finish
    _ = float(jnp.sum(out))
    elapsed = time.time() - t0
    loss = losses[-1]

    steps_per_sec = n / elapsed
    baseline = 5.0 / 3.0  # implied A100 reference throughput (BASELINE.md)
    label = (
        "guided denoise steps/sec/chip, TINY config (BENCH_QUICK dev mode)"
        if QUICK
        else "guided denoise steps/sec/chip, 512px SD + CLIP ViT-B-32"
    )
    result = {
        "metric": label,
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec/chip",
        "vs_baseline": round(steps_per_sec / baseline, 3),
        # self-describing conditions (VERDICT r4 #3): the r4 headline
        # drifted 5% with no way to classify why; now every artifact
        # carries its regime (host load, contending procs, compile-cache
        # hit/miss, measured tunnel warmup, compile + steady timings)
        "compile_s": round(compile_s, 1),
        "steady_s": round(elapsed, 2),
        "n_steps": n,
        "env": bench_env(cache_before, cache_after, warmup_s),
    }
    print(json.dumps(result))
    print(
        f"# compile {compile_s:.1f}s; {n} steps in {elapsed:.2f}s; "
        f"loss finite: {bool(jnp.isfinite(loss))}",
        file=sys.stderr,
    )
    if "--mfu" in sys.argv[1:]:
        # model FLOPs (attention re-traced on the XLA route): a plain
        # TPU trace hides the flash kernels' matmuls while counting
        # their lane padding — the round-4 6.47-vs-6.825 TF artifact
        # (docs/PERFORMANCE.md "MFU counter reconciliation")
        from perceptor_tpu.utils.flops import count_model_flops, mfu

        total = count_model_flops(
            lambda: scan(unet_params, vae_params, clip_params, latents,
                         context, n)
        )
        print(
            f"# counted {total / n / 1e12:.2f} TF/step, "
            f"MFU {100 * mfu(total, elapsed):.1f}% (v5e bf16 peak 197 TF/s)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    try:
        main()
    except Exception:
        # One retry: the remote-TPU tunnel occasionally drops a connection
        # mid-compile, and a transient failure here would lose the round's
        # recorded metric. A real regression fails twice and still surfaces.
        import traceback

        print("# bench attempt 1 failed, retrying once:", file=sys.stderr)
        traceback.print_exc()
        main()
