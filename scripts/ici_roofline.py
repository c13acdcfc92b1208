"""ICI communication roofline: predicted multi-chip scaling (VERDICT r4 #1).

The 1-chip environment cannot *measure* multi-chip step time, but it can
compile the real sharded programs (the same virtual-mesh path CI uses)
and count the per-chip ICI bytes every collective moves
(utils/hlo.program_ici_bytes — ring-algorithm accounting over the
compiled HLO's per-partition shapes). Combined with the measured
single-chip compute time and the v5e ICI link bandwidth this gives a
communication roofline: predicted step time on n chips is

    serial     t(n) = T1/n + B(n)/BW        (no compute/comm overlap)
    overlapped t(n) = max(T1/n, B(n)/BW)    (perfect overlap)

where T1 is the measured single-chip step time, B(n) the per-chip ICI
bytes at mesh size n, and BW the per-direction ICI bandwidth
(v5e: 4 links/chip at ~45 GB/s each way; a 1D mesh axis ring uses one
direction => 45e9 B/s, the conservative figure used here — bidirectional
ring algorithms can reach ~2x).

Programs modeled (the two the multi-chip story rests on):

  cp1024  the 1024px context-parallel guided step — full SD_V1 UNet fwd
          + DDIM algebra + VAE decode + CLIP + VJP through all of it,
          latents spatially sharded over a context axis, attention on
          the ring/Ulysses routes (docs/PERFORMANCE.md:445-452 claims
          this "splits exactly those bytes"; this script prices it)
  tp512   the TP flagship step — the same guided step at 512px with
          Megatron tensor-parallel params over a tensor axis

Usage:
  python scripts/ici_roofline.py [--quick] [--json PATH]

Re-execs itself onto a virtual 8-device CPU host platform when needed
(same idiom as __graft_entry__.dryrun_multichip). Compile-only: nothing
executes, so full-size programs are tractable on the CPU backend.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# measured single-chip anchors (docs/PERFORMANCE.md, round 4, quiet host;
# device-true values with the ~11 ms/step tunnel dispatch removed where
# the 4-step scan measurement carried it)
T1_MS = {"cp1024": 499.0, "tp512": 83.5, "tpunet512": 39.0}
ICI_ONE_WAY_BYTES_PER_S = 45e9  # v5e per-link one-way
MESH_SIZES = (2, 4, 8)


def _ensure_devices(n: int) -> None:
    """Re-exec under a virtual n-device CPU platform if needed.

    The axon sitecustomize force-registers the TPU backend regardless of
    JAX_PLATFORMS, so the child marks itself with ICI_ROOFLINE_CHILD and
    forces the CPU platform via jax.config (the only override that
    sticks) instead of re-checking device_count — re-exec loops
    otherwise."""
    import jax

    if os.environ.get("ICI_ROOFLINE_CHILD"):
        jax.config.update("jax_platforms", "cpu")
        if jax.device_count() < n:
            raise SystemExit(
                f"child has {jax.device_count()} devices, need {n}"
            )
        return
    if jax.device_count() >= n and jax.devices()[0].platform == "cpu":
        return
    env = dict(os.environ)
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={n}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_PLATFORMS"] = "cpu"
    env["ICI_ROOFLINE_CHILD"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), *sys.argv[1:]],
        env=env,
        cwd=_REPO,
    )
    sys.exit(proc.returncode)


def _build_nets(quick: bool):
    import jax
    import jax.numpy as jnp

    from perceptor_tpu.core.dtypes import cast_matmul_params_bf16
    from perceptor_tpu.core.init import init_by_shape
    from perceptor_tpu.losses.prompt_bank import spherical_distance_squared
    from perceptor_tpu.models.clip import configs as clip_configs
    from perceptor_tpu.models.clip.model import CLIP as CLIPModule
    from perceptor_tpu.models.open_clip import CLIP_MEAN, CLIP_STD
    from perceptor_tpu.models.stable_diffusion import (
        AutoencoderKL,
        UNet,
        config as sd_config,
    )
    from perceptor_tpu.ops.resize import resize
    from perceptor_tpu.predictions import LatentIndexedEpsPredictions
    from perceptor_tpu.schedules import scaled_linear_alphas_sigmas
    import numpy as np

    if quick:
        unet_cfg, vae_cfg = sd_config.TINY_UNET, sd_config.TINY_VAE
        clip_name = "ViT-B-32"
    else:
        unet_cfg, vae_cfg = sd_config.SD_V1_UNET, sd_config.SD_V1_VAE
        clip_name = "ViT-B-32"
    clip_cfg = clip_configs.get_config(clip_name, "openai")

    unet = UNet(unet_cfg, dtype=jnp.bfloat16)
    vae = AutoencoderKL(vae_cfg, dtype=jnp.bfloat16)
    clip = CLIPModule(clip_cfg, dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    # init probe: large enough for the UNet's full down/up path
    # (4x4 latents break the level-3 skip concat)
    probe = max(16, 512 // vae_cfg.downscale // 8)
    latents0 = jnp.zeros((1, unet_cfg.in_channels, probe, probe))
    ctx0 = jnp.zeros((1, 77, unet_cfg.context_dim))
    unet_params = init_by_shape(
        unet.init, key, latents0, jnp.zeros((1,)), ctx0
    )["params"]
    vae_params = init_by_shape(vae.init, key, jnp.zeros((1, 3, 32, 32)))["params"]
    clip_params = init_by_shape(
        clip.init,
        key,
        jnp.zeros((1, 3, *clip_cfg.image_size)),
        jnp.zeros((1, clip_cfg.context_length), jnp.int32),
    )["params"]
    unet_params = cast_matmul_params_bf16(unet_params)
    vae_params = cast_matmul_params_bf16(vae_params)
    clip_params = cast_matmul_params_bf16(clip_params)

    alphas, sigmas = scaled_linear_alphas_sigmas()
    alphas, sigmas = np.asarray(alphas), np.asarray(sigmas)
    target = np.random.default_rng(2).normal(size=(1, clip_cfg.embed_dim))
    target = (target / np.linalg.norm(target, axis=-1, keepdims=True)).astype(
        np.float32
    )
    mean = np.asarray(CLIP_MEAN, np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(CLIP_STD, np.float32).reshape(1, 3, 1, 1)
    from_idx = np.array([800])
    to_idx = np.array([780])

    def guided_step_factory():
        def guided_step(unet_params, vae_params, clip_params, latents, context):
            def make_predictions(latents, noise):
                return LatentIndexedEpsPredictions(
                    from_diffused_latents=latents,
                    from_indices=from_idx,
                    predicted_noise=noise,
                    schedule_alphas=alphas,
                    schedule_sigmas=sigmas,
                )

            def loss_fn(latents):
                noise = unet.apply(
                    {"params": unet_params}, latents, from_idx * 1.0, context
                )
                predictions = make_predictions(latents, noise)
                images = vae.apply(
                    {"params": vae_params},
                    predictions.denoised_xs,
                    method="decode",
                )
                images = resize(images, out_shape=clip_cfg.image_size)
                images = (images - mean) / std
                enc = clip.apply(
                    {"params": clip_params}, images,
                    method=CLIPModule.encode_image,
                )
                enc = enc / jnp.maximum(
                    jnp.linalg.norm(enc, axis=-1, keepdims=True), 1e-12
                )
                return spherical_distance_squared(enc, target).mean(), noise

            import jax as _jax

            (loss, noise), grads = _jax.value_and_grad(
                loss_fn, has_aux=True
            )(latents)
            predictions = make_predictions(latents, noise)
            stepped = predictions.guided(grads, guidance_scale=0.5).step(to_idx)
            return stepped, loss

        return guided_step

    return {
        "unet_cfg": unet_cfg,
        "vae_cfg": vae_cfg,
        "params": (unet_params, vae_params, clip_params),
        "guided_step": guided_step_factory(),
    }


def _compile_cp(nets, n: int, size: int):
    """Context-parallel guided step at `size`px on a 1 x n context mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from perceptor_tpu import parallel

    mesh = parallel.create_mesh(
        data=1, context=n, devices=jax.devices()[:n]
    )
    plan = parallel.plan_for_mesh(mesh)
    latent = size // nets["vae_cfg"].downscale
    lat = jnp.zeros((1, nets["unet_cfg"].in_channels, latent, latent))
    ctx = jnp.zeros((1, 77, nets["unet_cfg"].context_dim))
    spatial = NamedSharding(mesh, plan.spatial_spec(4, 2, 1))
    lat = jax.device_put(lat, spatial)
    params = tuple(parallel.replicate(p, mesh) for p in nets["params"])
    step = nets["guided_step"]

    with parallel.context_parallel(mesh):
        lowered = jax.jit(
            lambda la, c: step(*params, la, c)
        ).lower(lat, ctx)
        return lowered.compile().as_text()


def _compile_tp(nets, n: int, size: int):
    """Tensor-parallel guided step at `size`px on a 1 x n tensor mesh."""
    import jax
    import jax.numpy as jnp

    from perceptor_tpu import parallel

    mesh = parallel.create_mesh(
        data=1, tensor=n, devices=jax.devices()[:n]
    )
    latent = size // nets["vae_cfg"].downscale
    lat = jnp.zeros((1, nets["unet_cfg"].in_channels, latent, latent))
    ctx = jnp.zeros((1, 77, nets["unet_cfg"].context_dim))
    params = tuple(parallel.shard_params(p, mesh) for p in nets["params"])
    lat = parallel.replicate(lat, mesh)
    ctx = parallel.replicate(ctx, mesh)
    step = nets["guided_step"]

    # params MUST be jit ARGUMENTS: a closed-over sharded tree is a
    # compile-time constant GSPMD may simply replicate (measured: zero
    # collectives in the lowered program — the exact lost-input-sharding
    # failure class test_collective_bytes' teeth test guards).
    lowered = jax.jit(step).lower(*params, lat, ctx)
    return lowered.compile().as_text()


def _compile_tp_unet(nets, n: int, size: int):
    """UNet-only fwd+input-VJP under Megatron TP — the component the
    TP rules actually target (the full-step row prices the conv-heavy
    VAE/CLIP tail under TP, which is the documented anti-pattern)."""
    import jax
    import jax.numpy as jnp

    from perceptor_tpu import parallel
    from perceptor_tpu.models.stable_diffusion import UNet

    mesh = parallel.create_mesh(
        data=1, tensor=n, devices=jax.devices()[:n]
    )
    unet_cfg = nets["unet_cfg"]
    unet = UNet(unet_cfg, dtype=jnp.bfloat16)
    latent = size // nets["vae_cfg"].downscale
    lat = jnp.zeros((1, unet_cfg.in_channels, latent, latent))
    ctx = jnp.zeros((1, 77, unet_cfg.context_dim))
    params = parallel.shard_params(nets["params"][0], mesh)
    lat = parallel.replicate(lat, mesh)
    ctx = parallel.replicate(ctx, mesh)

    def loss(p, x, c):
        return (unet.apply({"params": p}, x, jnp.full((1,), 800.0), c) ** 2).mean()

    lowered = jax.jit(jax.grad(loss, argnums=1)).lower(params, lat, ctx)
    return lowered.compile().as_text()


def _roofline_row(label: str, n: int, bytes_by_op: dict, t1_ms: float):
    b = bytes_by_op["total"]
    t_comm_ms = b / ICI_ONE_WAY_BYTES_PER_S * 1e3
    t_comp_ms = t1_ms / n
    serial = t_comp_ms + t_comm_ms
    overlap = max(t_comp_ms, t_comm_ms)
    return {
        "program": label,
        "n_chips": n,
        "ici_mb_per_chip_per_step": round(b / 2**20, 2),
        "bytes_by_op": {
            k: v for k, v in bytes_by_op.items() if v and k != "total"
        },
        "t_compute_ms": round(t_comp_ms, 1),
        "t_comm_ms": round(t_comm_ms, 2),
        "pred_ms_serial": round(serial, 1),
        "pred_ms_overlap": round(overlap, 1),
        "pred_steps_s_serial": round(1e3 / serial, 2),
        "pred_steps_s_overlap": round(1e3 / overlap, 2),
        "scaling_eff_serial": round(t1_ms / (n * serial), 3),
        "scaling_eff_overlap": round(t1_ms / (n * overlap), 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny nets (smoke)")
    ap.add_argument("--json", default=os.path.join(_REPO, "docs", "ici_roofline.json"))
    ap.add_argument("--sizes", type=int, nargs="*", default=list(MESH_SIZES))
    ap.add_argument(
        "--programs",
        nargs="*",
        default=["cp1024", "tp512", "tpunet512"],
        choices=["cp1024", "tp512", "tpunet512"],
        help="subset to (re)compile; rows for the others are merged "
        "from an existing --json payload if present",
    )
    args = ap.parse_args()

    _ensure_devices(max(args.sizes))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/jax_comp_tests"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    assert jax.devices()[0].platform == "cpu"

    from perceptor_tpu.utils.hlo import program_ici_bytes

    nets = _build_nets(args.quick)
    cp_size = 256 if args.quick else 1024
    tp_size = 64 if args.quick else 512
    rows = []
    if os.path.exists(args.json):
        with open(args.json) as f:
            rows = [
                r
                for r in json.load(f).get("rows", [])
                if r["program"] not in args.programs
            ]
    for label, builder, size, t1 in (
        ("cp1024", _compile_cp, cp_size, T1_MS["cp1024"]),
        ("tp512", _compile_tp, tp_size, T1_MS["tp512"]),
        ("tpunet512", _compile_tp_unet, tp_size, T1_MS["tpunet512"]),
    ):
        if label not in args.programs:
            continue
        for n in args.sizes:
            t0 = time.time()
            txt = builder(nets, n, size)
            bytes_by_op = program_ici_bytes(txt, default_group=n)
            row = _roofline_row(label, n, bytes_by_op, t1)
            row["compile_s"] = round(time.time() - t0, 1)
            rows.append(row)
            print(json.dumps(row), flush=True)

    rows.sort(key=lambda r: (r["program"], r["n_chips"]))
    payload = {
        "quick": args.quick,
        "t1_ms": T1_MS,
        "ici_one_way_bytes_per_s": ICI_ONE_WAY_BYTES_PER_S,
        "rows": rows,
    }
    with open(args.json, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"# wrote {args.json}", flush=True)

    # markdown table for docs/PARALLELISM.md
    print("\n| program | chips | ICI MB/chip/step | t_comp ms | t_comm ms "
          "| pred steps/s (serial/overlap) | eff (serial/overlap) |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['program']} | {r['n_chips']} | "
            f"{r['ici_mb_per_chip_per_step']} | {r['t_compute_ms']} | "
            f"{r['t_comm_ms']} | {r['pred_steps_s_serial']} / "
            f"{r['pred_steps_s_overlap']} | {r['scaling_eff_serial']} / "
            f"{r['scaling_eff_overlap']} |"
        )


if __name__ == "__main__":
    main()
