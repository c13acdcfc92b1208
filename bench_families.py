"""Per-family performance benchmarks (VERDICT r2 #4).

`python bench.py --family <name>` dispatches here. Each family times its
FUSED sampler (the one-lax.scan program) or fused guided loop with random
weights (zero-egress environment — identical FLOPs/memory to pretrained),
after one warmup call that absorbs compile. Prints ONE JSON line in the
same shape as the headline bench.

Families (reference 50-step conventions, reference
perceptor/models/velocity_diffusion/velocity_diffusion.py:177,
stable_diffusion.py:391, monster_diffusion.py:201-211):

  velocity         yfcc_2 512px, 50-step fused DDIM sample()
  adm              ADM "standard" 512px, 50-step fused sample()
  ldm              LDM text2image 256px, 50 steps (built-in CFG)
  monster          EDM 48px sprites, batch 16, n_evaluations=100
  raw              config 1: Raw drawer + CLIP ViT-B-32, 256px guided opt
  dip              config 2: DeepImagePrior + OpenCLIP, 256px guided opt
  velocity-guided  config 3: yfcc_2 + CLIP guidance, 50 steps at 256px
  ensemble         config 5: ADM pixelart + BLIP/CLOOB/SLIP stacked losses
  cutouts          Raw 512px + MakeCutouts x{8,32,64} + CLIP ViT-B-32
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# --mfu / BENCH_MFU=1: after timing, re-trace the benched program
# (jax.make_jaxpr; inner jits hit the trace cache so this is cheap
# relative to the first compile) and count matmul/conv FLOPs analytically
# (utils/flops.py — XLA's own cost_analysis undercounts ~10x post-fusion).
# Adds counted_tflops_per_step + mfu_pct columns so EVERY published
# per-family number carries a roofline check, not just the 512px headline
# (VERDICT r3 next #1).
MFU = os.environ.get("BENCH_MFU", "") == "1"

# COUNT_ONLY: skip execution entirely — _timed returns zeros and _add_mfu
# traces the program for its model-FLOP count only (no mfu_pct without a
# real run time). Used by scripts/recount_model_flops.py to re-derive the
# TF/step column for already-measured rows without re-running benches.
COUNT_ONLY = os.environ.get("BENCH_COUNT_ONLY", "") == "1"

# BENCH_BATCH=N: batch size for the guided-loop families
# (velocity-guided, ensemble) — the serving-economics knob measured on
# LDM in round 4 (batch 1->8: 31.7->49.4% MFU); same study for the
# 256px guided configs (VERDICT r4 #9).
BATCH = int(os.environ.get("BENCH_BATCH", "1"))

FAMILIES = (
    "velocity",
    "adm",
    "ldm",
    "monster",
    "raw",
    "dip",
    "velocity-guided",
    "ensemble",
    "cutouts",
)


def _timed(fn, sync):
    """(compile_s, run_s): first call (with compile), then a steady call."""
    if COUNT_ONLY:
        # inf keeps the throughput arithmetic well-defined (value -> 0);
        # _add_mfu skips mfu_pct for non-finite run times
        return 0.0, float("inf")
    t0 = time.time()
    sync(fn())
    compile_s = time.time() - t0
    t0 = time.time()
    sync(fn())
    return compile_s, time.time() - t0


def _add_mfu(result, run, run_s, n_steps):
    """Annotate a bench result with counted FLOPs + MFU (no-op unless
    --mfu). `run` is the exact zero-arg program that was timed; `n_steps`
    the steps (or images) one run covers.

    Counts MODEL FLOPs (count_model_flops: attention re-traced on the
    XLA route at true head_dim) — on TPU a plain trace would hide the
    flash kernels' attention matmuls while counting their lane padding,
    the round-4 headline artifact (docs/PERFORMANCE.md "MFU counter
    reconciliation"). Runs AFTER timing: it clears jit caches."""
    if not MFU:
        return result
    from perceptor_tpu.utils.flops import count_model_flops, mfu

    import math

    total = count_model_flops(run)
    result["counted_tflops_per_step"] = round(total / n_steps / 1e12, 3)
    if run_s > 0 and math.isfinite(run_s):
        result["mfu_pct"] = round(100 * mfu(total, run_s), 1)
    return result


def _sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def _random_encodings(loss, dim_probe_size=64, seed=1):
    """Prompt-bank target without tokenizer assets: a fixed random
    direction (same compute as a text target)."""
    dim = loss.model.encode_images(
        jnp.zeros((1, 3, dim_probe_size, dim_probe_size))
    ).shape[-1]
    loss.add_encodings_(
        jax.random.normal(jax.random.PRNGKey(seed), (1, dim))
    )
    return loss


def bench_velocity(quick):
    from perceptor_tpu.models.velocity_diffusion import VelocityDiffusion

    model = VelocityDiffusion("yfcc_2", fp16=True)
    n_steps = 3 if quick else 50

    def run():
        return model.sample(
            n_images=1, n_steps=n_steps, key=jax.random.PRNGKey(0)
        )

    compile_s, run_s = _timed(run, _sync)
    return _add_mfu({
        "metric": "velocity yfcc_2 512px fused 50-step sample",
        "value": round(n_steps / run_s, 3),
        "unit": "steps/sec/chip",
        "images_per_min": round(60.0 / run_s, 2),
        "compile_s": round(compile_s, 1),
    }, run, run_s, n_steps)


def bench_adm(quick):
    from perceptor_tpu.models.guided_diffusion import GuidedDiffusion

    model = GuidedDiffusion("standard", fp16=True)
    n_steps = 3 if quick else 50

    def run():
        return model.sample(
            n_images=1, n_steps=n_steps, key=jax.random.PRNGKey(0)
        )

    compile_s, run_s = _timed(run, _sync)
    return _add_mfu({
        "metric": "ADM standard 512px fused 50-step sample",
        "value": round(n_steps / run_s, 3),
        "unit": "steps/sec/chip",
        "images_per_min": round(60.0 / run_s, 2),
        "compile_s": round(compile_s, 1),
    }, run, run_s, n_steps)


def bench_ldm(quick):
    from perceptor_tpu.models.latent_diffusion import Text2Image
    from perceptor_tpu.models.latent_diffusion import bert as bert_lib

    model = Text2Image(tiny=quick)
    try:
        model.tokenizer  # noqa: B018 — probes the vocab file
    except FileNotFoundError:  # offline: minimal in-memory vocab
        model._tokenizer = bert_lib.BERTTokenizer(
            vocab=["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
            + [chr(c) for c in range(ord("a"), ord("z") + 1)],
            max_length=model.bert_config.max_seq_len,
        )
    n_steps = 3 if quick else 50
    size = (64, 64) if quick else (256, 256)

    def run():
        return model.sample(
            ["a"], n_steps=n_steps, size=size, key=jax.random.PRNGKey(0)
        )

    compile_s, run_s = _timed(run, _sync)
    return _add_mfu({
        "metric": "LDM text2image 256px fused 50-step sample (built-in CFG)",
        "value": round(n_steps / run_s, 3),
        "unit": "steps/sec/chip",
        "images_per_min": round(60.0 / run_s, 2),
        "compile_s": round(compile_s, 1),
    }, run, run_s, n_steps)


def bench_monster(quick):
    from perceptor_tpu.models.monster_diffusion import MonsterDiffusion

    model = MonsterDiffusion("all", fp16=True)
    batch = 2 if quick else 16
    n_evaluations = 10 if quick else 100

    def run():
        return model.sample(
            batch, n_evaluations=n_evaluations, key=jax.random.PRNGKey(0)
        )

    compile_s, run_s = _timed(run, _sync)
    return _add_mfu({
        "metric": f"Monster EDM 48px elucidated sample, batch {batch}, "
        f"{n_evaluations} evals",
        "value": round(batch * 60.0 / run_s, 2),
        "unit": "images/min/chip",
        "compile_s": round(compile_s, 1),
    }, run, run_s, n_evaluations)


def bench_raw(quick):
    import optax

    from perceptor_tpu import drawers, engine, losses

    size = (64, 64) if quick else (256, 256)
    drawer = drawers.Raw.random_fractal_image((1, 3, *size), seed=0)
    loss = _random_encodings(losses.CLIP("ViT-B-32"))
    n_steps = 5 if quick else 100
    optimizer = optax.adam(0.05)  # one object: run_on_device memoizes on it

    def run():
        params, history = engine.run_on_device(
            drawer, [loss], drawer.params, n_steps=n_steps,
            optimizer=optimizer,
        )
        return history

    compile_s, run_s = _timed(run, _sync)
    return _add_mfu({
        "metric": "config 1: Raw + CLIP ViT-B-32 guided optimization, 256px",
        "value": round(n_steps / run_s, 3),
        "unit": "guided steps/sec/chip",
        "compile_s": round(compile_s, 1),
    }, run, run_s, n_steps)


def bench_dip(quick):
    import optax

    from perceptor_tpu import drawers, engine, losses

    size = (64, 64) if quick else (256, 256)
    drawer = drawers.DeepImagePrior(size=size, seed=0)
    loss = _random_encodings(losses.OpenCLIP("ViT-B-32", "laion2b_s34b_b79k"))
    n_steps = 5 if quick else 100
    optimizer = optax.adam(0.01)  # one object: run_on_device memoizes on it

    def run():
        params, history = engine.run_on_device(
            drawer, [loss], drawer.params, n_steps=n_steps,
            optimizer=optimizer,
        )
        return history

    compile_s, run_s = _timed(run, _sync)
    return _add_mfu({
        "metric": "config 2: DeepImagePrior + OpenCLIP guided optimization, 256px",
        "value": round(n_steps / run_s, 3),
        "unit": "guided steps/sec/chip",
        "compile_s": round(compile_s, 1),
    }, run, run_s, n_steps)


def bench_velocity_guided(quick):
    from perceptor_tpu import engine, losses
    from perceptor_tpu.models.velocity_diffusion import VelocityDiffusion

    model = VelocityDiffusion("yfcc_2", fp16=True)
    loss = _random_encodings(losses.CLIP("ViT-B-32"))
    n_steps = 3 if quick else 50
    size = 64 if quick else 256
    diffused = model.random_diffused(
        (BATCH, 3, size, size), jax.random.PRNGKey(0)
    )
    pairs = jnp.asarray(model.schedule_ts(n_steps), jnp.float32)

    def run():
        final, history = engine.guided_sample(
            model, [loss], diffused, pairs, guidance_scale=0.5,
            clamp_value=1e-2,
        )
        return history

    compile_s, run_s = _timed(run, _sync)
    return _add_mfu({
        "metric": "config 3: velocity yfcc_2 + CLIP guidance, 50 steps "
        f"@256px, batch {BATCH}",
        "value": round(n_steps / run_s, 3),
        "unit": "guided steps/sec/chip",
        "images_per_min": round(BATCH * 60.0 / run_s, 2),
        "batch": BATCH,
        "compile_s": round(compile_s, 1),
    }, run, run_s, n_steps)


def bench_ensemble(quick):
    from perceptor_tpu import engine, losses
    from perceptor_tpu.models.guided_diffusion import GuidedDiffusion

    model = GuidedDiffusion("pixelart", fp16=True)
    ensemble = [
        _random_encodings(losses.BLIP(), seed=1),
        _random_encodings(losses.CLOOB(), seed=2),
        _random_encodings(losses.SLIP(), seed=3),
    ]
    n_steps = 3 if quick else 50
    size = 64 if quick else 256
    diffused = model.random_diffused(
        (BATCH, 3, size, size), jax.random.PRNGKey(0)
    )
    pairs = jnp.asarray(
        model.schedule_indices(n_steps=n_steps, rho=3.0)
    )

    def run():
        final, history = engine.guided_sample(
            model, ensemble, diffused, pairs, guidance_scale=0.5,
            loss_weights=[1.0, 1.0, 1.0], clamp_value=1e-2,
        )
        return history

    compile_s, run_s = _timed(run, _sync)
    return _add_mfu({
        "metric": "config 5: ADM pixelart + BLIP/CLOOB/SLIP ensemble, "
        f"50 steps @256px, batch {BATCH}",
        "value": round(n_steps / run_s, 3),
        "unit": "guided steps/sec/chip",
        "images_per_min": round(BATCH * 60.0 / run_s, 2),
        "batch": BATCH,
        "compile_s": round(compile_s, 1),
    }, run, run_s, n_steps)


def bench_cutouts(quick):
    """The reference's canonical CLIP-guidance workload (SURVEY §3.1):
    a Raw drawer at 512px guided through a MakeCutouts ensemble — N
    antialiased crops (transforms.random_cutouts, two MXU matmuls each)
    -> CLIP ViT-B/32 -> spherical distance, fwd+VJP+Adam, the whole loop
    one lax.scan. The cutout axis is batch: this is the workload that
    fills the MXU where the batch-1 `raw` row cannot (VERDICT r4 #6).
    Reference pattern: reference losses/clip/clip.py:89-99 + the resize
    path models/open_clip.py:110-123."""
    import optax

    from perceptor_tpu import drawers, losses, transforms

    size = (64, 64) if quick else (512, 512)
    drawer = drawers.Raw.random_fractal_image((1, 3, *size), seed=0)
    loss = _random_encodings(losses.CLIP("ViT-B-32"))
    loss_params = loss.loss_params
    n_steps = 3 if quick else 100
    optimizer = optax.adam(0.05)
    from functools import partial

    @partial(jax.jit, static_argnums=(3, 4))
    def run_scan(params, loss_params, key, n_cuts, n_steps):
        # loss_params ride as an ARGUMENT: closed-over param trees ship
        # as MLIR constants and trip the remote compiler's request-size
        # limit (HTTP 413) — the known large-program gotcha.
        opt_state = optimizer.init(params)

        def total_loss(params, cut_key):
            images = drawer.synthesize(params)
            cutouts = transforms.random_cutouts(
                images, cut_key, n_cutouts=n_cuts, cut_size=224, cut_pow=0.5
            )
            return loss.apply(loss_params, cutouts)

        def body(carry, _):
            params, opt_state, key = carry
            key, cut_key = jax.random.split(key)
            step_loss, grads = jax.value_and_grad(total_loss)(params, cut_key)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), step_loss

        (params, _, _), history = jax.lax.scan(
            body, (params, opt_state, key), None, length=n_steps
        )
        return params, history

    counts = (2,) if quick else (8, 32, 64)
    variants = {}
    for n_cuts in counts:
        def run(n_cuts=n_cuts):
            return run_scan(
                drawer.params, loss_params, jax.random.PRNGKey(0), n_cuts,
                n_steps,
            )[1]

        compile_s, run_s = _timed(run, _sync)
        variants[str(n_cuts)] = _add_mfu({
            "steps_per_sec": round(n_steps / run_s, 2),
            "compile_s": round(compile_s, 1),
        }, run, run_s, n_steps)

    mid = str(counts[len(counts) // 2])
    return {
        "metric": "Raw 512px + MakeCutouts x{8,32,64} + CLIP ViT-B-32 "
        "guided optimization (canonical cutout-ensemble workflow)",
        "value": variants[mid]["steps_per_sec"],
        "unit": f"guided steps/sec/chip at {mid} cutouts",
        "variants": variants,
    }


BENCHES = {
    "velocity": bench_velocity,
    "adm": bench_adm,
    "ldm": bench_ldm,
    "monster": bench_monster,
    "raw": bench_raw,
    "dip": bench_dip,
    "velocity-guided": bench_velocity_guided,
    "ensemble": bench_ensemble,
    "cutouts": bench_cutouts,
}


def main(family: str, quick: bool = False, mfu: bool = False) -> dict:
    # save/restore the module flag so an in-process mfu=True call does not
    # leak MFU columns into a later mfu=False call (advisor r4)
    global MFU
    prior = MFU
    MFU = MFU or mfu
    try:
        if family not in BENCHES:
            raise SystemExit(
                f"unknown family {family!r}; choose from {', '.join(FAMILIES)}"
            )
        from perceptor_tpu.utils.bench_env import bench_env, cache_snapshot

        before = cache_snapshot()
        result = BENCHES[family](quick)
        result["family"] = family
        # self-describing conditions (VERDICT r4 #3): loadavg, concurrent
        # python procs, persistent-cache hit/miss across the timed compile
        result["env"] = bench_env(before, cache_snapshot())
        print(json.dumps(result))
        return result
    finally:
        MFU = prior


if __name__ == "__main__":
    fam = sys.argv[1] if len(sys.argv) > 1 else "velocity"
    main(fam, quick="--quick" in sys.argv, mfu="--mfu" in sys.argv)
