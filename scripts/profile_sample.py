"""Per-HLO profile of the exact `sample()` scan (end-to-end 512px CFG).

The fused guided step runs at 76.7 TF/s (38.9% MFU); the sampling loop's
documented 37.2 steps/s implies only ~60-65 TF/s on its 1.607 TFLOP/step
(CFG-pair UNet fwd, counted) — this script finds where the gap lives.

Usage: python scripts/profile_sample.py [n_steps]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from perceptor_tpu.models.stable_diffusion import StableDiffusion
from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer
from perceptor_tpu.utils import hlo_trace


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    try:
        tokenizer = SimpleTokenizer()
    except FileNotFoundError:
        tokenizer = SimpleTokenizer(merges=[])
    model = StableDiffusion("runwayml/stable-diffusion-v1-5", tokenizer=tokenizer)

    kwargs = dict(
        texts=["profile prompt"],
        n_steps=n_steps,
        guidance_scale=7.0,
        size=(512, 512),
        key=jax.random.PRNGKey(0),
    )
    t0 = time.time()
    images = model.sample(**kwargs)
    _ = float(jnp.sum(images))
    print(f"warmup (incl. compile): {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    images = model.sample(**kwargs)
    _ = float(jnp.sum(images))
    wall = time.time() - t0
    print(f"steady-state: {wall:.3f}s for {n_steps} steps "
          f"= {n_steps / wall:.1f} steps/s wall", file=sys.stderr)

    logdir = tempfile.mkdtemp(prefix="sample_trace_")
    with jax.profiler.trace(logdir):
        images = model.sample(**kwargs)
        _ = float(jnp.sum(images))

    ops = hlo_trace.load_ops(logdir)
    print(f"\n=== whole sample() call ({n_steps} steps + decode) ===")
    hlo_trace.print_rollup(ops, top=10)

    # aggregate by op name: total ms, count, achieved rate
    agg = {}
    for op in ops:
        ms, fl, by, ln = agg.get(op.name, (0.0, 0, 0, ""))
        agg[op.name] = (
            ms + op.duration_ms,
            fl + op.model_flops,
            by + op.bytes_accessed,
            op.long_name,
        )
    print("\ntop 40 by aggregate time (ms total, count-agg TF/s, GB/s):")
    for name, (ms, fl, by, ln) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]:
        tfs = fl / ms / 1e9 if ms else 0
        gbs = by / ms / 1e6 if ms else 0
        print(f"  {ms:8.2f}  {tfs:7.1f}  {gbs:7.1f}  {name[:28]:28s} {ln[:100]}")


if __name__ == "__main__":
    main()
