"""Serving-throughput A/B: end-to-end 512px CFG sample() at batch 1/2/4.

Measures images/min scaling with batch size on one chip — the serving
lever: a larger batch amortizes per-step fixed costs (dispatch, small
ops) and widens the matmuls the MXU tiles. Each batch size is one
compiled lax.scan program (compile time is paid once and reported).

Usage: python scripts/ab_batch_sampling.py [n_steps] [batches...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer
from perceptor_tpu.models.stable_diffusion import StableDiffusion


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    batches = [int(b) for b in sys.argv[2:]] or [1, 2, 4]
    try:
        tokenizer = SimpleTokenizer()
    except FileNotFoundError:
        tokenizer = SimpleTokenizer(merges=[])
    model = StableDiffusion("runwayml/stable-diffusion-v1-5", tokenizer=tokenizer)

    for batch in batches:
        kwargs = dict(
            texts=["a serving benchmark prompt"] * batch,
            n_steps=n_steps,
            guidance_scale=7.0,
            size=(512, 512),
            key=jax.random.PRNGKey(0),
        )
        t0 = time.time()
        images = model.sample(**kwargs)
        _ = float(jnp.sum(images))  # host readback: hard sync via the tunnel
        warm = time.time() - t0
        t0 = time.time()
        images = model.sample(**kwargs)
        _ = float(jnp.sum(images))
        wall = time.time() - t0
        print(
            f"batch={batch}: warmup(+compile) {warm:.1f}s; steady "
            f"{wall:.3f}s for {n_steps} steps = "
            f"{batch * n_steps / wall:.1f} image-steps/s = "
            f"{60.0 * batch / wall:.1f} images/min",
            flush=True,
        )


if __name__ == "__main__":
    main()
