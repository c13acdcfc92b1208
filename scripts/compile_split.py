"""Where does the ~200-500 s cold bench compile go: tracing or XLA?

Splits the bench scan program's cold-start cost into its three phases --
Python tracing + lowering (`.lower()`, host CPU), backend compilation
(`.compile()`, XLA; on this VM a single host core), and first execution
(executable transfer through the axon tunnel + run). The numbers feed
docs/PERFORMANCE.md "Compile times"; run with an EMPTY
`~/.cache/jax_comp` for the honest cold number, or as-is to see the
warm (persistent-cache hit) shape.

Usage: python scripts/compile_split.py [--quick]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--quick" in sys.argv:
    os.environ["BENCH_QUICK"] = "1"

import jax.numpy as jnp

import bench


def main():
    step, scan, params, latents, context = bench.build()
    unet_params, vae_params, clip_params = params
    n = 3 if bench.QUICK else 30

    t0 = time.time()
    lowered = scan.lower(unet_params, vae_params, clip_params, latents, context, n)
    t_lower = time.time() - t0

    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0

    t0 = time.time()
    out, _ = compiled(unet_params, vae_params, clip_params, latents, context)
    _ = float(jnp.sum(out))
    t_first_run = time.time() - t0

    mem = compiled.memory_analysis()
    print(f"trace+lower: {t_lower:.1f}s")
    print(f"xla compile: {t_compile:.1f}s")
    print(f"first run (executable transfer + {n} steps): {t_first_run:.1f}s")
    if mem is not None:
        print(
            "executable memory: "
            f"{getattr(mem, 'temp_size_in_bytes', 0) / 1e9:.2f} GB temp, "
            f"{getattr(mem, 'argument_size_in_bytes', 0) / 1e9:.2f} GB args"
        )


if __name__ == "__main__":
    main()
