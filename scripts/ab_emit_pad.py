"""A/B: does un-padding the flash q/k/v emit recover HBM bytes at high res?

Round-4 named "byte-count reduction" as the only remaining 768/1024px
lever (docs/PERFORMANCE.md). The largest *identifiable* padded pool is
the flash path's 128-lane q/k/v emit (HeadProj emit_dim): at SD's d40
levels the activations carry 3.2x their true bytes. The byte model says
this pool is only ~2% of the 1024px step's HBM traffic (8 tensors x
~23 MB saved per 16k-token site, ~5 sites, vs ~77 GB of GN/elementwise
traffic), and un-padding re-introduces the explicit pad/slice copies
the round-2 fold deleted — so the expectation is a NEGATIVE result;
this script measures it rather than asserting it.

Usage: python scripts/ab_emit_pad.py [sizes...]  (default 768 1024)
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


def probe(size: int, pad: bool, n: int = 4) -> float:
    from perceptor_tpu.models.stable_diffusion import unet as unet_mod
    import ab_highres

    unet_mod.EMIT_LANE_PAD = pad
    scan, params, latents, context = ab_highres.build(size)
    t0 = time.time()
    out, _ = scan(*params, latents, context, n)
    _ = float(jnp.sum(out))
    compile_s = time.time() - t0
    t0 = time.time()
    out, _ = scan(*params, latents, context, n)
    _ = float(jnp.sum(out))
    elapsed = time.time() - t0
    print(
        f"size={size} emit_pad={pad}: {elapsed / n * 1e3:.1f} ms/step "
        f"(compile {compile_s:.0f}s)",
        flush=True,
    )
    return elapsed / n


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sizes = [int(a) for a in sys.argv[1:]] or [768, 1024]
    for size in sizes:
        on = probe(size, True)
        off = probe(size, False)
        print(
            f"size={size}: emit-pad ON {on * 1e3:.1f} ms vs OFF "
            f"{off * 1e3:.1f} ms ({(off / on - 1) * 100:+.1f}%)",
            flush=True,
        )


if __name__ == "__main__":
    main()
