"""A/B: scan-over-stacked-weights vs unrolled repeated UNet blocks.

VERDICT r3 next #3: the ~100 s XLA compile floor is UNet-VJP-dominated
(69.7 s of it, docs/PERFORMANCE.md "Round-3 cold-start diagnosis"). The
one structural lever never tried: compile repeated same-shape blocks
ONCE via lax.scan over stacked params instead of unrolling them.

This experiment isolates the question at the REAL SD L0 shape (512px ->
latent 64x64 -> 4096 tokens, 320 ch, the most expensive repeated pair):

  A  (res320 + attn320) applied twice, separate params  — today's form
  B  nn.scan over the stacked pair, length 2            — candidate

and at L3 (8x8, 1280 ch, res-only pair). Measures, for fwd+VJP:
  - .lower() time (tracing)
  - .compile() time (XLA)  <- the target
  - steady-state runtime x30 (scan may inhibit cross-block fusion)

Run on the real TPU:  python scripts/ab_scan_blocks.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# NOTE: deliberately NO persistent compile cache — honest cold XLA times.

from perceptor_tpu.models.stable_diffusion.unet import (
    ResnetBlock,
    SpatialTransformer,
)


class Pair(nn.Module):
    """One (resnet, transformer) repetition unit at a fixed width."""

    channels: int
    heads: int = 8
    with_attn: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, emb, ctx):
        x = ResnetBlock(self.channels, dtype=self.dtype, name="res")(x, emb)
        if self.with_attn:
            x = SpatialTransformer(
                self.heads, self.channels // self.heads, 1,
                dtype=self.dtype, name="attn",
            )(x, ctx)
        return x


class UnrolledPairs(nn.Module):
    channels: int
    n: int = 2
    with_attn: bool = True

    @nn.compact
    def __call__(self, x, emb, ctx):
        for i in range(self.n):
            x = Pair(self.channels, with_attn=self.with_attn, name=f"pair_{i}")(
                x, emb, ctx
            )
        return x


# nn.scan carries (carry, per-step-input); adapt Pair's signature
class ScanPair(Pair):
    @nn.compact
    def __call__(self, x, emb_ctx):  # type: ignore[override]
        emb, ctx = emb_ctx
        return super().__call__(x, emb, ctx), None


class ScannedPairs2(nn.Module):
    channels: int
    n: int = 2
    with_attn: bool = True

    @nn.compact
    def __call__(self, x, emb, ctx):
        body = nn.scan(
            ScanPair,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=nn.broadcast,
            length=self.n,
        )
        x, _ = body(self.channels, with_attn=self.with_attn, name="pairs")(
            x, (emb, ctx)
        )
        return x


def measure(module, x, emb, ctx, label, steps=30):
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    params = module.init(key, x, emb, ctx)
    init_s = time.time() - t0

    def loss(p, x):
        return (module.apply(p, x, emb, ctx).astype(jnp.float32) ** 2).mean()

    grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
    t0 = time.time()
    lowered = grad.lower(params, x)
    lower_s = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    compile_s = time.time() - t0

    # warm + steady; hard sync via host readback (block_until_ready is a
    # no-op through the axon tunnel — see bench.py)
    def _sync(t):
        leaf = jax.tree.leaves(t)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    g = compiled(params, x)
    _sync(g)
    t0 = time.time()
    for _ in range(steps):
        g = compiled(params, x)
    _sync(g)
    run_ms = (time.time() - t0) / steps * 1e3
    out = {
        "label": label,
        "lower_s": round(lower_s, 2),
        "compile_s": round(compile_s, 2),
        "run_ms": round(run_ms, 2),
        "init_s": round(init_s, 2),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    results = []

    # L0: 64x64 spatial, 320 ch, 4096 tokens (the flash-attention level)
    x0 = jnp.asarray(rng.normal(size=(1, 64, 64, 320)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(1, 1280)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(1, 77, 768)).astype(np.float32))
    results.append(
        measure(UnrolledPairs(320), x0, emb, ctx, "L0 unrolled x2")
    )
    results.append(
        measure(ScannedPairs2(320), x0, emb, ctx, "L0 scanned x2")
    )

    # L3: 8x8 spatial, 1280 ch, res-only
    x3 = jnp.asarray(rng.normal(size=(1, 8, 8, 1280)).astype(np.float32))
    results.append(
        measure(
            UnrolledPairs(1280, with_attn=False), x3, emb, ctx,
            "L3 res-only unrolled x2",
        )
    )
    results.append(
        measure(
            ScannedPairs2(1280, with_attn=False), x3, emb, ctx,
            "L3 res-only scanned x2",
        )
    )

    a, b = results[0], results[1]
    print(
        f"# L0 compile: {a['compile_s']} -> {b['compile_s']} s "
        f"({100 * (1 - b['compile_s'] / a['compile_s']):.0f}% less); "
        f"run {a['run_ms']} -> {b['run_ms']} ms "
        f"({100 * (b['run_ms'] / a['run_ms'] - 1):+.1f}%)",
        flush=True,
    )


if __name__ == "__main__":
    main()
