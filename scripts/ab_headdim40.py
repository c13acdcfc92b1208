"""A/B: can SD's head_dim-40 attention avoid the 3.2x lane padding?

docs/PERFORMANCE.md's roofline table charges the fused step ~10.8 ms to
flash attention at head_dim 40 (3 * 40 = 120 of 128 lanes if heads could
be packed). VERDICT r2 #3 asks for either a packed-layout win or a
written negative result with numbers. The candidate layouts:

  A. current kernel: head_dim zero-padded 40 -> 128 (lane waste 3.2x in
     the QK^T contraction and the PV output lanes)
  B. Mosaic-native d=40: hand the kernel 40-lane blocks, let Mosaic tile
     internally (tests whether sub-128 contraction is cheaper than
     explicit padding)
  C. XLA dot-product attention at d=40 (the no-kernel baseline)
  D. block-diagonal head packing — analysed, not run: packing 3 heads
     along the lanes requires block-diagonal operands (zeros fill the
     off-head bands), so the MXU still executes bq*3bk*120 MACs vs the
     useful bq*3bk*40 — identical 3x waste, plus 3x VMEM for the zero
     bands. QK^T mixes heads outright when packed (the contraction spans
     all 120 lanes). There is no sub-128 contraction-tile mode on the
     MXU, so per-head d=40 matmuls pay the lane padding wherever they
     run.

Run: python scripts/ab_headdim40.py   (real TPU)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from perceptor_tpu.ops.attention import dot_product_attention
from perceptor_tpu.ops import flash_attention_kernel as fak


def timed(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000


def main():
    # SD 512px L0 self-attention shape, CFG pair batch
    b, h, s, d = 2, 8, 4096, 40
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
    g = jax.random.normal(kg, (b, h, s, d), jnp.bfloat16)

    def fwdbwd(attn):
        def f(q, k, v):
            out, vjp = jax.vjp(attn, q, k, v)
            return out, vjp(g)

        return jax.jit(f)

    flash_padded = fwdbwd(lambda q, k, v: fak.flash_attention(q, k, v))
    print(
        f"A. flash padded->128:  {timed(flash_padded, q, k, v):7.2f} ms "
        f"(fwd+bwd, {b}x{h}x{s}x{d})"
    )

    # B: bypass the explicit pad — call the raw kernel with d=40 blocks
    def flash_native(q, k, v):
        import math

        return fak._flash(
            q, k, v, 1.0 / math.sqrt(d), 1024, 1024, False
        )

    try:
        native = fwdbwd(flash_native)
        print(f"B. flash native d=40:  {timed(native, q, k, v):7.2f} ms")
    except Exception as e:  # Mosaic may reject non-128 minor dims
        print(f"B. flash native d=40:  REJECTED ({type(e).__name__}: "
              f"{str(e)[:160]})")

    xla = fwdbwd(lambda q, k, v: dot_product_attention(q, k, v))
    print(f"C. XLA dot-product:    {timed(xla, q, k, v):7.2f} ms")


if __name__ == "__main__":
    main()
