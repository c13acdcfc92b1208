"""Flash-attention block-size sweep at the 1024px regime (16384 tokens).

VERDICT r3 weak #2: the kernel's default blocks were tuned at 4096
tokens (512px); 1024px runs 128x128 latents -> 16384 tokens at L0 where
nothing was ever measured. Sweeps (block_q, block_k) for fwd AND
fwd+bwd at the real shape (B=1, H=8, S=16384, D=128 — head_dim 40
pre-padded to the kernel's lane width by the projection, as the UNet
emits it), plus the 768px shape (9216 tokens) for the snap-down path.

Run on the real TPU:  python scripts/ab_flash_16k.py
"""

from __future__ import annotations

import itertools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from perceptor_tpu.ops.flash_attention_kernel import flash_attention


def sweep(seq, heads=8, d=128, blocks=(256, 512, 1024, 2048), reps=20):
    print(f"# sweep seq={seq} heads={heads} d={d}", flush=True)
    rng = np.random.default_rng(0)
    q = jnp.asarray(
        rng.normal(size=(1, heads, seq, d)).astype(np.float32), jnp.bfloat16
    )
    k = jnp.asarray(
        rng.normal(size=(1, heads, seq, d)).astype(np.float32), jnp.bfloat16
    )
    v = jnp.asarray(
        rng.normal(size=(1, heads, seq, d)).astype(np.float32), jnp.bfloat16
    )
    results = []
    for bq, bk in itertools.product(blocks, blocks):
        if seq % bq or seq % bk:
            continue

        def fwd(q, k, v):
            return flash_attention(q, k, v, block_q=bq, block_k=bk)

        def loss(q, k, v):
            return fwd(q, k, v).astype(jnp.float32).sum()

        # hard sync via host readback: block_until_ready is a no-op
        # through the axon tunnel (see bench.py) — a tiny jnp.sum fetch
        # forces all queued work to finish
        def _sync(t):
            leaf = jax.tree.leaves(t)[0]
            return float(jnp.sum(leaf[..., :2, :2].astype(jnp.float32)))

        try:
            f = jax.jit(fwd)
            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            _sync(f(q, k, v))
            _sync(g(q, k, v))
        except Exception as e:  # VMEM overflow etc. — record and move on
            results.append(
                {"seq": seq, "bq": bq, "bk": bk, "error": str(e)[:100]}
            )
            continue
        t0 = time.time()
        for _ in range(reps):
            out = f(q, k, v)
        _sync(out)
        fwd_ms = (time.time() - t0) / reps * 1e3
        t0 = time.time()
        for _ in range(reps):
            gr = g(q, k, v)
        _sync(gr)
        bwd_ms = (time.time() - t0) / reps * 1e3
        row = {
            "seq": seq, "bq": bq, "bk": bk,
            "fwd_ms": round(fwd_ms, 2), "fwdbwd_ms": round(bwd_ms, 2),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    ok = [r for r in results if "error" not in r]
    if ok:
        best = min(ok, key=lambda r: r["fwdbwd_ms"])
        default = [r for r in ok if r["bq"] == 1024 and r["bk"] == 1024]
        print(
            f"# seq {seq}: best ({best['bq']},{best['bk']}) "
            f"{best['fwdbwd_ms']} ms fwd+bwd"
            + (
                f"; default (1024,1024) {default[0]['fwdbwd_ms']} ms"
                if default
                else ""
            ),
            flush=True,
        )
    return results


if __name__ == "__main__":
    print(f"# device: {jax.devices()[0]}", flush=True)
    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [16384, 9216]
    for seq in sizes:
        # UNet L0 shape at this resolution (head_dim 40 -> 128 emitted)
        sweep(seq, heads=8, d=128)
    # the OTHER 16k-token attention at 1024px: the VAE mid-block's single
    # 512-dim head (128x128 latents) — d>=512 is where KV-tile VMEM
    # locality breaks; measured separately
    sweep(16384, heads=1, d=512, reps=10)
