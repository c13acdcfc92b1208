"""Price the ring-attention routing threshold (VERDICT r4 #8).

The ring's per-hop work on each chip is ONE dense block-attention step
(q_shard x kv_block einsums at the TRUE head_dim — parallel/
ring_attention.py:65-95) that must hide ONE ppermute of the K/V block
over ICI. Per-hop comm is exact from the byte model:

    bytes/hop = 2 (K and V) * s_shard * heads * dim_head * 2 (bf16)
    t_comm    = bytes / 45e9       (v5e per-link one-way; x2 if the
                                    bidirectional ring engages)

This script measures the compute side on the real chip: fwd+VJP of one
ring hop body at shard sizes 128..4096 for the geometries that actually
route (SD L0 8h x d40, ADM/VAE-mid-like 1h x d512), then prints the
compute/comm ratio per shard size — ratio >= ~2 means the ring is
bandwidth-clean (overlapped), ~1 marginal, < 1 comm-bound. The decision
table lands in docs/PARALLELISM.md "ring_min_seq pricing".

Hard-syncs with float() readback (block_until_ready is a no-op through
the axon tunnel).
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

ICI_ONE_WAY = 45e9  # bytes/s per link per direction (v5e)


def hop_body(q, k, v, scale):
    """One ring hop: blockwise scores + online-softmax accumulator update
    (the einsum pair from parallel/ring_attention.py step())."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    acc = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    return acc, p.sum(axis=-1)


def time_hop(batch, heads, shard, dim, n=None):
    if n is None:
        # small blocks cost ~us each: scale hop count so the timed
        # difference (n hops of work) clears the ~ms tunnel-readback
        # noise at every shard size
        n = max(100, int(6e8 / (shard * shard)))
    q = jax.random.normal(jax.random.PRNGKey(0), (batch, heads, shard, dim))
    k = jax.random.normal(jax.random.PRNGKey(1), (batch, heads, shard, dim))
    v = jax.random.normal(jax.random.PRNGKey(2), (batch, heads, shard, dim))
    scale = 1.0 / (dim ** 0.5)

    def loss(q, k, v):
        acc, l = hop_body(q, k, v, scale)
        return jnp.sum(acc) + jnp.sum(l)

    grad = jax.grad(loss, argnums=(0, 1, 2))

    from functools import partial

    @partial(jax.jit, static_argnums=(3,))
    def scan_hops(q, k, v, n):
        def body(c, _):
            # carry feeds the inputs: stops XLA hoisting the (otherwise
            # loop-invariant) body out of the scan
            g = grad(q + c, k, v)
            return g[0][0, 0, 0, 0] * 1e-20, None
        return jax.lax.scan(body, 0.0, None, length=n)[0]

    def timed(length):
        # warmup with the SAME static length (a different n is a
        # different program: its compile would land inside the timing),
        # then hard-sync-time the second call
        _ = float(scan_hops(q, k, v, length))
        t0 = time.time()
        _ = float(scan_hops(q, k, v, length))
        return time.time() - t0

    # difference of two lengths cancels the fixed per-dispatch tunnel
    # overhead (~46 ms), which would otherwise swamp the small blocks
    t_n, t_2n = timed(n), timed(2 * n)
    return max(t_2n - t_n, 1e-9) / n


def main():
    print("| geometry | s_shard | t_comp(fwd+VJP) | KV bytes/hop | "
          "t_comm@45GB/s | ratio |")
    print("|---|---|---|---|---|---|")
    for label, batch, heads, dim in (
        ("SD L0 (8h, d40)", 2, 8, 40),
        ("1-head d512 (VAE-mid-like)", 1, 1, 512),
    ):
        for shard in (128, 256, 512, 1024, 2048, 4096):
            t_comp = time_hop(batch, heads, shard, dim)
            kv_bytes = 2 * batch * heads * shard * dim * 2
            t_comm = kv_bytes / ICI_ONE_WAY
            print(
                f"| {label} | {shard} | {t_comp * 1e6:.1f} us | "
                f"{kv_bytes / 1024:.0f} KiB | {t_comm * 1e6:.1f} us | "
                f"{t_comp / t_comm:.2f} |",
                flush=True,
            )


if __name__ == "__main__":
    main()
