"""Ulysses-style sequence parallelism: all_to_all head-sharded attention.

The complement to ring attention (SURVEY §5: "optionally Ulysses-style
head-sharded attention for the cross-attention (77 text tokens) blocks"):
instead of rotating K/V around the ring, one all_to_all re-shards the
activations from sequence-sharded to head-sharded, each device runs an
ordinary full attention over its head group (the whole sequence is local
in that layout), and a second all_to_all restores sequence sharding.

Cost: 2 all_to_alls of the qkv/out activations vs ring's (n-1) K/V
ppermutes — cheaper when heads >= devices and the sequence is short
(exactly the cross-attention case, where K/V is 77 text tokens and the
ring would rotate a tiny tensor n times). Requires heads % axis_size == 0.

Works for self- AND cross-attention (q and k/v sequence lengths may
differ). Plain differentiable JAX: all_to_all transposes to all_to_all.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from perceptor_tpu.ops.attention import dot_product_attention
from perceptor_tpu.parallel.mesh import AXIS_CONTEXT, AXIS_DATA


def ulysses_self_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    scale: Optional[float] = None,
    kv_len: Optional[int] = None,
) -> jax.Array:
    """Per-shard Ulysses body — call INSIDE shard_map.

    Local shards (B, H, S_local, D) with the sequence sharded over
    `axis_name`; H must divide by the axis size. all_to_all swaps the
    shard axis from seq to heads, attention runs with the full sequence
    local, and the inverse all_to_all restores the seq sharding.
    `kv_len`: number of REAL keys — positions beyond it (divisibility
    padding) are masked out of the softmax.
    """
    n = jax.lax.axis_size(axis_name)
    heads = q.shape[1]
    if heads % n:
        raise ValueError(f"{heads} heads not divisible by axis size {n}")

    def to_head_sharded(x):
        # (B, H, S/n, D) -> (B, H/n, S, D): split heads across devices,
        # gather the sequence. tiled=True concatenates on the recv axis.
        return jax.lax.all_to_all(
            x, axis_name, split_axis=1, concat_axis=2, tiled=True
        )

    def to_seq_sharded(x):
        return jax.lax.all_to_all(
            x, axis_name, split_axis=2, concat_axis=1, tiled=True
        )

    k_full = to_head_sharded(k)
    mask = None
    if kv_len is not None and kv_len < k_full.shape[2]:
        key_pos = jnp.arange(k_full.shape[2])
        mask = jnp.where(key_pos < kv_len, 0.0, -1e10)[None, None, None, :]
    out = dot_product_attention(
        to_head_sharded(q), k_full, to_head_sharded(v), mask=mask, scale=scale
    )
    return to_seq_sharded(out)


def ulysses_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: jax.sharding.Mesh,
    scale: Optional[float] = None,
    context_axis: str = AXIS_CONTEXT,
    batch_axis: Optional[str] = AXIS_DATA,
) -> jax.Array:
    """Head-sharded sequence-parallel attention over global (B, H, S, D).

    The head count must divide by the context axis size. Sequence lengths
    need NOT divide: q and k/v are zero-padded to the next multiple (the
    cross-attention K/V of 77 text tokens is the motivating case), padded
    keys are masked out of the softmax, and padded query rows are sliced
    off the output.
    """
    if batch_axis is not None and batch_axis not in mesh.axis_names:
        batch_axis = None
    if batch_axis is not None and q.shape[0] % mesh.shape[batch_axis]:
        batch_axis = None
    n = mesh.shape[context_axis]

    def pad_seq(x):
        pad = (-x.shape[2]) % n
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x

    q_len, kv_len = q.shape[2], k.shape[2]
    q, k, v = pad_seq(q), pad_seq(k), pad_seq(v)
    spec = P(batch_axis, None, context_axis, None)
    body = functools.partial(
        ulysses_self_attention,
        axis_name=context_axis,
        scale=scale,
        kv_len=kv_len,
    )
    f = jax.shard_map(body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    out = f(q, k, v)
    return out[:, :, :q_len] if out.shape[2] != q_len else out
