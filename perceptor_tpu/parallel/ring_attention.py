"""Ring attention: context-parallel attention over the `context` mesh axis.

The reference scales attention by *reducing work* on one GPU — xformers
memory-efficient attention (reference perceptor/models/stable_diffusion/
attention.py:285) and attention slicing (stable_diffusion.py:102-106).
The TPU-native way to scale past one chip is to *distribute the token
axis* (SURVEY §2.8/§5): shard the flattened H*W image tokens over the
`context` mesh axis and rotate K/V blocks around the ICI ring with
`ppermute`, combining partial softmax results with the online-softmax
(m, l, acc) recurrence — flash attention's math, with the KV loop
unrolled over devices instead of VMEM tiles.

Each device holds S/n query tokens and sees S/n keys per ring step, so
the score block is (S/n, S/n): HBM never sees an (S, S) matrix anywhere
in the cluster, and per-chip attention memory falls 1/n².

Everything is plain differentiable JAX (`ppermute` transposes to the
inverse rotation), so the VJP for guided generation rides the same ring.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from perceptor_tpu.parallel.mesh import AXIS_CONTEXT, AXIS_DATA

NEG_INF = -1e30


def ring_self_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    scale: Optional[float] = None,
    unroll: bool = True,
) -> jax.Array:
    """Per-shard ring attention body — call INSIDE shard_map.

    Args are local shards of shape (batch, heads, seq_local, head_dim)
    with the sequence axis sharded over `axis_name`. Running softmax
    statistics are kept in fp32 regardless of input dtype (matching
    ops.flash_attention and the reference's fp32-softmax autocast
    behavior).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    axis_size = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    q32 = q.astype(jnp.float32)
    # derive the running stats from q so they carry q's varying-manual-axes
    # type (jax>=0.9 vma): the scan carry must start device-varying over
    # every mesh axis the loop outputs vary over
    m0 = jnp.full_like(q32[..., 0], NEG_INF)
    l0 = jnp.zeros_like(q32[..., 0])
    acc0 = jnp.zeros_like(q32)

    def step(carry, _):
        k_blk, v_blk, m, l, acc = carry
        s = (
            jnp.einsum(
                "bhqd,bhkd->bhqk",
                q32,
                k_blk.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l = l * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd",
            p,
            v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (k_blk, v_blk, m_new, l, acc), None

    (_, _, _, l, acc), _ = jax.lax.scan(
        step, (k, v, m0, l0, acc0), None, length=axis_size, unroll=unroll
    )
    out = acc / jnp.maximum(l, 1e-37)[..., None]
    return out.astype(q.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: jax.sharding.Mesh,
    scale: Optional[float] = None,
    context_axis: str = AXIS_CONTEXT,
    batch_axis: Optional[str] = AXIS_DATA,
    unroll: bool = True,
) -> jax.Array:
    """Context-parallel attention over global (B, H, S, D) arrays.

    Shards S over `context_axis` (and B over `batch_axis` when the mesh
    has one) via shard_map, then runs the ppermute ring. S must divide by
    the context axis size; B by the batch axis size.
    """
    if batch_axis is not None and batch_axis not in mesh.axis_names:
        batch_axis = None
    if batch_axis is not None and q.shape[0] % mesh.shape[batch_axis]:
        batch_axis = None  # batch not divisible: replicate it instead
    spec = P(batch_axis, None, context_axis, None)
    n_ctx = mesh.shape[context_axis]
    if q.shape[2] % n_ctx or k.shape[2] % n_ctx:
        raise ValueError(
            f"sequence length {q.shape[2]} must divide context axis size {n_ctx}"
        )
    body = functools.partial(
        ring_self_attention, axis_name=context_axis, scale=scale, unroll=unroll
    )
    f = jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )
    return f(q, k, v)
