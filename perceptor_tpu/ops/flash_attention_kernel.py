"""Flash attention (Pallas TPU): fused online-softmax attention with a
custom VJP whose backward is also Pallas kernels.

Replaces the reference's xformers `memory_efficient_attention` monkeypatch
(reference perceptor/models/stable_diffusion/attention.py:285) and attention
slicing (stable_diffusion.py:102-106): the (S, S) score matrix never
reaches HBM; running (m, l, acc) statistics live in VMEM scratch.

Layout: (batch, heads, seq, head_dim). head_dim is zero-padded to the
128-lane width (zero K/V columns add nothing to scores/outputs). Sequence
lengths must divide the block sizes (the ops.attention dispatcher falls
back to the XLA path otherwise).

Backward: the standard two-kernel scheme — residuals (o, lse) let each
kernel recompute p = exp(s - lse) blockwise; dq accumulates over KV tiles,
dk/dv over Q tiles, with delta = rowsum(o * do) precomputed in XLA.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128


def _pad_head_dim(x):
    d = x.shape[-1]
    pad = (-d) % LANES
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad)))
    return x, d


# -- forward -------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref, *,
                scale, n_kv_tiles):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]  # (bq, d)
    k = k_ref[0, 0]  # (bk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, bk)

    m_prev = m_ref[...]  # (bq, LANES)
    l_prev = l_ref[...]
    m_curr = jnp.max(s, axis=1)[:, None]  # (bq, 1)
    m_next = jnp.maximum(m_prev, m_curr)  # (bq, LANES)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])
    l_corr = alpha * l_prev
    l_next = l_corr + jnp.sum(p, axis=1)[:, None]
    m_ref[...] = m_next
    l_ref[...] = l_next

    v = v_ref[0, 0]  # (bk, d)
    acc_ref[...] = acc_ref[...] * alpha[:, :1] + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == n_kv_tiles - 1)
    def _store():
        l_final = l_ref[...]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0, 0] = (acc_ref[...] * l_inv[:, :1]).astype(o_ref.dtype)
        lse_ref[0, 0] = m_ref[...] + jnp.log(jnp.maximum(l_final, 1e-37))


def _forward(q, k, v, scale, block_q, block_k, interpret):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    n_kv_tiles = sk // block_k
    grid = (b, h, sq // block_q, n_kv_tiles)

    kernel = functools.partial(_fwd_kernel, scale=scale, n_kv_tiles=n_kv_tiles)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, q, kv: (b, h, q, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, q, kv: (b, h, kv, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, q, kv: (b, h, kv, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, q, kv: (b, h, q, 0)),
            pl.BlockSpec(
                (1, 1, block_q, LANES), lambda b, h, q, kv: (b, h, q, 0)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),  # m
            pltpu.VMEM((block_q, LANES), jnp.float32),  # l
            pltpu.VMEM((block_q, d), jnp.float32),  # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)
    return out, lse  # (b, h, sq, LANES) — lane-replicated


# -- backward ---------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   acc_ref, *, scale, n_kv_tiles):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, :1]  # lane-replicated -> (bq, 1)
    delta = delta_ref[0, 0][:, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta) * scale
    acc_ref[...] += jax.lax.dot(
        ds.astype(k.dtype), k, preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == n_kv_tiles - 1)
    def _store():
        dq_ref[0, 0] = acc_ref[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_acc_ref, dv_acc_ref, *, scale, n_q_tiles):
    q_idx = pl.program_id(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_acc_ref[...] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[...] = jnp.zeros_like(dv_acc_ref)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, :1]
    delta = delta_ref[0, 0][:, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, bk)
    p = jnp.exp(s - lse)
    dv_acc_ref[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # p^T @ do -> (bk, d)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bk)
    ds = p * (dp - delta) * scale
    dk_acc_ref[...] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # ds^T @ q -> (bk, d)

    @pl.when(q_idx == n_q_tiles - 1)
    def _store():
        dk_ref[0, 0] = dk_acc_ref[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc_ref[...].astype(dv_ref.dtype)


def _backward(residuals, g, scale, block_q, block_k, interpret):
    q, k, v, o, lse = residuals
    b, h, sq, d = q.shape
    sk = k.shape[2]
    do = g
    delta = jnp.sum(
        o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1, keepdims=True
    )
    delta = jnp.broadcast_to(delta, (*delta.shape[:3], LANES))  # lane-replicated

    n_kv_tiles = sk // block_k
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, n_kv_tiles=n_kv_tiles),
        grid=(b, h, sq // block_q, n_kv_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, q_, kv: (b, h, q_, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, q_, kv: (b, h, kv, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, q_, kv: (b, h, kv, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, q_, kv: (b, h, q_, 0)),
            pl.BlockSpec((1, 1, block_q, LANES), lambda b, h, q_, kv: (b, h, q_, 0)),
            pl.BlockSpec((1, 1, block_q, LANES), lambda b, h, q_, kv: (b, h, q_, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b, h, q_, kv: (b, h, q_, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    n_q_tiles = sq // block_q
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, n_q_tiles=n_q_tiles),
        grid=(b, h, sk // block_k, n_q_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, kv, q_: (b, h, q_, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, kv, q_: (b, h, kv, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, kv, q_: (b, h, kv, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, kv, q_: (b, h, q_, 0)),
            pl.BlockSpec((1, 1, block_q, LANES), lambda b, h, kv, q_: (b, h, q_, 0)),
            pl.BlockSpec((1, 1, block_q, LANES), lambda b, h, kv, q_: (b, h, q_, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, kv, q_: (b, h, kv, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, kv, q_: (b, h, kv, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# -- public API ----------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, scale, block_q, block_k, interpret):
    out, _ = _forward(q, k, v, scale, block_q, block_k, interpret)
    return out


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret):
    out, lse = _forward(q, k, v, scale, block_q, block_k, interpret)
    return out, (q, k, v, out, lse)


def _flash_bwd(scale, block_q, block_k, interpret, residuals, g):
    return _backward(residuals, g, scale, block_q, block_k, interpret)


_flash.defvjp(_flash_fwd, _flash_bwd)


def _default_blocks(sq: int, sk: int, d_padded: int):
    """Measured on v5e (fwd+bwd, bf16): long sequences want 1024-row Q
    tiles; KV tiles of 1024 win for small head_dim but lose VMEM locality
    at d>=512 (e.g. the SD VAE's single 512-dim head) where 512 is best;
    short sequences prefer 512."""
    if sq >= 4096:
        return 1024, (512 if d_padded >= 512 else 1024)
    return 512, 512


def snap_block(seq: int, preferred: int) -> Optional[int]:
    """Largest lane-aligned block <= preferred that divides seq.

    Power-of-two sequences (512px SD: 4096/1024/256 tokens) keep the
    measured defaults; other lane-aligned lengths (768px: 9216/2304
    tokens = 128*72 / 128*18) snap down (e.g. 2304 -> 384). Returns None
    when seq itself is not a multiple of the 128-lane width — the
    dispatcher must use the XLA path then."""
    if seq % LANES:
        return None
    for block in range(min(preferred, seq), LANES - 1, -LANES):
        if seq % block == 0:
            return block
    return None


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """softmax(q k^T * scale) v over (B, H, S, D), fused, flash-style.

    Sequence lengths must be divisible by the block sizes (adjusted down
    automatically when the sequence is shorter).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    sq, sk = q.shape[2], k.shape[2]
    d_padded = q.shape[-1] + ((-q.shape[-1]) % LANES)
    default_q, default_k = _default_blocks(sq, sk, d_padded)
    # explicit block sizes are honored as-is (and validated below);
    # defaults snap down to the largest lane-aligned divisor of the
    # sequence, so any 128-multiple length works (768px latents: 2304
    # tokens -> 384-row blocks)
    block_q = min(block_q, sq) if block_q else snap_block(sq, default_q)
    block_k = min(block_k, sk) if block_k else snap_block(sk, default_k)
    if (
        not block_q
        or not block_k
        or sq % block_q
        or sk % block_k
        or block_q % LANES
        or block_k % LANES
    ):
        raise ValueError(
            f"sequence lengths ({sq}, {sk}) must be multiples of lane-aligned "
            f"block sizes ({block_q}, {block_k})"
        )
    q, d = _pad_head_dim(q)
    k, _ = _pad_head_dim(k)
    v, _ = _pad_head_dim(v)
    out = _flash(q, k, v, float(scale), block_q, block_k, interpret)
    return out[..., :d]
