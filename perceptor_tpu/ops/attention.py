"""Multi-head attention for TPU.

Replaces the reference's xformers `memory_efficient_attention` monkeypatch
(reference perceptor/models/stable_diffusion/attention.py:285) and its
attention-slicing fallback (stable_diffusion.py:102-106). Two paths:

  - `dot_product_attention`: the XLA path — einsum QK^T -> softmax -> PV.
    XLA fuses the softmax chain; on TPU this is already strong for seq<=4k.
  - `flash_attention`: a Pallas blockwise-softmax kernel (ops/flash_attention.py)
    that never materializes the (S, S) score matrix in HBM — used for long
    token sequences (>=1024px latents) and as the default under `attention`.

Canonical layout: (batch, heads, seq, head_dim) — MXU-friendly with
head_dim padded to lane width where needed.
"""

from __future__ import annotations

import contextlib
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    compute_dtype=None,
) -> jax.Array:
    """softmax(q k^T / sqrt(d) + mask) v over (B, H, S, D) arrays.

    `mask` is additive (use -inf / large negative for disallowed), broadcast
    to (B, H, Sq, Sk). Softmax is computed in fp32 for stability regardless
    of input dtype (the TPU analogue of autocast keeping softmax in fp32).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    in_dtype = q.dtype
    if compute_dtype is not None:
        q, k, v = q.astype(compute_dtype), k.astype(compute_dtype), v.astype(compute_dtype)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    scores = scores.astype(jnp.float32)
    if mask is not None:
        scores = scores + mask
    weights = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    return out.astype(in_dtype)


def causal_mask(seq_len: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask (used by CLIP text towers, LDM BERT, etc.)."""
    mask = jnp.triu(jnp.full((seq_len, seq_len), -1e10, dtype=dtype), k=1)
    return mask[None, None]


# -- model-FLOPs counting mode -------------------------------------------------
#
# On TPU the flash path hides its attention matmuls inside a pallas_call
# and pads head_dim to the 128-lane width from the projections
# (HeadProj emit_dim) — so a jaxpr FLOP count of the *executed* program
# is neither the model FLOPs (padding counted, score/value dots hidden)
# nor comparable across backends. Round 4 published 6.47 TF/step for the
# headline this way where the true model count is 6.825 (see
# docs/PERFORMANCE.md "MFU counter reconciliation"). Tracing under this
# flag forces the XLA attention route (true head_dim, visible dots) so
# utils.flops counts the mathematical step — identical on every backend.

_COUNTING_MODEL_FLOPS = False


@contextlib.contextmanager
def model_flops_trace():
    """Trace-time override: route every attention through the XLA path
    (unpadded head_dim, dots visible to the jaxpr FLOP counter). Callers
    must trace FRESH functions under this (jax.clear_caches() first if
    the same jitted callables already traced) and must not EXECUTE the
    resulting programs — utils.flops.count_model_flops handles both."""
    global _COUNTING_MODEL_FLOPS
    prior = _COUNTING_MODEL_FLOPS
    _COUNTING_MODEL_FLOPS = True
    try:
        yield
    finally:
        _COUNTING_MODEL_FLOPS = prior


@functools.lru_cache(maxsize=1)
def _flash_available() -> bool:
    try:
        from perceptor_tpu.ops import flash_attention_kernel as _  # noqa: F401

        return True
    except Exception:
        return False


def _context_plan_route_explain(
    seq_q: int, seq_k: int, heads: int, masked: bool
):
    """(plan, route, reason) under the active context-parallel plan, or
    (None, None, None).

    Imported lazily: parallel.plan is dependency-free but the ring/Ulysses
    modules import this file back."""
    from perceptor_tpu.parallel.plan import current_plan

    plan = current_plan()
    if plan is None:
        return None, None, None
    route, reason = plan.route_explain(seq_q, seq_k, heads, masked=masked)
    return plan, route, reason


def _context_plan_route(seq_q: int, seq_k: int, heads: int, masked: bool):
    """(plan, route) — see _context_plan_route_explain."""
    plan, route, _ = _context_plan_route_explain(seq_q, seq_k, heads, masked)
    return plan, route


def flash_route(seq_q: int, seq_k: int, masked: bool = False) -> bool:
    """True when `attention` will take the Pallas flash path for these
    (static) sequence lengths. Exposed so model code can make layout
    decisions that depend on the routing — e.g. emitting head_dim already
    padded to the kernel's 128-lane width from the projection einsum
    (models/attention_proj.py `emit_dim`), which deletes the separate
    pad/slice copies around every kernel call.

    Under an active context-parallel plan (parallel/plan.py) that routes
    this shape to the ring, returns False — the ring path uses dense
    per-shard blocks and wants the true head_dim. (Ring routing is
    head-count independent, so heads=1 is exact here; any flash-eligible
    sequence — >=1024, 128-aligned — is also ring-eligible.)"""
    if _COUNTING_MODEL_FLOPS:
        return False
    _, route = _context_plan_route(seq_q, seq_k, 1, masked)
    if route is not None:
        return False
    return (
        not masked
        and seq_q >= 1024
        and seq_q == seq_k
        # the Pallas kernel tiles the sequence into lane-aligned blocks
        # (flash_attention_kernel.snap_block); non-128-multiple lengths
        # take the XLA path
        and seq_q % 128 == 0
        and jax.devices()[0].platform not in ("cpu",)
    )


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
) -> jax.Array:
    """Dispatching attention entry point.

    Under an active context-parallel plan (parallel/plan.py), long
    self-attention runs as ring attention over the ICI ring and
    cross-attention as Ulysses head-sharded attention — the model-layer
    wiring of SURVEY §2.8's context parallelism (the TPU-native analogue
    of the reference's xformers monkeypatch, reference
    stable_diffusion.py:68-80). Otherwise uses the Pallas flash kernel
    for long unmasked self-attention on TPU (where avoiding the S x S
    HBM roundtrip matters), XLA else.
    """
    from perceptor_tpu.parallel.plan import record_route

    seq_q, seq_k = q.shape[-2], k.shape[-2]
    heads = q.shape[1]
    site_shape = (seq_q, seq_k, heads)
    plan, plan_route, plan_reason = _context_plan_route_explain(
        seq_q, seq_k, heads, mask is not None
    )
    if plan_route is not None:
        from perceptor_tpu.parallel.plan import RING
        from perceptor_tpu.parallel.ring_attention import ring_attention
        from perceptor_tpu.parallel.ulysses import ulysses_attention

        record_route("attention", site_shape, plan_route, plan_reason)
        route_fn = ring_attention if plan_route == RING else ulysses_attention
        return route_fn(
            q, k, v, plan.mesh, scale=scale,
            context_axis=plan.context_axis, batch_axis=plan.batch_axis,
        )
    if use_flash is None:
        use_flash = flash_route(seq_q, seq_k, masked=mask is not None)
    if _COUNTING_MODEL_FLOPS:
        use_flash = False  # even when forced: count the mathematical step
    if use_flash and _flash_available():
        from perceptor_tpu.ops.flash_attention_kernel import flash_attention

        record_route(
            "attention", site_shape, "flash",
            "Pallas flash kernel (long unmasked self-attention on TPU)"
            + (f"; plan fallback: {plan_reason}" if plan is not None else ""),
        )
        return flash_attention(q, k, v, scale=scale)
    record_route(
        "attention", site_shape, "xla",
        "XLA dot-product attention"
        + (f"; plan fallback: {plan_reason}" if plan is not None else ""),
    )
    return dot_product_attention(q, k, v, mask=mask, scale=scale)
