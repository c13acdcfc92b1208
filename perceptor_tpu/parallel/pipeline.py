"""GPipe-style pipeline parallelism over the `stage` mesh axis.

SURVEY §2.8's optional pipeline component: split a deep network into N
stages, one per device along the `stage` axis, and stream M microbatches
through so every device works concurrently after the fill phase
(efficiency M / (M + N - 1); no backward bubble beyond reverse-mode
replay of the same schedule — JAX autodiff differentiates the whole
schedule, ppermute transposing to the reverse rotation).

The executor handles homogeneous stages (same activation shape in/out)
— the transformer-stack / repeated-UNet-block case. Each tick:
stage 0 injects the next microbatch, every device applies its stage to
its current activation, the last stage banks its finished microbatch,
and activations rotate one hop along the ICI ring (stage i -> i+1).

`stage_params` carries the per-stage weights stacked on a leading axis
that shard_map splits over `stage`, so each device only holds (and only
loads) 1/N of the pipeline's parameters.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from perceptor_tpu.parallel.mesh import AXIS_STAGE


def _varying(x, axis_name):
    """Mark x device-varying over axis_name (jax>=0.9 vma types)."""
    pcast = getattr(jax.lax, "pcast", None)
    if pcast is not None:
        try:
            return pcast(x, axis_name, to="varying")
        except TypeError:
            pass
    return jax.lax.pvary(x, axis_name)


def pipeline_body(
    stage_fn: Callable,
    stage_params,
    microbatches: jax.Array,
    axis_name: str = AXIS_STAGE,
) -> jax.Array:
    """Per-shard pipeline schedule — call INSIDE shard_map.

    `stage_params` is this device's stage weights (leading stage axis
    already split by shard_map); `microbatches` is the full (M, ...)
    stack, replicated. Returns the (M, ...) outputs, replicated.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    m = microbatches.shape[0]
    ticks = m + n - 1
    perm = [(i, i + 1) for i in range(n - 1)]  # no wraparound: stage i -> i+1

    state0 = _varying(jnp.zeros_like(microbatches[0]), axis_name)
    outputs0 = _varying(jnp.zeros_like(microbatches), axis_name)

    def tick(carry, t):
        state, outputs = carry
        mb = microbatches[jnp.clip(t, 0, m - 1)]
        x_in = jnp.where(idx == 0, mb, state)
        y = stage_fn(stage_params, x_in)
        out_idx = t - (n - 1)
        bank = jax.lax.dynamic_update_index_in_dim(
            outputs, y, jnp.maximum(out_idx, 0), 0
        )
        outputs = jnp.where((idx == n - 1) & (out_idx >= 0), bank, outputs)
        state = jax.lax.ppermute(y, axis_name, perm) if n > 1 else y
        return (state, outputs), None

    (_, outputs), _ = jax.lax.scan(
        tick, (state0, outputs0), jnp.arange(ticks)
    )
    # replicate the result (it lives on the last stage)
    return jax.lax.psum(jnp.where(idx == n - 1, outputs, 0), axis_name)


def pipeline(
    stage_fn: Callable,
    stage_params,
    x: jax.Array,
    mesh: jax.sharding.Mesh,
    n_microbatches: int,
    stage_axis: str = AXIS_STAGE,
) -> jax.Array:
    """Run x (batch leading) through N pipelined stages of `stage_fn`.

    `stage_params` leaves have a leading n_stages axis (split over the
    stage mesh axis); `stage_fn(params_i, x) -> y` must preserve the
    activation shape. The batch must divide by n_microbatches.
    """
    n_stages = mesh.shape[stage_axis]
    batch = x.shape[0]
    if batch % n_microbatches:
        raise ValueError(f"batch {batch} not divisible by {n_microbatches} microbatches")
    for leaf in jax.tree.leaves(stage_params):
        if leaf.shape[0] != n_stages:
            raise ValueError(
                f"stage_params leading dim {leaf.shape[0]} != {n_stages} stages"
            )
    mb = x.reshape(n_microbatches, batch // n_microbatches, *x.shape[1:])

    def local_stage_fn(sp, h):
        # shard_map leaves a length-1 stage dim on each param leaf
        return stage_fn(jax.tree.map(lambda p: p[0], sp), h)

    body = functools.partial(pipeline_body, local_stage_fn, axis_name=stage_axis)
    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(stage_axis), stage_params),
            P(),
        ),
        out_specs=P(),
    )
    out = f(stage_params, mb)
    return out.reshape(batch, *x.shape[1:])
