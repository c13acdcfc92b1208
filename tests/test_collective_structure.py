"""Compiled-HLO collective-structure guard (VERDICT r3 missing #3 / next #2).

Numeric parity on the virtual mesh proves sharded programs are CORRECT;
nothing previously proved they were EFFICIENT. A GSPMD regression that
silently all-gathers the full token axis (e.g. a lost
with_sharding_constraint) passes every allclose test and the driver
dryrun while destroying the multi-chip story. In a 1-chip environment,
the compiled program's collective inventory (utils/hlo.py) is the only
available multi-chip perf signal: these tests lower+compile the real
sharded programs on the 8-device CPU mesh and assert the inventory —
ring ppermutes present, NO activation-sized all-gather of the token
axis, TP psums present, no full-param all-gathers.

Reference context: this guards the rebuild's replacement for the
wired-in xformers attention (reference perceptor/models/
stable_diffusion/stable_diffusion.py:68-80).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from perceptor_tpu import parallel
from perceptor_tpu.models.stable_diffusion import StableDiffusion
from perceptor_tpu.utils.hlo import (
    collective_counts,
    collective_inventory,
    max_gather_elements,
)


def _tiny_sd():
    return StableDiffusion("tiny", fp16=False)


def _unet_inputs(model, latent_hw=32, batch=2, seed=0):
    rng = np.random.default_rng(seed)
    latents = jnp.asarray(
        rng.normal(size=(batch, 4, latent_hw, latent_hw)).astype(np.float32)
    )
    ts = jnp.asarray([500.0] * batch, jnp.float32)
    ctx = jnp.asarray(
        rng.normal(
            size=(batch, 8, model.unet_config.context_dim)
        ).astype(np.float32)
    )
    return latents, ts, ctx


# -- ring attention: pure collective skeleton ---------------------------------


def test_ring_attention_structure():
    """fwd+VJP ring program: ppermutes rotate K/V blocks; the full token
    axis is NEVER re-gathered (that is the entire point of the ring)."""
    mesh = parallel.create_mesh(data=1, context=8)
    n = 8
    q = jnp.zeros((2, 8, 4096, 64))

    def loss(q, k, v):
        return parallel.ring_attention(q, k, v, mesh).sum()

    txt = jax.jit(jax.grad(loss)).lower(q, q, q).compile().as_text()
    counts = collective_counts(txt)
    # fwd rotates K and V (n-1) steps; VJP rotates again and routes
    # gradient blocks back — at minimum the fwd's 2*(n-1) ppermutes
    assert counts.get("collective-permute", 0) >= 2 * (n - 1)
    assert counts.get("all-gather", 0) == 0, txt[:2000]


def test_ulysses_attention_structure():
    """Ulysses: all-to-all head<->sequence reshard, never a full-seq
    activation all-gather."""
    mesh = parallel.create_mesh(data=1, context=8)
    q = jnp.zeros((2, 8, 4096, 64))
    kv = jnp.zeros((2, 8, 77, 64))

    def fn(q, k, v):
        return parallel.ulysses_attention(q, k, v, mesh)

    txt = jax.jit(fn).lower(q, kv, kv).compile().as_text()
    counts = collective_counts(txt)
    assert counts.get("all-to-all", 0) >= 1
    # gathering the (short) K/V sequence to every device is fine;
    # gathering the 4096-token Q activation is not
    assert max_gather_elements(txt) < 2 * 8 * 4096 * 64


# -- context-parallel UNet: the model-layer program ---------------------------


def _cp_unet_compiled(model, mesh, with_vjp):
    latents, ts, ctx = _unet_inputs(model)
    plan = parallel.plan_for_mesh(mesh)
    spatial = NamedSharding(mesh, plan.spatial_spec(4, 2, latents.shape[0]))
    latents = jax.device_put(latents, spatial)
    params = parallel.replicate({"params": model.params["unet"]}, mesh)

    def fwd(p, x, t, c):
        return model.unet.apply(p, x, t, c)

    def vjp_loss(p, x, t, c):
        return (fwd(p, x, t, c) ** 2).mean()

    fn = jax.grad(vjp_loss, argnums=1) if with_vjp else fwd
    with parallel.context_parallel(mesh):
        txt = (
            jax.jit(lambda x: fn(params, x, ts, ctx))
            .lower(latents)
            .compile()
            .as_text()
        )
    return txt, latents


@pytest.mark.parametrize("with_vjp", [False, True], ids=["fwd", "fwd+vjp"])
def test_cp_unet_no_token_axis_gather(with_vjp):
    """The spatially-sharded UNet program (1024 tokens at L0 on the ring)
    must not contain an activation-sized all-gather: the L0 token axis
    stays sharded through attention AND the conv body (halo exchanges are
    ppermutes, not gathers)."""
    model = _tiny_sd()
    mesh = parallel.create_mesh(data=1, context=8)
    txt, latents = _cp_unet_compiled(model, mesh, with_vjp)
    counts = collective_counts(txt)
    assert counts.get("collective-permute", 0) >= 1, counts

    # forbidden: any all-gather the size of a full L0 activation (or
    # bigger). L0: 32x32 tokens x model_channels (tiny: ch0).
    ch0 = model.unet_config.base_channels
    full_l0 = 2 * 32 * 32 * ch0
    big = [
        op for op in collective_inventory(txt)
        if op.op == "all-gather" and op.elements >= full_l0
    ]
    assert not big, "\n".join(op.line[:200] for op in big)


def test_cp_unet_guard_has_teeth():
    """The forbidden pattern IS detectable: deliberately un-shard the
    token axis mid-program (what a lost with_sharding_constraint does)
    and the same assertion trips."""
    model = _tiny_sd()
    mesh = parallel.create_mesh(data=1, context=8)
    plan = parallel.plan_for_mesh(mesh)
    latents, ts, ctx = _unet_inputs(model)
    spatial = NamedSharding(mesh, plan.spatial_spec(4, 2, latents.shape[0]))
    latents = jax.device_put(latents, spatial)

    def broken(x):
        # replicate the activation (== XLA re-gathering the token axis)
        gathered = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P())
        )
        return gathered * 2.0

    txt = jax.jit(broken).lower(latents).compile().as_text()
    ch0 = 4  # latent channels here; the gather is the full latent
    assert max_gather_elements(txt) >= 2 * 32 * 32 * ch0


# -- tensor-parallel guided step: Megatron structure --------------------------


def test_tp_unet_structure():
    """TP UNet step: per-block all-reduces (Megatron row-parallel psums)
    present; NO all-gather materializing a full sharded weight."""
    model = _tiny_sd()
    mesh = parallel.create_mesh(data=2, tensor=4)
    params = {"params": model.params["unet"]}
    sharded = parallel.shard_params(params, mesh)
    latents, ts, ctx = _unet_inputs(model)
    latents = parallel.shard_batch(latents, mesh)
    ts = parallel.shard_batch(ts, mesh)
    ctx = parallel.shard_batch(ctx, mesh)

    def loss(p, x, t, c):
        return (model.unet.apply(p, x, t, c) ** 2).mean()

    txt = (
        jax.jit(jax.grad(loss))
        .lower(sharded, latents, ts, ctx)
        .compile()
        .as_text()
    )
    counts = collective_counts(txt)
    assert counts.get("all-reduce", 0) >= 1, counts

    # full-param re-gather guard: Megatron TP keeps weights sharded; a
    # rules regression that makes XLA re-materialize a sharded weight
    # each step shows up as an all-gather whose output is EXACTLY that
    # weight's full shape. (Channel-sharded ACTIVATION gathers at conv
    # edges are expected TP structure and have batch-leading shapes that
    # don't match any weight.)
    specs = parallel.partition_params(
        params, parallel.SD_TENSOR_PARALLEL_RULES, mesh
    )
    sharded_shapes = {
        tuple(leaf.shape)
        for leaf, spec in zip(
            jax.tree.leaves(params),
            jax.tree.leaves(specs, is_leaf=lambda s: isinstance(s, P)),
        )
        if spec != P() and np.ndim(leaf) >= 2
    }
    assert sharded_shapes  # the rules actually shard something
    offenders = [
        op for op in collective_inventory(txt)
        if op.op == "all-gather"
        and any(shape in sharded_shapes for shape in op.shapes)
    ]
    assert not offenders, "\n".join(o.line[:200] for o in offenders)


# -- context-sharded sampling scan -------------------------------------------


def test_cp_sample_scan_structure():
    """The WHOLE sample() scan program under a context mesh: ring
    ppermutes inside the scan body, no full-activation all-gather.
    `prime=True` retains the compiled executable (`last_compiled`)."""
    model = _tiny_sd()
    mesh = parallel.create_mesh(data=1, context=8)
    # 256px -> latent 32 -> 1024 tokens at L0: ring-eligible, H=32 % 8 == 0
    model.sample(
        ["x"], n_steps=2, size=(256, 256), key=jax.random.PRNGKey(0),
        mesh=mesh, prime=True,
    )
    txt = model.last_compiled.as_text()
    counts = collective_counts(txt)
    assert counts.get("collective-permute", 0) >= 1, counts
    ch0 = model.unet_config.base_channels
    big = [
        op for op in collective_inventory(txt)
        if op.op == "all-gather" and op.elements >= 32 * 32 * ch0
    ]
    assert not big, "\n".join(op.line[:200] for op in big)
