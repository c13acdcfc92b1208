"""Mesh/sharding tests on the virtual 8-device CPU mesh (conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from perceptor_tpu import parallel
from perceptor_tpu.models.stable_diffusion import UNet, config as sd_config


def test_create_mesh_shapes():
    mesh = parallel.create_mesh()
    assert mesh.shape[parallel.AXIS_DATA] == 8
    mesh = parallel.create_mesh(tensor=4)
    assert mesh.shape[parallel.AXIS_DATA] == 2
    assert mesh.shape[parallel.AXIS_TENSOR] == 4
    with pytest.raises(ValueError):
        parallel.create_mesh(data=3, tensor=3)


def test_partition_rules_col_row():
    mesh = parallel.create_mesh(tensor=4, data=2)
    params = {
        "attn1": {"to_q": {"kernel": jnp.zeros((64, 64))}},
        "ff": {"net_2": {"kernel": jnp.zeros((256, 64)), "bias": jnp.zeros((64,))}},
        "norm": {"scale": jnp.zeros((64,))},
        "odd": {"to_q": {"kernel": jnp.zeros((6, 6))}},  # not divisible by 4
    }
    specs = parallel.partition_params(
        params, parallel.SD_TENSOR_PARALLEL_RULES, mesh
    )
    assert specs["attn1"]["to_q"]["kernel"] == P(None, "tensor")
    assert specs["ff"]["net_2"]["kernel"] == P("tensor", None)
    assert specs["ff"]["net_2"]["bias"] == P()
    assert specs["norm"]["scale"] == P()
    assert specs["odd"]["to_q"]["kernel"] == P()  # demoted


def test_sharded_unet_matches_single_device():
    """TP+DP-sharded UNet forward == unsharded forward (GSPMD inserts the
    collectives; numerics must not change)."""
    cfg = sd_config.TINY_UNET
    module = UNet(cfg)
    latents = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16))
    timesteps = jnp.array([500.0, 10.0])
    context = jax.random.normal(jax.random.PRNGKey(2), (2, 8, cfg.context_dim))
    params = module.init(jax.random.PRNGKey(0), latents, timesteps, context)["params"]

    expected = module.apply({"params": params}, latents, timesteps, context)

    mesh = parallel.create_mesh(tensor=4, data=2)
    sharded_params = parallel.shard_params(params, mesh)
    sharded_latents = parallel.shard_batch(latents, mesh)
    sharded_ts = parallel.shard_batch(timesteps, mesh)
    sharded_ctx = parallel.shard_batch(context, mesh)

    @jax.jit
    def forward(p, lat, ts, ctx):
        return module.apply({"params": p}, lat, ts, ctx)

    # no set_mesh: inputs carry NamedShardings; GSPMD auto-propagates
    actual = forward(sharded_params, sharded_latents, sharded_ts, sharded_ctx)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), atol=2e-5)


def test_shard_batch_places_on_data_axis():
    mesh = parallel.create_mesh()
    x = jnp.zeros((8, 3, 4, 4))
    sharded = parallel.shard_batch(x, mesh)
    assert sharded.sharding.spec == P("data", None, None, None)


def test_data_parallel_sample_scan():
    """Serving shape: the whole SD sample() scan with the batch sharded on
    the data axis — output stays sharded and matches the unsharded run."""
    from jax.sharding import NamedSharding

    from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer
    from perceptor_tpu.models.stable_diffusion import StableDiffusion

    model = StableDiffusion(
        name="tiny", fp16=False, tokenizer=SimpleTokenizer(merges=[])
    )  # fp32: bf16 reduction-order noise is amplified by CFG across steps
    mesh = parallel.create_mesh()  # 8-way data
    texts = ["a"] * 8
    uncond = model.conditioning([""] * 8)
    cond = model.conditioning(texts)
    pairs = jnp.asarray(model.schedule_indices(n_steps=2))
    key = jax.random.PRNGKey(0)
    latents = model.random_diffused_latents((8, 32, 32), key)

    expected = model._sample_scan(
        model.params, latents, pairs, uncond, cond, 3.0, 0.0, key
    )

    replicated = NamedSharding(mesh, P())
    sharded = model._sample_scan(
        jax.device_put(model.params, replicated),
        jax.device_put(latents, NamedSharding(mesh, P(parallel.AXIS_DATA))),
        jax.device_put(pairs, replicated),
        jax.device_put(uncond, replicated),
        jax.device_put(cond, replicated),
        3.0,
        0.0,
        jax.device_put(key, replicated),
    )
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(expected), atol=1e-3
    )


def test_spatial_context_sharded_unet_matches_single_device():
    """Context-parallel (spatial) sharding: latent H sharded over the
    `context` axis. GSPMD inserts halo exchanges for the 3x3 convs and
    gathers for attention; numerics must match the unsharded forward
    (SURVEY §2.8: sequence/context parallelism over image tokens)."""
    from jax.sharding import NamedSharding

    cfg = sd_config.TINY_UNET
    module = UNet(cfg)
    latents = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 32, 32))
    timesteps = jnp.array([500.0, 10.0])
    context = jax.random.normal(jax.random.PRNGKey(2), (2, 8, cfg.context_dim))
    params = module.init(jax.random.PRNGKey(0), latents, timesteps, context)["params"]

    expected = module.apply({"params": params}, latents, timesteps, context)

    mesh = parallel.create_mesh(data=2, context=4)
    sharded_latents = jax.device_put(
        latents, NamedSharding(mesh, P("data", None, "context", None))
    )
    sharded_params = parallel.replicate(params, mesh)
    sharded_ts = parallel.shard_batch(timesteps, mesh)
    sharded_ctx = parallel.shard_batch(context, mesh)

    @jax.jit
    def forward(p, lat, ts, ctx):
        return module.apply({"params": p}, lat, ts, ctx)

    actual = forward(sharded_params, sharded_latents, sharded_ts, sharded_ctx)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), atol=2e-5)


# -- multi-host / DCN hybrid mesh ------------------------------------------


class _FakeDevice:
    def __init__(self, id, process_index=0, slice_index=None):
        self.id = id
        self.process_index = process_index
        if slice_index is not None:
            self.slice_index = slice_index

    def __repr__(self):
        return f"FakeDevice({self.id})"


def test_group_by_granule():
    # multi-slice: groups by slice_index
    devs = [_FakeDevice(i, slice_index=i // 4) for i in range(8)]
    granules = parallel.group_by_granule(devs)
    assert [len(g) for g in granules] == [4, 4]
    assert [d.id for d in granules[0]] == [0, 1, 2, 3]
    # single-slice multi-host: falls back to process_index
    devs = [_FakeDevice(i, process_index=i % 2) for i in range(8)]
    granules = parallel.group_by_granule(devs)
    assert [len(g) for g in granules] == [4, 4]
    assert [d.id for d in granules[0]] == [0, 2, 4, 6]
    # partial granule -> error
    devs = [_FakeDevice(i, slice_index=min(i, 1)) for i in range(5)]
    with pytest.raises(ValueError, match="unequal"):
        parallel.group_by_granule(devs)


def test_create_hybrid_mesh_degenerates_to_single_granule():
    # all 8 virtual CPU devices are one process = one granule
    mesh = parallel.create_hybrid_mesh(data=-1, tensor=2)
    assert mesh.shape[parallel.AXIS_DATA] == 4
    assert mesh.shape[parallel.AXIS_TENSOR] == 2
    with pytest.raises(ValueError, match="granules"):
        parallel.create_hybrid_mesh(data_dcn=2, data=2, tensor=2)


def test_create_hybrid_mesh_dcn_outermost_and_computes():
    """Two simulated DCN granules (granule_key): the data axis merges
    dcn (outermost) x inner data, and a data-parallel psum computes the
    same result as the unsharded program."""
    devices = jax.devices()
    granule = {d.id: d.id % 2 for d in devices}
    mesh = parallel.create_hybrid_mesh(
        data=2, tensor=2, granule_key=lambda d: granule[d.id]
    )
    assert mesh.shape[parallel.AXIS_DATA] == 4
    assert mesh.shape[parallel.AXIS_TENSOR] == 2
    # DCN granule is slowest-varying along the data axis: the first half
    # of the data rows live entirely in granule 0
    dev_array = np.asarray(mesh.devices)
    first_half = dev_array[:2].ravel()
    assert {granule[d.id] for d in first_half} == {0}
    assert {granule[d.id] for d in dev_array[2:].ravel()} == {1}

    # and it actually runs: data-parallel mean-of-squares over the mesh
    x = jnp.arange(32.0).reshape(8, 4)
    xs = parallel.shard_batch(x, mesh)
    got = jax.jit(lambda v: jnp.mean(v * v))(xs)
    np.testing.assert_allclose(float(got), float(jnp.mean(x * x)), rtol=1e-6)


def test_global_batch_from_local_matches_shard_batch():
    mesh = parallel.create_mesh(data=8)
    x = np.arange(64, dtype=np.float32).reshape(8, 8)
    a = parallel.global_batch_from_local(x, mesh)
    b = parallel.shard_batch(jnp.asarray(x), mesh)
    assert a.sharding.is_equivalent_to(b.sharding, a.ndim)
    np.testing.assert_array_equal(np.asarray(a), x)
