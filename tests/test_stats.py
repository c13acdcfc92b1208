"""utils.stats: TPU-native training_stats equivalent.

Behavioral spec: reference torch_utils/training_stats.py (report :64,
Collector :128 — mean/std/num/as_dict delta semantics, keep_previous).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from perceptor_tpu import parallel
from perceptor_tpu.utils import stats


def test_moments_mean_std_match_numpy():
    rng = np.random.RandomState(0)
    a = rng.randn(37).astype(np.float32)
    b = rng.randn(5, 4).astype(np.float32) * 3 + 1

    bag = stats.zeros(["x"])
    bag = stats.report(bag, "x", a)
    bag = stats.report(bag, "x", b)

    collector = stats.Collector()
    collector.update(bag)
    ref = np.concatenate([a.ravel(), b.ravel()])
    assert collector.num("x") == ref.size
    assert np.isclose(collector.mean("x"), ref.mean(), atol=1e-5)
    assert np.isclose(collector.std("x"), ref.std(), atol=1e-4)
    assert np.isclose(collector["x"], ref.mean(), atol=1e-5)


def test_collector_delta_windows_and_keep_previous():
    bag = stats.zeros(["loss"])
    c = stats.Collector()

    bag = stats.report(bag, "loss", 2.0)
    bag = stats.report(bag, "loss", 4.0)
    c.update(bag)
    assert c.num("loss") == 2 and np.isclose(c.mean("loss"), 3.0)

    # next window: only the values reported since the last update
    bag = stats.report(bag, "loss", 10.0)
    c.update(bag)
    assert c.num("loss") == 1 and np.isclose(c.mean("loss"), 10.0)

    # empty window: keep_previous retains the last averages
    c.update(bag)
    assert np.isclose(c.mean("loss"), 10.0)

    # keep_previous=False clears on an empty window -> NaN mean
    c2 = stats.Collector(keep_previous=False)
    c2.update(bag)
    assert c2.num("loss") == bag["loss"].count
    c2.update(bag)
    assert np.isnan(c2.mean("loss"))


def test_std_edge_cases_and_regex():
    bag = stats.zeros(["a/one", "b/none"])
    bag = stats.report(bag, "a/one", 5.0)
    c = stats.Collector(regex=r"a/.*")
    c.update(bag)
    assert c.std("a/one") == 0.0  # single sample (reference :224)
    assert c.names() == ["a/one"]
    d = c.as_dict()
    assert set(d) == {"a/one"}
    assert d["a/one"]["num"] == 1


def test_report_inside_scan_carry():
    """The bag flows through a fused lax.scan program as part of the carry."""

    def step(carry, x):
        value, bag = carry
        value = value * 0.5 + x
        bag = stats.report(bag, "value", value)
        bag = stats.report(bag, "sq", value * value)
        return (value, bag), None

    xs = jnp.arange(10, dtype=jnp.float32)
    init = (jnp.float32(0.0), stats.zeros(["value", "sq"]))
    (final, bag), _ = jax.jit(lambda i, x: jax.lax.scan(step, i, x))(init, xs)

    # host replay
    v, values = 0.0, []
    for x in np.arange(10, dtype=np.float32):
        v = v * 0.5 + x
        values.append(v)
    c = stats.Collector()
    c.add(bag)
    assert c.num("value") == 10
    assert np.isclose(c.mean("value"), np.mean(values), atol=1e-5)
    assert np.isclose(c.std("value"), np.std(values), atol=1e-4)
    assert np.isclose(c.mean("sq"), np.mean(np.square(values)), atol=1e-4)


def test_global_sums_under_jit_with_sharded_inputs():
    """Under plain jit over sharded arrays the moments are already global."""
    mesh = parallel.create_mesh()  # 8-way data
    x = jnp.arange(32, dtype=jnp.float32).reshape(8, 4)
    x = jax.device_put(x, NamedSharding(mesh, P(parallel.AXIS_DATA, None)))

    @jax.jit
    def f(x):
        return stats.report(stats.zeros(["x"]), "x", x)

    bag = f(x)
    c = stats.Collector()
    c.add(bag)
    assert c.num("x") == 32
    assert np.isclose(c.mean("x"), np.arange(32).mean())


def test_axis_sum_inside_shard_map():
    """Explicit psum path (the all_reduce equivalent) for per-device code."""
    mesh = parallel.create_mesh()
    x = jnp.arange(16, dtype=jnp.float32).reshape(8, 2)

    def body(x_local):
        bag = stats.report(stats.zeros(["x"]), "x", x_local)
        return stats.axis_sum(bag, parallel.AXIS_DATA)

    bag = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=P(parallel.AXIS_DATA, None),
        out_specs=P(),  # replicated after psum
    )(x)
    c = stats.Collector()
    c.add(bag)
    assert c.num("x") == 16
    assert np.isclose(c.mean("x"), np.arange(16).mean())
    assert np.isclose(c.std("x"), np.arange(16).std(), atol=1e-4)


def test_merge_and_report0():
    a = stats.report(stats.zeros(["x"]), "x", jnp.ones((3,)))
    b = stats.report(stats.zeros(["x", "y"]), "x", jnp.zeros((1,)))
    merged = stats.merge(a, b)
    assert float(merged["x"].count) == 4
    assert "y" in merged

    bag = stats.report0(stats.zeros([]), "z", 7.0)  # single-process: rank 0
    assert float(bag["z"].count) == 1
