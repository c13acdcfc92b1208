"""Context-parallel routing report (VERDICT r3 weak #6 / next #8).

The plan's silent fallbacks (masked attention, non-dividing sizes or
head counts, shard_spatial no-ops) previously left no signal anywhere
that the ring never engaged. `parallel.record_routing()` /
`parallel.explain()` record every attention and shard_spatial decision
at trace time, with the rule that made it; `StableDiffusion.sample(
verbose=True)` surfaces the report for a full sampling program.
"""

import jax
import jax.numpy as jnp
import numpy as np

from perceptor_tpu import parallel
from perceptor_tpu.ops.attention import attention


def _mesh(context=8, data=1):
    return parallel.create_mesh(
        data=data, context=context, devices=jax.devices()[: context * data]
    )


def _plan(mesh):
    return parallel.plan_for_mesh(mesh)


# -- route_explain reasons ----------------------------------------------------


def test_route_explain_ring():
    plan = _plan(_mesh())
    # bandwidth-clean ring: shard 8192/8 = 1024 >= ring_min_shard
    route, reason = plan.route_explain(8192, 8192, 8)
    assert route == "ring"
    assert "1024" in reason and "ring_min_shard" in reason


def test_route_explain_short_shard_prefers_ulysses():
    """Priced crossover (scripts/ab_ring_price.py): below ring_min_shard
    the ring's hops are comm-bound and Ulysses moves n/2x fewer bytes —
    head-divisible shapes switch."""
    plan = _plan(_mesh())
    route, reason = plan.route_explain(2048, 2048, 8)
    assert route == "ulysses"
    assert "ring_min_shard" in reason


def test_route_explain_ring_memory_fallback():
    """Shapes Ulysses cannot serve (heads don't divide) still ride the
    ring at long global seq: comm-bound hops, but memory scales 1/n."""
    plan = _plan(_mesh())
    route, reason = plan.route_explain(2048, 2048, 5)
    assert route == "ring"
    assert "not Ulysses-divisible" in reason


def test_route_explain_ulysses_cross():
    plan = _plan(_mesh())
    route, reason = plan.route_explain(4096, 77, 8)
    assert route == "ulysses"
    assert "cross-attention" in reason


def test_route_explain_fallbacks_have_reasons():
    plan = _plan(_mesh())
    # masked
    route, reason = plan.route_explain(2048, 2048, 8, masked=True)
    assert route is None and "masked" in reason
    # short self-attention with non-dividing heads
    route, reason = plan.route_explain(100, 100, 5)
    assert route is None
    assert "heads 5" in reason and "GSPMD" in reason
    # non-dividing sequence but dividing heads -> ulysses with the why
    route, reason = plan.route_explain(1030, 1030, 8)
    assert route == "ulysses" and "not divisible" in reason


# -- trace-time recording through ops.attention -------------------------------


def _qkv(seq, heads=8, dim=16, seq_k=None):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, heads, seq, dim)).astype(np.float32))
    k = jnp.asarray(
        rng.normal(size=(1, heads, seq_k or seq, dim)).astype(np.float32)
    )
    return q, k, k


def test_record_routing_ring_site():
    mesh = _mesh()
    with parallel.context_parallel(mesh):
        with parallel.record_routing() as report:
            jax.eval_shape(attention, *_qkv(8192))
    routes = report.routes()
    assert routes.get("ring") == 1
    (rec,) = report.records
    assert rec.site == "attention" and rec.shape == (8192, 8192, 8)


def test_record_routing_fallback_site():
    mesh = _mesh()
    with parallel.context_parallel(mesh):
        with parallel.record_routing() as report:
            jax.eval_shape(attention, *_qkv(100, heads=5))
    (rec,) = report.records
    assert rec.route == "xla"
    assert "plan fallback" in rec.reason and "heads 5" in rec.reason


def test_record_routing_without_plan_records_xla():
    with parallel.record_routing() as report:
        jax.eval_shape(attention, *_qkv(256, heads=4))
    (rec,) = report.records
    assert rec.route == "xla" and "plan fallback" not in rec.reason


def test_shard_spatial_records_noop_and_shard():
    mesh = _mesh()
    x_good = jnp.zeros((2, 64, 8, 3))
    x_bad = jnp.zeros((2, 63, 8, 3))
    with parallel.context_parallel(mesh):
        with parallel.record_routing() as report:
            with mesh:
                parallel.shard_spatial(x_good)
            parallel.shard_spatial(x_bad)
    by_route = {rec.route: rec for rec in report}
    assert by_route["sharded"].shape == (2, 64, 8, 3)
    assert by_route[None].shape == (2, 63, 8, 3)
    assert "not divisible" in by_route[None].reason


def test_explain_helper():
    """parallel.explain traces abstractly (no execution) and reports."""
    mesh = _mesh()

    def fn(q, k, v):
        a = attention(q, k, v)  # ring (shard 1024 = ring_min_shard)
        b = attention(q[:, :, :77], k, v)  # cross -> ulysses
        return a, b

    report = parallel.explain(fn, *_qkv(8192), mesh=mesh)
    routes = report.routes()
    assert routes.get("ring") == 1 and routes.get("ulysses") == 1
    assert "ring" in report.summary()


def test_report_counts_dedupe():
    mesh = _mesh()

    def fn(q, k, v):
        return attention(q, k, v) + attention(q, k, v)

    report = parallel.explain(fn, *_qkv(2048), mesh=mesh)
    (rec,) = report.records
    assert rec.count == 2


def test_sd_sample_verbose_surfaces_report():
    from perceptor_tpu.models.stable_diffusion import StableDiffusion

    model = StableDiffusion("tiny", fp16=False)
    images = model.sample(
        ["a cat"], n_steps=2, size=(64, 64), key=jax.random.PRNGKey(0),
        verbose=True,
    )
    assert images.shape[0] == 1
    report = model.last_routing_report
    assert len(report) > 0
    # tiny SD at 64px has no context mesh: everything records as xla/flash
    assert all(rec.route in ("xla", "flash") for rec in report)
