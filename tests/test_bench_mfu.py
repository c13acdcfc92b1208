"""Unit tests for the bench MFU plumbing (bench_families._add_mfu).

The per-family MFU columns in docs/PERFORMANCE.md come from this helper
re-tracing the exact timed program through utils/flops.count_flops.
Guard the arithmetic and the opt-in gating with a known-FLOPs program
so a counter or wiring regression can't silently corrupt published
numbers.
"""

import jax
import jax.numpy as jnp

import bench_families


def _matmul_run():
    a = jnp.ones((64, 128))
    b = jnp.ones((128, 32))
    return a @ b


def test_add_mfu_disabled_by_default(monkeypatch):
    monkeypatch.setattr(bench_families, "MFU", False)
    result = bench_families._add_mfu({"value": 1}, _matmul_run, 0.5, 10)
    assert result == {"value": 1}


def test_add_mfu_counts_known_flops(monkeypatch):
    monkeypatch.setattr(bench_families, "MFU", True)
    result = bench_families._add_mfu({}, _matmul_run, run_s=1.0, n_steps=1)
    expected = 2 * 64 * 128 * 32  # one matmul
    assert result["counted_tflops_per_step"] == round(expected / 1e12, 3)
    # mfu = flops / seconds / peak
    assert result["mfu_pct"] == round(100 * expected / (197e12), 1)


def test_add_mfu_divides_steps(monkeypatch):
    monkeypatch.setattr(bench_families, "MFU", True)

    def run():
        x = jnp.ones((32, 32))
        return jax.lax.scan(lambda c, _: (c @ x, None), x, None, length=5)[0]

    result = bench_families._add_mfu({}, run, run_s=1.0, n_steps=5)
    per_step = 2 * 32 * 32 * 32  # scan multiplies through; /5 restores
    assert result["counted_tflops_per_step"] == round(per_step / 1e12, 3)
