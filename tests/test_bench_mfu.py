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


# -- counter semantics (the round-4 6.47-vs-6.825 TF artifact) ----------------
#
# On TPU the flash path hides attention matmuls inside pallas_call (the
# old counter saw its block jaxpr ONCE, no grid multiplier) while the
# HeadProj emit padding inflated the visible projection dots. The fixes:
# count_flops multiplies pallas kernels through their grid (performed
# FLOPs); count_model_flops re-traces with attention forced onto the XLA
# route (model FLOPs — the MFU numerator).


def _attention_flops(b, h, s, d):
    # QK^T + PV, 2 FLOPs/MAC: 2 * (b h s s d) * 2
    return 4 * b * h * s * s * d


def test_pallas_grid_counting_matches_xla_attention():
    """The flash kernel's counted FLOPs (block jaxpr x grid) equal the
    XLA path's dots at an unpadded shape — grid multiplication is what
    the old counter was missing."""
    from perceptor_tpu.ops.attention import dot_product_attention
    from perceptor_tpu.ops.flash_attention_kernel import flash_attention
    from perceptor_tpu.utils.flops import count_flops

    q = jnp.zeros((1, 2, 1024, 128), jnp.float32)
    flash = count_flops(lambda: flash_attention(q, q, q, scale=1.0))
    xla = count_flops(lambda: dot_product_attention(q, q, q, scale=1.0))
    analytic = _attention_flops(1, 2, 1024, 128)
    assert xla == analytic
    assert flash == analytic, (flash, analytic)


def test_count_model_flops_forces_xla_route():
    """Even a use_flash=True call counts as the mathematical step under
    count_model_flops (and as the padded kernel under count_flops)."""
    from perceptor_tpu.ops.attention import attention
    from perceptor_tpu.utils.flops import count_flops, count_model_flops

    d = 64  # pads to 128 lanes in the kernel: performed = 2x model
    q = jnp.zeros((1, 2, 1024, d), jnp.float32)

    performed = count_flops(lambda: attention(q, q, q, use_flash=True))
    model = count_model_flops(lambda: attention(q, q, q, use_flash=True))
    analytic = _attention_flops(1, 2, 1024, d)
    assert model == analytic, (model, analytic)
    assert performed == _attention_flops(1, 2, 1024, 128), performed
