"""Analytic FLOP counter: known-value checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.utils.flops import count_flops, mfu


def test_dense_flops():
    w = jnp.zeros((64, 128))
    x = jnp.zeros((8, 64))
    assert count_flops(lambda x: x @ w, x) == 2 * 8 * 64 * 128


def test_conv_flops():
    x = jnp.zeros((1, 16, 16, 8))  # NHWC
    k = jnp.zeros((3, 3, 8, 32))   # HWIO
    f = lambda x: jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    assert count_flops(f, x) == 2 * (16 * 16 * 32) * (3 * 3 * 8)


def test_grouped_conv_flops():
    x = jnp.zeros((1, 16, 16, 8))
    k = jnp.zeros((3, 3, 1, 8))  # depthwise: in/groups = 1
    f = lambda x: jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", feature_group_count=8,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert count_flops(f, x) == 2 * (16 * 16 * 8) * (3 * 3 * 1)


def test_scan_multiplies_length():
    w = jnp.zeros((32, 32))

    def f(x):
        def body(c, _):
            return jnp.tanh(c @ w), None
        out, _ = jax.lax.scan(body, x, None, length=7)
        return out

    assert count_flops(f, jnp.zeros((4, 32))) == 7 * 2 * 4 * 32 * 32


def test_jit_and_remat_recursed():
    w = jnp.zeros((16, 16))
    f = jax.jit(jax.checkpoint(lambda x: x @ w))
    assert count_flops(f, jnp.zeros((2, 16))) == 2 * 2 * 16 * 16


def test_vjp_counts_what_it_traces():
    w = jnp.zeros((16, 16))
    fwd = lambda x: jnp.sum(x @ w)
    fwd_flops = count_flops(fwd, jnp.zeros((2, 16)))
    grad_flops = count_flops(jax.grad(fwd), jnp.zeros((2, 16)))
    # grad traces the forward pass plus one transposed matmul: 2x forward
    assert grad_flops == 2 * fwd_flops


def test_mfu_math():
    assert mfu(197e12, 1.0) == pytest.approx(1.0)
    with pytest.raises(ValueError):
        mfu(1, 0.0)
