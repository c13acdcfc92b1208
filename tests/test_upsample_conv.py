"""Fused nearest-up+conv3x3 phase decomposition: exactness vs the naive op."""

import jax
import jax.numpy as jnp
import numpy as np

from perceptor_tpu.ops.upsample_conv import upsample2x_nearest_conv3x3


def _naive(x, kernel, bias):
    n, h, w, c = x.shape
    up = jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")
    out = jax.lax.conv_general_dilated(
        up, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias if bias is not None else out


def test_matches_naive_exactly():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 7, 5, 8))
    kernel = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 12))
    bias = jax.random.normal(jax.random.PRNGKey(2), (12,))

    got = upsample2x_nearest_conv3x3(x, kernel, bias)
    want = _naive(x, kernel, bias)
    assert got.shape == (2, 14, 10, 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_grads_match_naive():
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 6, 6, 4))
    kernel = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 4, 4))

    gx_f, gk_f = jax.grad(
        lambda x, k: jnp.sum(jnp.sin(upsample2x_nearest_conv3x3(x, k))),
        argnums=(0, 1),
    )(x, kernel)
    gx_n, gk_n = jax.grad(
        lambda x, k: jnp.sum(jnp.sin(_naive(x, k, None))), argnums=(0, 1)
    )(x, kernel)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_n), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_f), np.asarray(gk_n), atol=1e-4)


def test_bf16_dtype_preserved():
    x = jnp.ones((1, 4, 4, 4), jnp.bfloat16)
    kernel = jnp.ones((3, 3, 4, 4), jnp.bfloat16)
    out = upsample2x_nearest_conv3x3(x, kernel)
    assert out.dtype == jnp.bfloat16
