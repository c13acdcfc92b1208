"""Ulysses head-sharded sequence-parallel attention vs full attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu import parallel
from perceptor_tpu.ops.attention import dot_product_attention
from perceptor_tpu.parallel.ulysses import ulysses_attention


def _qkv(key, b=2, h=8, sq=64, sk=None, d=16, dtype=jnp.float32):
    sk = sq if sk is None else sk
    kq, kk, kv = jax.random.split(key, 3)
    return (
        jax.random.normal(kq, (b, h, sq, d), dtype),
        jax.random.normal(kk, (b, h, sk, d), dtype),
        jax.random.normal(kv, (b, h, sk, d), dtype),
    )


@pytest.mark.parametrize("context,data", [(8, 1), (4, 2)])
def test_ulysses_matches_full(context, data):
    mesh = parallel.create_mesh(
        data=data, context=context, devices=jax.devices()[: context * data]
    )
    q, k, v = _qkv(jax.random.PRNGKey(0))
    out = ulysses_attention(q, k, v, mesh)
    expected = dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_ulysses_cross_attention_short_kv():
    """The motivating case: cross-attention with a short (77-token-like)
    K/V — q seq and kv seq differ."""
    mesh = parallel.create_mesh(data=1, context=8)
    q, k, v = _qkv(jax.random.PRNGKey(1), sq=128, sk=16)
    out = ulysses_attention(q, k, v, mesh)
    expected = dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_ulysses_grad_matches_full():
    mesh = parallel.create_mesh(data=1, context=4, devices=jax.devices()[:4])
    q, k, v = _qkv(jax.random.PRNGKey(2), b=1, h=4, sq=32, d=8)

    ref = jax.grad(lambda q: jnp.sum(jnp.square(dot_product_attention(q, k, v))))(q)
    got = jax.grad(lambda q: jnp.sum(jnp.square(ulysses_attention(q, k, v, mesh))))(q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_ulysses_rejects_bad_heads():
    mesh = parallel.create_mesh(data=1, context=8)
    q, k, v = _qkv(jax.random.PRNGKey(3), h=4)  # 4 heads < 8 devices
    with pytest.raises(ValueError):
        ulysses_attention(q, k, v, mesh)


def test_ulysses_pads_indivisible_sequences():
    """77-token cross-attention K/V (prime — divides by nothing): padded
    keys are masked, padded query rows sliced off; matches full attention."""
    mesh = parallel.create_mesh(data=1, context=8)
    q, k, v = _qkv(jax.random.PRNGKey(4), sq=64, sk=77)
    out = ulysses_attention(q, k, v, mesh)
    expected = dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)
    # indivisible q too
    q, k, v = _qkv(jax.random.PRNGKey(5), sq=60, sk=77)
    out = ulysses_attention(q, k, v, mesh)
    expected = dot_product_attention(q, k, v)
    assert out.shape == expected.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)
