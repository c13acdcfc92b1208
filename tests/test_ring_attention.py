"""Ring attention (context parallelism) vs single-device attention.

Validates SURVEY §2.8's context-parallel component on the virtual
8-device CPU mesh: forward parity with ops.attention.dot_product_attention
and gradient parity through the ring (the VJP rides the same ppermutes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu import parallel
from perceptor_tpu.ops.attention import dot_product_attention


def _qkv(key, b=2, h=4, s=64, d=32, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), dtype)
    k = jax.random.normal(kk, (b, h, s, d), dtype)
    v = jax.random.normal(kv, (b, h, s, d), dtype)
    return q, k, v


@pytest.mark.parametrize("context,data", [(8, 1), (4, 2), (2, 1)])
def test_ring_attention_matches_full(context, data):
    mesh = parallel.create_mesh(
        data=data, context=context, devices=jax.devices()[: context * data]
    )
    q, k, v = _qkv(jax.random.PRNGKey(0))
    expected = dot_product_attention(q, k, v)
    out = parallel.ring_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_ring_attention_grad_matches_full():
    mesh = parallel.create_mesh(data=1, context=8)
    q, k, v = _qkv(jax.random.PRNGKey(1), b=1, h=2, s=32, d=16)

    def ref_loss(q, k, v):
        return jnp.sum(jnp.square(dot_product_attention(q, k, v)))

    def ring_loss(q, k, v):
        return jnp.sum(jnp.square(parallel.ring_attention(q, k, v, mesh)))

    ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    ring_grads = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    for rg, gg in zip(ref_grads, ring_grads):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(rg), atol=1e-4)


def test_ring_attention_under_jit_with_sharded_inputs():
    """Global arrays placed with a context-sharded NamedSharding stay
    sharded through a jitted ring attention call (no implicit gather)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = parallel.create_mesh(data=2, context=4)
    q, k, v = _qkv(jax.random.PRNGKey(2), b=2, h=2, s=128, d=32)
    sharding = NamedSharding(mesh, P(parallel.AXIS_DATA, None, parallel.AXIS_CONTEXT))
    q, k, v = (jax.device_put(x, sharding) for x in (q, k, v))

    out = jax.jit(lambda q, k, v: parallel.ring_attention(q, k, v, mesh))(q, k, v)
    expected = dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_ring_attention_bf16_stats_stay_fp32():
    mesh = parallel.create_mesh(data=1, context=4, devices=jax.devices()[:4])
    q, k, v = _qkv(jax.random.PRNGKey(3), s=64, dtype=jnp.bfloat16)
    out = parallel.ring_attention(q, k, v, mesh)
    assert out.dtype == jnp.bfloat16
    expected = dot_product_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expected, np.float32), atol=2e-2
    )


def test_ring_attention_rejects_indivisible_seq():
    mesh = parallel.create_mesh(data=1, context=8)
    q, k, v = _qkv(jax.random.PRNGKey(4), s=60)
    with pytest.raises(ValueError):
        parallel.ring_attention(q, k, v, mesh)
