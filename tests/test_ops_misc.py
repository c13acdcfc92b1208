"""ops public surface: lazy exports resolve; group_norm parity with flax."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu import ops


def test_all_lazy_exports_resolve():
    for name in ops.__all__:
        assert callable(getattr(ops, name)), name


@pytest.mark.parametrize("channel_axis", [-1, 1])
def test_group_norm_matches_flax(channel_axis):
    from perceptor_tpu.ops.groupnorm import group_norm

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    scale = jax.random.normal(jax.random.PRNGKey(1), (16,))
    bias = jax.random.normal(jax.random.PRNGKey(2), (16,))

    module = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    expected = module.apply(
        {"params": {"scale": scale, "bias": bias}}, x
    )
    if channel_axis == 1:
        got = group_norm(
            x.transpose(0, 3, 1, 2), 4, scale, bias, channel_axis=1
        ).transpose(0, 2, 3, 1)
    else:
        got = group_norm(x, 4, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_group_norm_silu_and_grads():
    from perceptor_tpu.ops.groupnorm import group_norm_silu

    x = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 4, 8), jnp.bfloat16)
    out = group_norm_silu(x, 2)
    assert out.dtype == jnp.bfloat16
    g = jax.grad(
        lambda x: jnp.sum(group_norm_silu(x, 2).astype(jnp.float32) ** 2)
    )(x)
    assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))

    with pytest.raises(ValueError):
        group_norm_silu(x, 3)
