"""conv3x3_as_matmul / Conv3x3 parity vs nn.Conv (values and grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from perceptor_tpu.ops.conv_matmul import Conv3x3, conv3x3_as_matmul


@pytest.mark.parametrize("shape,cout", [((2, 8, 8, 16), 24), ((1, 5, 7, 4), 4)])
def test_matches_lax_conv(shape, cout):
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, shape[-1], cout)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (cout,))

    expected = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    actual = conv3x3_as_matmul(x, k, b)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected),
                               atol=1e-5)

    def loss(f):
        return lambda x, k, b: jnp.sum(jnp.sin(f(x, k, b)))

    ref = lambda x, k, b: jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    eg = jax.grad(loss(ref), argnums=(0, 1, 2))(x, k, b)
    ag = jax.grad(loss(conv3x3_as_matmul), argnums=(0, 1, 2))(x, k, b)
    for e, a in zip(eg, ag):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=2e-5, rtol=2e-5)


def test_module_param_compat_and_paths_agree():
    """Conv3x3 params interchange with nn.Conv's; both paths same output."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 6, 8))
    ref = nn.Conv(12, (3, 3), padding=1)
    params = ref.init(jax.random.PRNGKey(1), x)
    expected = ref.apply(params, x)
    for force in (True, False):
        got = Conv3x3(12, as_matmul=force).apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   atol=1e-5)
