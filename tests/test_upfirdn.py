"""upfirdn2d: separable 1D path == outer-product 2D path, all knobs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.ops.upfirdn import upfirdn2d


@pytest.mark.parametrize(
    "up,down,padding,flip",
    [
        (1, 1, 0, False),
        (2, 1, (2, 1, 2, 1), False),
        (1, 2, (1, 2, 3, 0), False),
        (2, 2, 3, True),
        ((2, 1), (1, 2), (0, 1, 2, 3), False),
    ],
)
def test_separable_matches_outer_product(up, down, padding, flip):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 12, 10))
    k1 = jax.random.normal(jax.random.PRNGKey(1), (6,))

    got = upfirdn2d(x, k1, up=up, down=down, padding=padding, gain=1.7,
                    flip_filter=flip)
    want = upfirdn2d(x, jnp.outer(k1, k1), up=up, down=down, padding=padding,
                     gain=1.7, flip_filter=flip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_separable_grad_matches():
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 8, 8))
    k1 = jax.random.normal(jax.random.PRNGKey(3), (4,))

    g1 = jax.grad(
        lambda x: jnp.sum(upfirdn2d(x, k1, up=2, down=2, padding=2) ** 2)
    )(x)
    g2 = jax.grad(
        lambda x: jnp.sum(
            upfirdn2d(x, jnp.outer(k1, k1), up=2, down=2, padding=2) ** 2
        )
    )(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)
