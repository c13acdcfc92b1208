"""losses.MidasDepth: depth-consistency guidance loss.

A TPU-only extra: the reference README lists `losses.MidasDepth`
(README.md:64) but the package never shipped it. Semantics here:
median/MAD-aligned (scale/shift-invariant) MSE between predicted and
target depth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.losses.midas_depth import MidasDepth, align_depths


@pytest.fixture(scope="module")
def loss():
    return MidasDepth("tiny_v21")


def test_align_depths_affine_invariance():
    d = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 16, 16))
    a = align_depths(d)
    b = align_depths(3.7 * d - 1.2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    flat = np.asarray(a).reshape(2, -1)
    np.testing.assert_allclose(np.median(flat, axis=1), 0.0, atol=1e-5)
    np.testing.assert_allclose(
        np.mean(np.abs(flat), axis=1), 1.0, atol=1e-4
    )


def test_zero_on_matching_images_and_affine_targets(loss):
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 64, 64))
    loss.add_images_(images)
    assert float(loss.forward(images)) < 1e-6

    # affine-transformed target depths give the same loss (SSI alignment)
    other = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 64, 64))
    base = float(loss.forward(other))
    depths = loss.model(images)
    loss.add_depths_(5.0 * depths + 2.0)
    assert np.isclose(float(loss.forward(other)), base, atol=1e-4)


def test_gradient_flows_and_errors(loss):
    images = jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 64, 64))
    loss.add_images_(images)
    other = jax.random.uniform(jax.random.PRNGKey(4), (1, 3, 64, 64))
    grads = jax.grad(lambda im: loss.forward(im))(other)
    assert bool(jnp.any(grads != 0))

    fresh = MidasDepth("tiny_v21")
    with pytest.raises(ValueError):
        fresh.forward(other)
