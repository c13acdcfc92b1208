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


def _sfb1d_db1(lo, hi, axis):
    """numpy reference of pytorch_wavelets sfb1d for db1/zero mode: stride-2
    conv_transpose with rec_lo=[1,1]/sqrt2, rec_hi=[1,-1]/sqrt2 — so
    out[2i] = (lo[i]+hi[i])/sqrt2, out[2i+1] = (lo[i]-hi[i])/sqrt2."""
    lo = np.moveaxis(lo, axis, -1)
    hi = np.moveaxis(hi, axis, -1)
    out = np.empty(lo.shape[:-1] + (2 * lo.shape[-1],), lo.dtype)
    s = np.float32(1.0 / np.sqrt(2.0))
    out[..., 0::2] = (lo + hi) * s
    out[..., 1::2] = (lo - hi) * s
    return np.moveaxis(out, -1, axis)


def test_haar_idwt_matches_reference_sfb2d():
    """Parity vs pytorch_wavelets SFB2D semantics (the reference's ruDALL-E
    DWT decoder backend, pytorch_wavelets_utils.py), expressed as a
    hand-rolled numpy synthesis filter bank — no pywt dependency."""
    rng = np.random.default_rng(0)
    ll = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    highs = rng.normal(size=(2, 3, 3, 8, 8)).astype(np.float32)

    # SFB2D: columns first (ll+lh, hl+hh), then rows (lo+hi)
    lh, hl, hh = highs[:, :, 0], highs[:, :, 1], highs[:, :, 2]
    lo = _sfb1d_db1(ll, lh, axis=2)
    hi = _sfb1d_db1(hl, hh, axis=2)
    expected = _sfb1d_db1(lo, hi, axis=3)

    actual = haar_idwt(jnp.asarray(ll), jnp.asarray(highs))
    np.testing.assert_allclose(np.asarray(actual), expected, atol=1e-5)


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
