import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.ops import resize


def _reference_resize(x_np, out_shape=None, scale_factors=None, resample=None):
    """Run the original ResizeRight on numpy for parity (vendored in the
    reference at perceptor/transforms/resize/resize_right.py; reimplemented
    here in its numpy branch semantics via torch)."""
    import math

    EPS = np.finfo(np.float32).eps

    def cubic(x):
        absx = np.abs(x)
        absx2 = absx**2
        absx3 = absx**3
        return (1.5 * absx3 - 2.5 * absx2 + 1.0) * (absx <= 1.0) + (
            -0.5 * absx3 + 2.5 * absx2 - 4.0 * absx + 2.0
        ) * ((1.0 < absx) & (absx <= 2.0))

    def lanczos3(x):
        return (
            (np.sin(np.pi * x) * np.sin(np.pi * x / 3) + EPS)
            / ((np.pi**2 * x**2 / 3) + EPS)
        ) * (np.abs(x) < 3)

    methods = {"bicubic": (cubic, 4.0), "lanczos3": (lanczos3, 6.0)}

    in_shape = x_np.shape
    n_dims = x_np.ndim
    if out_shape is not None:
        out_shape = list(in_shape[: n_dims - len(out_shape)]) + list(out_shape)
        if scale_factors is None:
            scale_factors = [o / i for o, i in zip(out_shape, in_shape)]
    if scale_factors is not None:
        if not isinstance(scale_factors, (list, tuple)):
            scale_factors = [scale_factors, scale_factors]
        scale_factors = [1] * (n_dims - len(scale_factors)) + list(scale_factors)
        if out_shape is None:
            out_shape = [
                math.ceil(s * i) for s, i in zip(scale_factors, in_shape)
            ]

    if resample is None:
        oh, ow = in_shape[-2:]
        nh, nw = out_shape[-2:]
        resample = "lanczos3" if (oh >= nh and ow >= nw) else "bicubic"
    interp, support = methods[resample]

    output = x_np.astype(np.float64)
    dims = [
        (d, scale_factors[d], in_shape[d], out_shape[d])
        for d in sorted(range(n_dims), key=lambda i: scale_factors[i])
        if scale_factors[d] != 1.0
    ]
    for dim, scale, in_sz, out_sz in dims:
        if scale < 1.0:
            cur_interp = lambda a: scale * interp(scale * a)
            cur_support = support / scale
        else:
            cur_interp, cur_support = interp, support
        projected = (
            np.arange(out_sz) / scale + (in_sz - 1) / 2 - (out_sz - 1) / (2 * scale)
        )
        left = np.ceil(projected - cur_support / 2 - EPS).astype(int)
        taps = math.ceil(cur_support - EPS)
        fov = left[:, None] + np.arange(taps)[None]
        pad = [-fov[0, 0], fov[-1, -1] - in_sz + 1]
        fov = fov + pad[0]
        projected = projected + pad[0]
        weights = cur_interp(projected[:, None] - fov)
        wsum = weights.sum(1, keepdims=True)
        wsum[wsum == 0] = 1
        weights = weights / wsum

        tmp = np.swapaxes(output, dim, 0)
        pad_width = [(max(pad[0], 0), max(pad[1], 0))] + [(0, 0)] * (n_dims - 1)
        tmp = np.pad(tmp, pad_width, mode="constant")
        if pad[0] < 0:
            tmp = tmp[-pad[0]:]
        neighbors = tmp[fov]
        w = weights.reshape(*weights.shape, *([1] * (n_dims - 1)))
        tmp_out = (neighbors * w).sum(1)
        output = np.swapaxes(tmp_out, 0, dim)
    return output


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((32, 32), (224, 224)), ((64, 48), (17, 23)), ((224, 224), (64, 64))],
)
def test_parity_with_resize_right(in_hw, out_hw):
    rng = np.random.default_rng(42)
    x = rng.normal(size=(2, 3, *in_hw)).astype(np.float32)
    expected = _reference_resize(x, out_shape=list(out_hw))
    got = resize(jnp.asarray(x), out_shape=out_hw)
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-5, rtol=1e-4)


def test_parity_scale_factor():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 40, 40)).astype(np.float32)
    expected = _reference_resize(x, scale_factors=0.37)
    got = resize(jnp.asarray(x), scale_factors=0.37)
    assert got.shape == expected.shape
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-5, rtol=1e-4)


def test_identity_shortcircuit():
    x = jnp.ones((1, 3, 16, 16))
    assert resize(x, out_shape=(16, 16)) is x


def test_upscale_preserves_constant_interior():
    # With the reference's default constant(zero) padding, border output
    # pixels see padded zeros (resize_right.py:288-318); the interior must
    # be exact. With replicate padding, everything is exact.
    x = jnp.full((1, 3, 8, 8), 0.5)
    y = resize(x, out_shape=(32, 32))
    np.testing.assert_allclose(np.asarray(y)[..., 8:-8, 8:-8], 0.5, atol=1e-5)
    y_rep = resize(x, out_shape=(32, 32), pad_mode="replicate")
    np.testing.assert_allclose(np.asarray(y_rep), 0.5, atol=1e-5)


def test_gradients_flow_and_match_adjoint():
    # The VJP of a linear op y = W x is W^T g: check grad matches explicit
    # transpose-matrix application (the exact-adjoint property the reference
    # gets from autograd through gathers).
    from perceptor_tpu.ops import resize_matrices

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 1, 16, 16)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(1, 1, 7, 9)).astype(np.float32))

    def f(x):
        return jnp.sum(resize(x, out_shape=(7, 9)) * g)

    grad = jax.grad(f)(x)
    wh, ww = resize_matrices((16, 16), (7, 9), (7 / 16, 9 / 16))
    expected = np.einsum("oh,ncop,pw->nchw", wh, np.asarray(g), ww)
    np.testing.assert_allclose(np.asarray(grad), expected, atol=1e-5)


def test_jit_compiles_once_per_shape():
    x = jnp.ones((1, 3, 33, 33))
    f = jax.jit(lambda im: resize(im, out_shape=(224, 224)))
    out = f(x)
    assert out.shape == (1, 3, 224, 224)
