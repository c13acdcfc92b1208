"""Deformable conv v1: parity with a naive NumPy reference + invariants.

torchvision is not in this environment, so the oracle is a direct loop
implementation of the published deform_conv2d definition (the functional
spec of the reference's torchvision.ops.DeformConv2d usage in
deep_image_prior/common.py:92-219).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.ops.deform_conv import deform_conv2d


def _naive_deform_conv(x, offsets, weight, bias, stride, padding, dilation):
    b, c, h, w = x.shape
    oc, _, kh, kw = weight.shape
    groups = offsets.shape[1] // (2 * kh * kw)
    ho = (h + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    wo = (w + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1
    off = offsets.reshape(b, groups, kh, kw, 2, ho, wo)
    cg = c // groups
    out = np.zeros((b, oc, ho, wo))

    def sample(img, y, x_):
        y0, x0 = int(np.floor(y)), int(np.floor(x_))
        val = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                yi, xi = y0 + dy, x0 + dx
                wgt = (1 - abs(y - yi)) * (1 - abs(x_ - xi))
                if 0 <= yi < h and 0 <= xi < w:
                    val += wgt * img[yi, xi]
        return val

    for bi in range(b):
        for o in range(oc):
            for yo in range(ho):
                for xo in range(wo):
                    acc = 0.0
                    for ci in range(c):
                        g = ci // cg
                        for i in range(kh):
                            for j in range(kw):
                                y = (
                                    yo * stride
                                    - padding
                                    + i * dilation
                                    + off[bi, g, i, j, 0, yo, xo]
                                )
                                x_ = (
                                    xo * stride
                                    - padding
                                    + j * dilation
                                    + off[bi, g, i, j, 1, yo, xo]
                                )
                                acc += weight[o, ci, i, j] * sample(
                                    x[bi, ci], y, x_
                                )
                    out[bi, o, yo, xo] = acc + (bias[o] if bias is not None else 0.0)
    return out


@pytest.mark.parametrize(
    "stride,padding,dilation,groups",
    [(1, 1, 1, 1), (2, 1, 1, 2), (1, 0, 2, 1)],
)
def test_matches_naive_reference(stride, padding, dilation, groups):
    rng = np.random.RandomState(0)
    b, c, h, w, oc, k = 2, 4, 9, 8, 3, 3
    ho = (h + 2 * padding - (dilation * (k - 1) + 1)) // stride + 1
    wo = (w + 2 * padding - (dilation * (k - 1) + 1)) // stride + 1
    x = rng.randn(b, c, h, w).astype(np.float32)
    offsets = (rng.randn(b, 2 * groups * k * k, ho, wo) * 1.5).astype(np.float32)
    weight = rng.randn(oc, c, k, k).astype(np.float32)
    bias = rng.randn(oc).astype(np.float32)

    expected = _naive_deform_conv(x, offsets, weight, bias, stride, padding, dilation)
    out = deform_conv2d(
        jnp.asarray(x),
        jnp.asarray(offsets),
        jnp.asarray(weight),
        jnp.asarray(bias),
        stride=stride,
        padding=padding,
        dilation=dilation,
    )
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


def test_zero_offsets_equal_standard_conv():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 6, 12, 12).astype(np.float32)
    weight = rng.randn(5, 6, 3, 3).astype(np.float32)
    offsets = np.zeros((2, 2 * 3 * 3 * 3, 12, 12), np.float32)  # 3 offset groups

    out = deform_conv2d(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight), padding=1
    )
    expected = jax.lax.conv_general_dilated(
        jnp.asarray(x),
        jnp.asarray(weight),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-4)


def test_gradients_flow_to_all_inputs():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 2, 8, 8))
    offsets = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (1, 2 * 9, 8, 8))
    weight = jax.random.normal(jax.random.PRNGKey(2), (3, 2, 3, 3))
    bias = jnp.zeros((3,))

    grads = jax.grad(
        lambda x, o, w, b: jnp.sum(
            jnp.square(deform_conv2d(x, o, w, b, padding=1))
        ),
        argnums=(0, 1, 2, 3),
    )(x, offsets, weight, bias)
    for g in grads:
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.abs(g).max()) > 0.0


def test_jit_and_shape_validation():
    x = jnp.zeros((1, 4, 8, 8))
    offsets = jnp.zeros((1, 2 * 2 * 9, 8, 8))
    weight = jnp.zeros((3, 4, 3, 3))
    out = jax.jit(lambda *a: deform_conv2d(*a, padding=1))(x, offsets, weight)
    assert out.shape == (1, 3, 8, 8)

    with pytest.raises(ValueError):
        deform_conv2d(x, jnp.zeros((1, 2 * 2 * 9, 4, 4)), weight, padding=1)
    with pytest.raises(ValueError):
        deform_conv2d(x, offsets, jnp.zeros((3, 5, 3, 3)), padding=1)
