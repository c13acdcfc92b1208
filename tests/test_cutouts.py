"""transforms.cutouts: differentiable MXU crop-resize + MakeCutouts draws."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.transforms import (
    crop_and_resize,
    random_cutout_boxes,
    random_cutouts,
)


def _numpy_crop_resize(image, box, out_size):
    """Scalar reference of the separable triangle-kernel crop-resize."""
    c, h, w = image.shape
    y0, x0, y1, x1 = box

    def axis_weights(start, size, in_size):
        scale = size / out_size
        out = np.zeros((out_size, in_size))
        support = max(scale, 1.0)
        for i in range(out_size):
            center = start + (i + 0.5) * scale - 0.5
            for j in range(in_size):
                d = abs(j - center) / support
                out[i, j] = max(0.0, 1.0 - d)
            out[i] /= max(out[i].sum(), 1e-12)
        return out

    wy = axis_weights(y0 * h, (y1 - y0) * h, h)
    wx = axis_weights(x0 * w, (x1 - x0) * w, w)
    return np.einsum("ih,chw,jw->cij", wy, image, wx)


def test_crop_and_resize_matches_numpy_reference():
    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(key, (2, 3, 21, 17))
    boxes = jnp.array([[0.1, 0.2, 0.9, 0.8], [0.0, 0.0, 1.0, 1.0]])
    out = crop_and_resize(images, boxes, 8)
    assert out.shape == (4, 3, 8, 8)
    for n in range(2):
        for b in range(2):
            want = _numpy_crop_resize(
                np.asarray(images[b]), np.asarray(boxes[n]), 8
            )
            got = np.asarray(out[n * 2 + b])
            np.testing.assert_allclose(got, want, atol=1e-5)


def test_identity_crop_is_exact():
    # cut_size == crop extent at an integer offset -> delta weights
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 16, 16))
    boxes = jnp.array([[4 / 16, 2 / 16, 12 / 16, 10 / 16]])
    out = crop_and_resize(images, boxes, 8)
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(images[0, :, 4:12, 2:10]), atol=1e-6
    )


def test_constant_image_invariance():
    # row-stochastic weights: cutouts of a constant image stay constant
    images = jnp.full((1, 3, 33, 47), 0.37)
    out = random_cutouts(images, jax.random.PRNGKey(2), 6, cut_size=12)
    np.testing.assert_allclose(np.asarray(out), 0.37, atol=1e-6)


def test_random_cutouts_shapes_and_determinism():
    images = jax.random.uniform(jax.random.PRNGKey(3), (2, 3, 64, 48))
    a = random_cutouts(images, jax.random.PRNGKey(7), 5, cut_size=16)
    b = random_cutouts(images, jax.random.PRNGKey(7), 5, cut_size=16)
    c = random_cutouts(images, jax.random.PRNGKey(8), 5, cut_size=16)
    assert a.shape == (10, 3, 16, 16)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-3


def test_boxes_within_image_and_size_distribution():
    boxes = random_cutout_boxes(
        jax.random.PRNGKey(4), (128, 96), 256, cut_size=32, cut_pow=1.0
    )
    boxes = np.asarray(boxes)
    assert (boxes[:, :2] >= -1e-6).all() and (boxes[:, 2:] <= 1 + 1e-6).all()
    sides_y = (boxes[:, 2] - boxes[:, 0]) * 128
    sides_x = (boxes[:, 3] - boxes[:, 1]) * 96
    np.testing.assert_allclose(sides_y, sides_x, atol=1e-3)  # square crops
    assert sides_y.min() >= 32 - 1e-3 and sides_y.max() <= 96 + 1e-3


def test_gradients_flow_to_images():
    images = jax.random.uniform(jax.random.PRNGKey(5), (1, 3, 32, 32))

    def f(images):
        cuts = random_cutouts(images, jax.random.PRNGKey(0), 4, cut_size=8)
        return jnp.sum(cuts**2)

    grads = jax.grad(f)(images)
    assert grads.shape == images.shape
    assert float(jnp.abs(grads).max()) > 0.0
    # adjoint check: <A x, y> == <x, A^T y> through the crop map
    boxes = jnp.array([[0.1, 0.1, 0.7, 0.7]])
    y = jax.random.normal(jax.random.PRNGKey(6), (1, 3, 8, 8))
    fwd = lambda x: crop_and_resize(x, boxes, 8)
    out, vjp = jax.vjp(fwd, images)
    (xbar,) = vjp(y)
    lhs = float(jnp.sum(out * y))
    rhs = float(jnp.sum(images * xbar))
    assert abs(lhs - rhs) < 1e-4


def test_one_compiled_program_serves_every_draw():
    # boxes are traced: repeated draws must not retrace/recompile
    images = jax.random.uniform(jax.random.PRNGKey(9), (1, 3, 40, 40))
    with jax.log_compiles(False):
        pass
    n_before = crop_and_resize._cache_size()
    for seed in range(3):
        random_cutouts(images, jax.random.PRNGKey(seed), 4, cut_size=16)
    assert crop_and_resize._cache_size() == n_before + 1


def test_cut_pow_biases_sizes():
    small = random_cutout_boxes(
        jax.random.PRNGKey(10), (256, 256), 512, cut_size=64, cut_pow=4.0
    )
    large = random_cutout_boxes(
        jax.random.PRNGKey(10), (256, 256), 512, cut_size=64, cut_pow=0.25
    )
    side = lambda b: float(jnp.mean(b[:, 2] - b[:, 0]))
    assert side(small) < side(large)


def test_bad_boxes_shape_raises():
    images = jnp.zeros((1, 3, 8, 8))
    with pytest.raises(ValueError):
        crop_and_resize(images, jnp.zeros((4, 3)), 4)
