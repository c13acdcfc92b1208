import jax
import jax.numpy as jnp
import numpy as np

from perceptor_tpu import transforms


def test_dynamic_threshold_identity_inside_range():
    x = jnp.full((1, 3, 8, 8), 0.6)  # in [-1,1] after mapping: 0.2 < 1
    out = transforms.dynamic_threshold(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_dynamic_threshold_squashes_outliers():
    rng = np.random.default_rng(0)
    x = rng.normal(0.5, 2.0, size=(2, 3, 16, 16)).astype(np.float32)
    out = transforms.dynamic_threshold(jnp.asarray(x), quantile=0.9)
    out = np.asarray(out)
    assert out.min() >= 0.0 - 1e-6 and out.max() <= 1.0 + 1e-6


def test_dynamic_threshold_differentiable():
    x = jnp.ones((1, 3, 8, 8)) * 0.5

    def loss(x):
        return jnp.sum(transforms.dynamic_threshold(x))

    grad = jax.grad(loss)(x)
    assert bool(jnp.any(grad != 0))


def test_clamp_transform_roundtrip():
    t = transforms.ClampWithGrad()
    x = jnp.array([[-0.5, 0.5, 1.5]])
    np.testing.assert_allclose(t.encode(x), [[0.0, 0.5, 1.0]])
    np.testing.assert_allclose(t.decode(t.encode(x)), [[0.0, 0.5, 1.0]])


def test_resize_transform():
    t = transforms.Resize(out_shape=(32, 32))
    x = jnp.ones((1, 3, 16, 16))
    y = t.encode(x)
    assert y.shape == (1, 3, 32, 32)
    z = t.decode(y, out_shape=(16, 16))
    assert z.shape == (1, 3, 16, 16)


def test_utils_pil_image():
    from perceptor_tpu.utils import pil_image

    image = pil_image(np.zeros((2, 3, 8, 8), dtype=np.float32))
    assert image.size == (8, 16)  # batch stacked vertically


def test_utils_gradients():
    from perceptor_tpu.utils import combine_gradients, nonzero_mean

    g1 = jnp.array([1.0, 0.0, 2.0])
    g2 = jnp.array([3.0, 0.0, 0.0])
    np.testing.assert_allclose(
        nonzero_mean([g1, g2]), [2.0, 0.0, 2.0], atol=1e-4
    )
    np.testing.assert_allclose(combine_gradients([g1, g2]), [4.0, 0.0, 2.0])


def test_core_functional_pytree():
    from perceptor_tpu.core import Functional, static_field

    class Point(Functional):
        x: jax.Array
        y: jax.Array
        name: str = static_field(default="p")

    p = Point(x=jnp.ones(3), y=jnp.zeros(3))
    doubled = jax.tree.map(lambda a: a * 2, p)
    np.testing.assert_allclose(doubled.x, 2.0)
    assert doubled.name == "p"
    p2 = p.replace(y=jnp.ones(3))
    np.testing.assert_allclose(p2.y, 1.0)

    # jit through it
    @jax.jit
    def f(point):
        return point.replace(x=point.x + point.y)

    np.testing.assert_allclose(f(p2).x, 2.0)
