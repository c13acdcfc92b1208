import jax
import jax.numpy as jnp
import numpy as np

from perceptor_tpu.ops import clamp_with_grad


def test_forward_is_clamp():
    x = jnp.array([-1.0, -0.5, 0.0, 0.5, 1.0, 2.0])
    np.testing.assert_allclose(clamp_with_grad(x, 0.0, 1.0), np.clip(x, 0, 1))


def test_gradient_passes_toward_feasible_region():
    # Semantics from reference perceptor/transforms/clamp_with_grad.py:17-23:
    # grad flows iff grad_in * (x - clamp(x)) >= 0.
    x = jnp.array([-1.0, 0.5, 2.0])

    # loss = sum(clamp(x) * g) with chosen per-element g
    def loss(x, g):
        return jnp.sum(clamp_with_grad(x, 0.0, 1.0) * g)

    # For x=-1 (below min, x - clamp = -2):
    #   g=+1 -> grad_in=+1, grad_in*(x-clamp) = -2 < 0 -> blocked (0)
    #   g=-1 -> grad_in=-1, product=+2 >= 0 -> passes (-1)
    g_pos = jnp.array([1.0, 1.0, 1.0])
    g_neg = jnp.array([-1.0, -1.0, -1.0])
    grad_pos = jax.grad(loss)(x, g_pos)
    grad_neg = jax.grad(loss)(x, g_neg)

    np.testing.assert_allclose(grad_pos, [0.0, 1.0, 1.0])
    np.testing.assert_allclose(grad_neg, [-1.0, -1.0, 0.0])


def test_matches_torch_reference_autograd():
    torch = __import__("torch")

    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(2, 3, 8, 8)).astype(np.float32) * 2
    g_np = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)

    # Reference semantics implemented directly in torch.
    xt = torch.tensor(x_np, requires_grad=True)
    clamped = xt.clamp(0, 1)
    clamped.backward(torch.tensor(g_np))
    keep = (torch.tensor(g_np) * (xt.detach() - xt.detach().clamp(0, 1)) >= 0).float()
    expected_grad = g_np * keep.numpy()

    def loss(x):
        return jnp.sum(clamp_with_grad(x, 0.0, 1.0) * g_np)

    grad = jax.grad(loss)(jnp.asarray(x_np))
    np.testing.assert_allclose(grad, expected_grad, atol=1e-6)


def test_jittable():
    f = jax.jit(lambda x: clamp_with_grad(x, 0.0, 1.0))
    np.testing.assert_allclose(f(jnp.array([2.0])), [1.0])
