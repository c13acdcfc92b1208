"""grid_sample parity vs torch.nn.functional.grid_sample."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.ops.grid_sample import flow_warp, grid_sample


def _case(seed=0, n=2, c=3, h=5, w=7, hg=4, wg=6):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, c, h, w)).astype(np.float32)
    # grid spanning beyond [-1,1] to exercise padding
    grid = rng.uniform(-1.3, 1.3, size=(n, hg, wg, 2)).astype(np.float32)
    return x, grid


@pytest.mark.parametrize(
    "mode,padding,align",
    list(itertools.product(["bilinear", "nearest"], ["zeros", "border"],
                           [False, True])),
)
def test_grid_sample_matches_torch(mode, padding, align):
    torch = pytest.importorskip("torch")
    x, grid = _case()
    with torch.no_grad():
        expected = torch.nn.functional.grid_sample(
            torch.tensor(x), torch.tensor(grid), mode=mode,
            padding_mode=padding, align_corners=align,
        ).numpy()
    actual = grid_sample(
        jnp.asarray(x), jnp.asarray(grid), mode=mode, padding_mode=padding,
        align_corners=align,
    )
    np.testing.assert_allclose(np.asarray(actual), expected, atol=1e-5)


def test_grid_sample_grads_match_torch():
    torch = pytest.importorskip("torch")
    x, grid = _case(seed=1)
    tx = torch.tensor(x, requires_grad=True)
    tg = torch.tensor(grid, requires_grad=True)
    out = torch.nn.functional.grid_sample(
        tx, tg, mode="bilinear", padding_mode="zeros", align_corners=False
    )
    (out * torch.sin(out.detach())).sum().backward()

    def loss(x, grid):
        out = grid_sample(x, grid)
        return jnp.sum(out * jnp.sin(jax.lax.stop_gradient(out)))

    gx, gg = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(gx), tx.grad.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gg), tg.grad.numpy(), atol=1e-4)


def test_flow_warp_zero_flow_identity():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 2, 6, 8)),
                    dtype=jnp.float32)
    flow = jnp.zeros((1, 6, 8, 2))
    np.testing.assert_allclose(
        np.asarray(flow_warp(x, flow)), np.asarray(x), atol=1e-5
    )


def test_flow_warp_matches_reference_semantics():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 3, 6, 8)).astype(np.float32)
    flow = rng.normal(scale=1.5, size=(1, 6, 8, 2)).astype(np.float32)

    # the reference flow_warp (arch_util.py:106-136) builds the same grid
    tx = torch.tensor(x)
    gy, gx = torch.meshgrid(torch.arange(6.0), torch.arange(8.0), indexing="ij")
    grid = torch.stack((gx, gy), 2)[None]
    vgrid = grid + torch.tensor(flow)
    vx = 2.0 * vgrid[..., 0] / max(8 - 1, 1) - 1.0
    vy = 2.0 * vgrid[..., 1] / max(6 - 1, 1) - 1.0
    with torch.no_grad():
        expected = torch.nn.functional.grid_sample(
            tx, torch.stack((vx, vy), dim=3), mode="bilinear",
            padding_mode="zeros", align_corners=True,
        ).numpy()
    actual = flow_warp(jnp.asarray(x), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(actual), expected, atol=1e-5)
