"""MiDaS DPT tests (hermetic tiny config + op-level torch parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.models.midas_depth import MidasDepth, _block_upsample
from perceptor_tpu.ops.resize import interpolate_bilinear


@pytest.mark.slow
def test_block_upsample_matches_torch_conv_transpose():
    torch = pytest.importorskip("torch")

    torch.manual_seed(0)
    convt = torch.nn.ConvTranspose2d(8, 8, kernel_size=4, stride=4, padding=0)
    x = torch.randn(1, 8, 6, 6)
    with torch.no_grad():
        expected = convt(x).numpy()
    actual = _block_upsample(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(convt.weight.detach().numpy()),
        jnp.asarray(convt.bias.detach().numpy()),
        4,
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(np.asarray(actual), expected, atol=1e-5)


@pytest.mark.slow
def test_align_corners_bilinear_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    torch.manual_seed(0)
    x = torch.randn(1, 4, 7, 9)
    with torch.no_grad():
        expected = F.interpolate(
            x, scale_factor=2, mode="bilinear", align_corners=True
        ).numpy()
    actual = interpolate_bilinear(jnp.asarray(x.numpy()), (14, 18))
    np.testing.assert_allclose(np.asarray(actual), expected, atol=1e-5)


def test_midas_tiny_forward_and_grad():
    model = MidasDepth("tiny", optimize=False)
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 48, 48))
    depth = model(images)
    assert depth.shape == (1, 1, 64, 64)
    # negated non-negative depth -> everything <= 0 (reference :121-128)
    assert float(depth.max()) <= 0.0

    grads = jax.grad(lambda im: model.forward_fn(model.params, im).mean())(images)
    assert bool(jnp.any(grads != 0))


def test_midas_rejects_unknown_and_unimplemented():
    with pytest.raises(ValueError):
        MidasDepth("nope")
