"""conv2d_resample + fma: semantics and torch parity vs the reference op.

Reference: perceptor/models/stylegan_xl/torch_utils/ops/conv2d_resample.py
(generic fallback :138-143 is the functional spec) and ops/fma.py:15-60.
"""

import importlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.ops.conv2d_resample import conv2d_resample
from perceptor_tpu.ops.fma import fma
from perceptor_tpu.ops.upfirdn import setup_filter

REF_ROOT = "/root/reference/perceptor"


def _reference_op():
    pytest.importorskip("torch")
    chain = {
        "perceptor": REF_ROOT,
        "perceptor.models": f"{REF_ROOT}/models",
        "perceptor.models.stylegan_xl": f"{REF_ROOT}/models/stylegan_xl",
    }
    for name, path in chain.items():
        if name not in sys.modules:
            stub = types.ModuleType(name)
            stub.__path__ = [path]
            sys.modules[name] = stub
    return importlib.import_module(
        "perceptor.models.stylegan_xl.torch_utils.ops.conv2d_resample"
    )


def test_identity_filter_is_plain_conv():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 9, 9))
    w = jax.random.normal(jax.random.PRNGKey(1), (6, 4, 3, 3)) * 0.2

    got = conv2d_resample(x, w, padding=1)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_flip_weight_flips_spatially():
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 8, 8))
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 2, 3, 3))
    corr = conv2d_resample(x, w, padding=1, flip_weight=True)
    conv = conv2d_resample(x, w[:, :, ::-1, ::-1], padding=1, flip_weight=False)
    np.testing.assert_allclose(np.asarray(corr), np.asarray(conv), atol=1e-5)


def test_up_down_shapes_and_grads():
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 8, 8))
    w = jax.random.normal(jax.random.PRNGKey(5), (5, 3, 3, 3)) * 0.1
    f = setup_filter([1.0, 3.0, 3.0, 1.0])

    up = conv2d_resample(x, w, f=f, up=2, padding=1)
    assert up.shape == (1, 5, 16, 16)
    down = conv2d_resample(x, w, f=f, down=2, padding=1)
    assert down.shape == (1, 5, 4, 4)

    g = jax.grad(lambda x: jnp.sum(conv2d_resample(x, w, f=f, up=2, padding=1) ** 2))(x)
    assert g.shape == x.shape and bool(jnp.any(g != 0))


@pytest.mark.slow
@pytest.mark.parametrize(
    "up,down,padding,groups,flip_weight,flip_filter,kh",
    [
        (1, 1, 0, 1, True, False, 3),
        (1, 1, (2, 1, 0, 3), 1, True, False, 3),
        (2, 1, 1, 1, True, False, 3),
        (2, 1, 0, 2, False, False, 3),
        (1, 2, 1, 1, True, False, 3),
        (1, 2, (1, 0), 1, True, True, 1),
        (2, 2, 2, 1, True, False, 3),
        (4, 1, 1, 1, True, False, 1),
    ],
)
def test_parity_vs_reference(up, down, padding, groups, flip_weight, flip_filter, kh):
    import torch

    ref = _reference_op()
    from perceptor.models.stylegan_xl.torch_utils.ops import upfirdn2d as ref_upfirdn

    rng = np.random.RandomState(0)
    cin, cout = 4, 6
    x = rng.randn(2, cin, 10, 11).astype(np.float32)
    w = (rng.randn(cout, cin // groups, kh, kh) * 0.2).astype(np.float32)
    taps = [1.0, 2.0, 2.0, 1.0]

    f_t = ref_upfirdn.setup_filter(torch.tensor(taps))
    want = ref.conv2d_resample(
        torch.tensor(x), torch.tensor(w), f=f_t, up=up, down=down,
        padding=padding, groups=groups, flip_weight=flip_weight,
        flip_filter=flip_filter,
    ).numpy()

    got = conv2d_resample(
        jnp.asarray(x), jnp.asarray(w), f=setup_filter(taps), up=up,
        down=down, padding=padding, groups=groups, flip_weight=flip_weight,
        flip_filter=flip_filter,
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_fma_values_and_unbroadcast_grads():
    a = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4))
    b = jax.random.normal(jax.random.PRNGKey(1), (3, 1))  # broadcasts
    c = jax.random.normal(jax.random.PRNGKey(2), (4,))

    out = fma(a, b, c)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(a) * np.asarray(b) + np.asarray(c),
        atol=1e-6,
    )

    # grads un-broadcast to operand shapes (reference fma.py:49-59 does this
    # by hand; JAX AD inserts the reduce-sums automatically)
    da, db, dc = jax.grad(lambda a, b, c: jnp.sum(fma(a, b, c) ** 2), (0, 1, 2))(
        a, b, c
    )
    assert da.shape == a.shape and db.shape == b.shape and dc.shape == c.shape
    dout = 2 * (np.asarray(a) * np.asarray(b) + np.asarray(c))
    np.testing.assert_allclose(
        np.asarray(db), (dout * np.asarray(a)).sum(axis=(0, 2))[:, None], atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(dc), dout.sum(axis=(0, 1)), atol=1e-4)
