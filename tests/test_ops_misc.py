"""ops public surface: lazy exports resolve; group_norm parity with flax."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu import ops


def test_all_lazy_exports_resolve():
    for name in ops.__all__:
        assert callable(getattr(ops, name)), name


@pytest.mark.parametrize("channel_axis", [-1, 1])
def test_group_norm_matches_flax(channel_axis):
    from perceptor_tpu.ops.groupnorm import group_norm

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    scale = jax.random.normal(jax.random.PRNGKey(1), (16,))
    bias = jax.random.normal(jax.random.PRNGKey(2), (16,))

    module = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    expected = module.apply(
        {"params": {"scale": scale, "bias": bias}}, x
    )
    if channel_axis == 1:
        got = group_norm(
            x.transpose(0, 3, 1, 2), 4, scale, bias, channel_axis=1
        ).transpose(0, 2, 3, 1)
    else:
        got = group_norm(x, 4, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_group_norm_silu_and_grads():
    from perceptor_tpu.ops.groupnorm import group_norm_silu

    x = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 4, 8), jnp.bfloat16)
    out = group_norm_silu(x, 2)
    assert out.dtype == jnp.bfloat16
    g = jax.grad(
        lambda x: jnp.sum(group_norm_silu(x, 2).astype(jnp.float32) ** 2)
    )(x)
    assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))

    with pytest.raises(ValueError):
        group_norm_silu(x, 3)


def test_nearest_upsample_2x_matches_jax_image():
    from perceptor_tpu.ops.upsample_conv import nearest_upsample_2x

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 7, 3))
    expected = jax.image.resize(x, (2, 10, 14, 3), method="nearest")
    np.testing.assert_allclose(
        np.asarray(nearest_upsample_2x(x)), np.asarray(expected)
    )
    # VJP: each input pixel receives the sum of its 2x2 output block
    g = jax.grad(lambda x: jnp.sum(nearest_upsample_2x(x) * 2.0))(x)
    np.testing.assert_allclose(np.asarray(g), 8.0 * np.ones_like(g))


@pytest.mark.parametrize("groups,shape", [
    (4, (2, 8, 8, 16)), (1, (1, 5, 7, 3)), (16, (1, 4, 4, 32)),
])
def test_fused_group_norm_silu_matches_composite(groups, shape):
    from perceptor_tpu.ops.groupnorm import (
        fused_group_norm_silu, group_norm,
    )

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape)
    scale = jax.random.normal(jax.random.PRNGKey(1), (shape[-1],)) + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (shape[-1],))

    def composite(x, scale, bias):
        h = group_norm(x, groups, scale, bias, 1e-5)
        return h * jax.nn.sigmoid(h)

    expected = composite(x, scale, bias)
    actual = fused_group_norm_silu(x, scale, bias, groups, 1e-5)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected),
                               atol=1e-5)

    # grads wrt x, scale, bias all match autodiff of the composite
    def loss(f):
        return lambda x, s, b: jnp.sum(jnp.sin(f(x, s, b)))

    eg = jax.grad(loss(composite), argnums=(0, 1, 2))(x, scale, bias)
    ag = jax.grad(
        loss(lambda x, s, b: fused_group_norm_silu(x, s, b, groups, 1e-5)),
        argnums=(0, 1, 2),
    )(x, scale, bias)
    for e, a in zip(eg, ag):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), atol=2e-5, rtol=1e-5
        )


@pytest.mark.parametrize("activation", ["relu", "gelu", "none"])
def test_fused_group_norm_act_variants(activation):
    from perceptor_tpu.ops.groupnorm import fused_group_norm_act, group_norm

    groups, shape = 4, (2, 6, 5, 16)
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    scale = jax.random.normal(jax.random.PRNGKey(1), (16,)) + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (16,))
    acts = {
        "relu": jax.nn.relu,
        "gelu": lambda h: jax.nn.gelu(h, approximate=False),
        "none": lambda h: h,
    }

    def composite(x, s, b):
        return acts[activation](group_norm(x, groups, s, b, 1e-5))

    expected = composite(x, scale, bias)
    actual = fused_group_norm_act(x, scale, bias, groups, 1e-5, None,
                                  activation)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected),
                               atol=1e-5)

    def loss(f):
        return lambda x, s, b: jnp.sum(jnp.sin(f(x, s, b)))

    eg = jax.grad(loss(composite), argnums=(0, 1, 2))(x, scale, bias)
    ag = jax.grad(
        loss(lambda x, s, b: fused_group_norm_act(x, s, b, groups, 1e-5,
                                                  None, activation)),
        argnums=(0, 1, 2),
    )(x, scale, bias)
    for e, a in zip(eg, ag):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), atol=2e-5, rtol=1e-5
        )


def test_fused_group_norm_silu_per_sample_affine():
    """(N, C) scale/bias — the ADM scale-shift conditioning fold."""
    from perceptor_tpu.ops.groupnorm import (
        fused_group_norm_silu, group_norm,
    )

    groups, shape = 4, (3, 6, 5, 16)
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    scale = jax.random.normal(jax.random.PRNGKey(1), (3, 16)) + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (3, 16))

    def composite(x, scale, bias):
        h = group_norm(x, groups, None, None, 1e-5)
        h = h * scale[:, None, None, :] + bias[:, None, None, :]
        return h * jax.nn.sigmoid(h)

    expected = composite(x, scale, bias)
    actual = fused_group_norm_silu(x, scale, bias, groups, 1e-5)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected),
                               atol=1e-5)

    def loss(f):
        return lambda x, s, b: jnp.sum(jnp.sin(f(x, s, b)))

    eg = jax.grad(loss(composite), argnums=(0, 1, 2))(x, scale, bias)
    ag = jax.grad(
        loss(lambda x, s, b: fused_group_norm_silu(x, s, b, groups, 1e-5)),
        argnums=(0, 1, 2),
    )(x, scale, bias)
    for e, a in zip(eg, ag):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), atol=2e-5, rtol=1e-5
        )


def test_fused_group_norm_silu_bf16_out():
    from perceptor_tpu.ops.groupnorm import fused_group_norm_silu

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 16), jnp.bfloat16)
    scale = jnp.ones((16,)); bias = jnp.zeros((16,))
    y = fused_group_norm_silu(x, scale, bias, 4, 1e-6, jnp.bfloat16)
    assert y.dtype == jnp.bfloat16
    g = jax.grad(
        lambda x: jnp.sum(
            fused_group_norm_silu(x, scale, bias, 4, 1e-6).astype(jnp.float32)
        )
    )(x)
    assert g.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))


def test_group_norm_silu_module_param_names():
    from perceptor_tpu.ops.groupnorm import GroupNormSiLU

    module = GroupNormSiLU(num_groups=4, name="norm1")
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 8)))
    assert set(params["params"].keys()) == {"scale", "bias"}
