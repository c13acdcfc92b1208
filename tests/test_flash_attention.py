"""Flash attention kernel vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu.ops.attention import dot_product_attention
from perceptor_tpu.ops.flash_attention_kernel import flash_attention


def _qkv(key=0, b=2, h=2, s=256, d=64):
    keys = jax.random.split(jax.random.PRNGKey(key), 3)
    q = jax.random.normal(keys[0], (b, h, s, d))
    k = jax.random.normal(keys[1], (b, h, s, d))
    v = jax.random.normal(keys[2], (b, h, s, d))
    return q, k, v


def test_forward_matches_xla():
    q, k, v = _qkv()
    expected = dot_product_attention(q, k, v)
    actual = flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), atol=2e-5)


def test_forward_unpadded_head_dim():
    q, k, v = _qkv(d=40)  # SD level-0 head dim: needs lane padding
    expected = dot_product_attention(q, k, v)
    actual = flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), atol=2e-5)


def test_forward_rect_seq():
    q, _, _ = _qkv(s=256)
    _, k, v = _qkv(key=1, s=128)
    expected = dot_product_attention(q, k, v)
    actual = flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), atol=2e-5)


def test_gradients_match_xla():
    q, k, v = _qkv(s=128, d=64)

    def flash_loss(q, k, v):
        return jnp.square(flash_attention(q, k, v, block_q=128, block_k=128)).mean()

    def xla_loss(q, k, v):
        return jnp.square(dot_product_attention(q, k, v)).mean()

    flash_grads = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
    xla_grads = jax.grad(xla_loss, argnums=(0, 1, 2))(q, k, v)
    for fg, xg, name in zip(flash_grads, xla_grads, "qkv"):
        np.testing.assert_allclose(
            np.asarray(fg), np.asarray(xg), atol=3e-5, err_msg=f"d{name}"
        )


def test_bad_block_divisibility_raises():
    q, k, v = _qkv(s=100)
    with pytest.raises(ValueError):
        flash_attention(q, k, v, block_q=128, block_k=128)


def test_multiblock_accumulation():
    """More than one KV tile exercises the online-softmax correction."""
    q, k, v = _qkv(s=512, d=32)
    expected = dot_product_attention(q, k, v)
    actual = flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), atol=2e-5)


def test_snap_block_divisor_policy():
    from perceptor_tpu.ops.flash_attention_kernel import snap_block

    # power-of-two sequences keep the measured defaults
    assert snap_block(4096, 1024) == 1024
    assert snap_block(9216, 1024) == 1024  # 768px level 0 (96*96)
    # non-power-of-two lane-aligned lengths snap to the largest divisor
    assert snap_block(2304, 512) == 384  # 768px level 1 (48*48)
    assert snap_block(2304, 1024) == 768
    assert snap_block(1152, 512) == 384
    # not a multiple of the 128-lane width: kernel can't tile it
    # (incl. 576 = 24*24, 768px level 2 — dispatcher takes the XLA path)
    assert snap_block(576, 512) is None
    assert snap_block(1234, 512) is None
    assert snap_block(77, 512) is None


def test_default_blocks_snap_to_non_power_of_two_seq():
    """768px-latent token counts (2304 = 48*48) crashed the kernel before
    the divisor snap: the 512-row default did not divide the sequence."""
    q, k, v = _qkv(s=1152, d=32)  # 128*9 tokens: defaults snap 512 -> 384
    expected = dot_product_attention(q, k, v)
    actual = flash_attention(q, k, v)  # no explicit blocks: defaults snap
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), atol=2e-5)


def test_flash_route_rejects_unaligned_seq():
    from perceptor_tpu.ops.attention import flash_route

    # routing must only say yes when the kernel can actually tile the seq
    assert not flash_route(1234, 1234)
    assert not flash_route(77, 77)
