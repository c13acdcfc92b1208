"""The shared head-folded projections (models/attention_proj.py) must be
param-compatible with the plain layers they replace and numerically equal
to the reshape/transpose formulation, for every (kernel-shape, bias,
interleave) combination the three UNet families use."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from perceptor_tpu.models.attention_proj import HeadMergeProj, HeadProj

B, S, H, D = 2, 6, 4, 8
C = H * D


def test_head_proj_single_matches_dense_no_bias():
    # SD to_q/to_k/to_v: nn.Dense(inner, use_bias=False)
    mod = HeadProj(H, D, use_bias=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, C))
    params = mod.init(jax.random.PRNGKey(1), x)["params"]
    assert params["kernel"].shape == (C, H * D)
    assert "bias" not in params
    out = mod.apply({"params": params}, x)
    dense = x @ params["kernel"]
    expected = dense.reshape(B, S, H, D).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_head_proj_fused_head_interleave():
    # ADM Legacy: nn.Dense(3c) with channels = [head0(q|k|v), head1(q|k|v)...]
    mod = HeadProj(H, D, n_proj=3, interleave="head")
    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, C))
    params = mod.init(jax.random.PRNGKey(1), x)["params"]
    assert params["kernel"].shape == (C, 3 * C)
    assert params["bias"].shape == (3 * C,)
    params = jax.tree.map(
        lambda p: jax.random.normal(jax.random.PRNGKey(2), p.shape), params
    )
    q, k, v = mod.apply({"params": params}, x)
    dense = x @ params["kernel"] + params["bias"]
    # de-interleave: (b, s, heads, 3, d) -> per-proj (b, heads, s, d)
    split = dense.reshape(B, S, H, 3, D)
    for i, t in enumerate((q, k, v)):
        expected = split[:, :, :, i, :].transpose(0, 2, 1, 3)
        np.testing.assert_allclose(t, expected, atol=1e-5)


def test_head_proj_fused_proj_interleave_conv_kernel():
    # velocity: 1x1 nn.Conv(3c) with channels = [q(all heads)|k|v]
    mod = HeadProj(H, D, n_proj=3, interleave="proj", conv_kernel=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, C))
    params = mod.init(jax.random.PRNGKey(1), x)["params"]
    assert params["kernel"].shape == (1, 1, C, 3 * C)
    params = jax.tree.map(
        lambda p: jax.random.normal(jax.random.PRNGKey(2), p.shape), params
    )
    q, k, v = mod.apply({"params": params}, x)
    dense = x @ params["kernel"].reshape(C, 3 * C) + params["bias"]
    split = dense.reshape(B, S, 3, H, D)
    for i, t in enumerate((q, k, v)):
        expected = split[:, :, i].transpose(0, 2, 1, 3)
        np.testing.assert_allclose(t, expected, atol=1e-5)


def test_head_merge_proj_matches_dense():
    for conv_kernel in (False, True):
        mod = HeadMergeProj(C, H, D, conv_kernel=conv_kernel)
        y = jax.random.normal(jax.random.PRNGKey(0), (B, H, S, D))
        params = mod.init(jax.random.PRNGKey(1), y)["params"]
        expected_shape = (1, 1, C, C) if conv_kernel else (C, C)
        assert params["kernel"].shape == expected_shape
        params = jax.tree.map(
            lambda p: jax.random.normal(jax.random.PRNGKey(2), p.shape), params
        )
        out = mod.apply({"params": params}, y)
        merged = y.transpose(0, 2, 1, 3).reshape(B, S, C)
        expected = merged @ params["kernel"].reshape(C, C) + params["bias"]
        np.testing.assert_allclose(out, expected, atol=1e-5)


def test_head_merge_proj_non_square():
    mod = HeadMergeProj(3 * C, H, D)
    y = jax.random.normal(jax.random.PRNGKey(0), (B, H, S, D))
    params = mod.init(jax.random.PRNGKey(1), y)["params"]
    assert params["kernel"].shape == (C, 3 * C)
    out = mod.apply({"params": params}, y)
    assert out.shape == (B, S, 3 * C)


def test_padded_emission_attention_chain_is_exact():
    """HeadProj(emit_dim=lane-padded) -> attention -> HeadMergeProj must
    match the unpadded chain with the same params: the pad lanes are zeros
    in q/k (adding 0.0 terms to every score contraction) and in v (zero
    output lanes consumed by zero merge-weight rows). The comparison is at
    float32-ULP tolerance, not bit-exact — padding the contraction dim
    changes XLA's reduction tiling, which reorders the fp accumulation."""
    import math

    from perceptor_tpu.ops.attention import dot_product_attention

    D_PAD = D + (-D) % 128  # what the flash kernel pads to on TPU
    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, C))
    scale = 1.0 / math.sqrt(D)

    outs = {}
    for emit in (None, D_PAD):
        proj = HeadProj(H, D, use_bias=False, emit_dim=emit)
        params = proj.init(jax.random.PRNGKey(1), x)["params"]
        assert params["kernel"].shape == (C, H * D)  # emit_dim never in params
        q = proj.apply({"params": params}, x)
        assert q.shape[-1] == (emit or D)
        att = dot_product_attention(q, q, q, scale=scale)
        merge = HeadMergeProj(C, H, D)
        mparams = merge.init(jax.random.PRNGKey(2), att[..., :D])["params"]
        outs[emit] = merge.apply({"params": mparams}, att)
    np.testing.assert_allclose(outs[None], outs[D_PAD], rtol=2e-4, atol=2e-6)


def test_padded_emission_fused_qkv():
    """n_proj=3 with emit_dim: padded lanes are exactly zero and the true
    lanes match the unpadded projection, for both interleave layouts."""
    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, C))
    for interleave in ("proj", "head"):
        mod = HeadProj(H, D, n_proj=3, interleave=interleave)
        params = mod.init(jax.random.PRNGKey(1), x)["params"]
        padded = HeadProj(H, D, n_proj=3, interleave=interleave, emit_dim=64)
        base = mod.apply({"params": params}, x)
        wide = padded.apply({"params": params}, x)
        for t0, t1 in zip(base, wide):
            assert t1.shape == (*t0.shape[:-1], 64)
            np.testing.assert_array_equal(t1[..., : t0.shape[-1]], t0)
            np.testing.assert_array_equal(
                t1[..., t0.shape[-1] :], np.zeros_like(t1[..., t0.shape[-1] :])
            )
