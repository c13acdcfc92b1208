"""CLIP ModifiedResNet visual tower (RN50 / RN101 / RN50x{4,16,64}).

Semantics follow open_clip's ModifiedResNet (the reference exposes these
architectures through its OpenCLIP wrapper, reference
perceptor/models/clip.py:9-19 + open_clip.py:22-44): 3-conv anti-aliased
stem with a trailing 2x average pool, bottlenecks whose strides are
average pools (never strided convs), an average-pooled downsample branch,
and a multi-head attention pool with a prepended mean token. BatchNorm is
inference-mode (frozen running stats as parameters).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from perceptor_tpu.models.adabins_depth import FrozenBatchNorm


def _avg_pool(x, stride: int):
    return nn.avg_pool(x, (stride, stride), strides=(stride, stride))


class CLIPBottleneck(nn.Module):
    """open_clip Bottleneck (expansion 4): all convs stride 1; spatial
    reduction via AvgPool2d(stride) after conv2 and in the shortcut."""

    planes: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        identity = x
        h = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = jax.nn.relu(FrozenBatchNorm(1e-5, name="bn1")(h))
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = jax.nn.relu(FrozenBatchNorm(1e-5, name="bn2")(h))
        if self.stride > 1:
            h = _avg_pool(h, self.stride)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = FrozenBatchNorm(1e-5, name="bn3")(h)
        if self.stride > 1 or x.shape[-1] != out_ch:
            identity = x
            if self.stride > 1:
                identity = _avg_pool(identity, self.stride)
            identity = nn.Conv(
                out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                name="downsample_conv",
            )(identity)
            identity = FrozenBatchNorm(1e-5, name="downsample_bn")(identity)
        return jax.nn.relu(h + identity)


class AttentionPool2d(nn.Module):
    """Mean-token multi-head attention pooling (open_clip AttentionPool2d):
    query = the prepended mean token, keys/values = all positions."""

    num_heads: int
    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        tokens = x.reshape(n, h * w, c)
        tokens = jnp.concatenate(
            [tokens.mean(axis=1, keepdims=True), tokens], axis=1
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(c**-0.5),
            (h * w + 1, c),
        )
        tokens = (tokens + pos.astype(tokens.dtype)).astype(self.dtype)
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(tokens[:, :1])
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(tokens)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(tokens)
        hd = c // self.num_heads

        def heads(t):
            return t.reshape(n, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jax.nn.softmax(
            jnp.einsum("nhqd,nhkd->nhqk", q, k) / np.sqrt(hd), axis=-1
        )
        out = jnp.einsum("nhqk,nhkd->nhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(n, 1, c)
        out = nn.Dense(self.output_dim, dtype=self.dtype, name="c_proj")(out)
        return out[:, 0].astype(jnp.float32)


class ModifiedResNet(nn.Module):
    """CLIP ResNet visual tower; NCHW in, (N, embed_dim) out."""

    layers: tuple
    width: int
    heads: int
    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        h = images.transpose(0, 2, 3, 1).astype(self.dtype)
        for i, (ch, stride) in enumerate(
            [(self.width // 2, 2), (self.width // 2, 1), (self.width, 1)]
        ):
            h = nn.Conv(ch, (3, 3), strides=stride, padding=1,
                        use_bias=False, dtype=self.dtype, name=f"conv{i + 1}")(h)
            h = jax.nn.relu(FrozenBatchNorm(1e-5, name=f"bn{i + 1}")(h))
        h = _avg_pool(h, 2)
        for stage, count in enumerate(self.layers):
            planes = self.width * (2**stage)
            for i in range(count):
                stride = 2 if (stage > 0 and i == 0) else 1
                h = CLIPBottleneck(
                    planes, stride, self.dtype, name=f"layer{stage + 1}_{i}"
                )(h)
        return AttentionPool2d(
            self.heads, self.output_dim, self.dtype, name="attnpool"
        )(h)
