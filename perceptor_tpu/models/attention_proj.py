"""Head-folded attention projections shared by the UNet families.

The reshape->transpose head split/merge around an attention kernel makes
XLA lay out whole transformer-block chains token-minor (e.g.
``bf16[2,4096,320]{1,2,0}``), turning the residual adds into ~42 TF/s
relayout fusions. Folding the split/merge INTO the projection contraction
(the same trick as models/patch_embed.py) keeps every intermediate
channel-minor: the input projection emits ``(batch, heads, seq, dim_head)``
directly and the output projection consumes it directly.

Both modules are param-compatible with the plain layer they replace
(``nn.Dense`` or a 1x1 ``nn.Conv``): same param names ("kernel"/"bias")
and shapes, so checkpoint converters are unaffected. The qkv channel
interleave of the source checkpoint is a static attribute:

- ``interleave="proj"``: channels = [q(h0..hN) | k(h0..hN) | v(h0..hN)]
  (velocity_diffusion's qkv-major 1x1 conv, reference yfcc_2.py:52-70).
- ``interleave="head"``: channels = [head0(q|k|v) | head1(q|k|v) | ...]
  (guided_diffusion's Legacy order, reference unet.py:355-380).

Measured on the 512px SD sample() scan (docs/PERFORMANCE.md): folding all
four projections removed ~18 ms/call of relayout fusions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class HeadProj(nn.Module):
    """Input projection emitting heads-major tokens.

    ``n_proj=1``: drop-in for ``nn.Dense(heads * dim_head)`` — returns ONE
    ``(b, heads, seq, dim_head)`` array. ``n_proj=3``: drop-in for a fused
    qkv ``nn.Dense(3c)`` / 1x1 conv — returns a (q, k, v) tuple, de-
    interleaved per ``interleave``.
    """

    heads: int
    dim_head: int
    n_proj: int = 1
    interleave: str = "proj"  # "proj" | "head"; only used when n_proj > 1
    conv_kernel: bool = False  # param shape (1,1,c,out) instead of (c,out)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    # Emit (b, heads, seq, emit_dim) with zero-padded head_dim lanes. When
    # the downstream kernel needs head_dim padded to the 128-lane width
    # (ops/flash_attention_kernel.py), padding the (tiny) projection weight
    # instead of the (large) activation deletes a whole HBM round-trip of
    # pad copies per q/k/v per call. The softmax scale must then be passed
    # explicitly (1/sqrt(true dim_head)) since q.shape[-1] is padded.
    emit_dim: int | None = None

    @nn.compact
    def __call__(self, x: jax.Array):
        c = x.shape[-1]
        h, d, n = self.heads, self.dim_head, self.n_proj
        de = self.emit_dim or d
        assert de >= d, "emit_dim must be >= dim_head"
        out_features = n * h * d
        shape = (1, 1, c, out_features) if self.conv_kernel else (c, out_features)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), shape, jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (out_features,), jnp.float32)
            if self.use_bias
            else None
        )

        def pad_d(w):  # (..., d) -> (..., emit_dim), zero lanes
            if de == d:
                return w
            return jnp.pad(w, [(0, 0)] * (w.ndim - 1) + [(0, de - d)])

        k = kernel.astype(self.dtype).reshape(c, out_features)
        b = bias.astype(self.dtype) if bias is not None else None
        if n == 1:
            out = jnp.einsum("bsc,chd->bhsd", x, pad_d(k.reshape(c, h, d)))
            if b is not None:
                out = out + pad_d(b.reshape(1, h, 1, d))
            return out
        if self.interleave == "head":
            kr = k.reshape(c, h, n, d)
            projs = [pad_d(kr[:, :, i]) for i in range(n)]
            br = b.reshape(h, n, d) if b is not None else None
            biases = [pad_d(br[None, :, i, None, :]) for i in range(n)] if b is not None else None
        else:
            kr = k.reshape(c, n, h, d)
            projs = [pad_d(kr[:, i]) for i in range(n)]
            br = b.reshape(n, h, d) if b is not None else None
            biases = [pad_d(br[i][None, :, None, :]) for i in range(n)] if b is not None else None
        return tuple(
            jnp.einsum("bsc,chd->bhsd", x, projs[i])
            + (biases[i] if biases is not None else 0.0)
            for i in range(n)
        )


class HeadMergeProj(nn.Module):
    """Output projection over an attention kernel's ``(b, heads, seq,
    dim_head)`` result: head merge + matmul as one einsum. Drop-in for
    ``nn.Dense(features)`` (or a 1x1 ``nn.Conv``) applied to the merged
    ``(b, seq, heads*dim_head)`` tokens."""

    features: int
    heads: int
    dim_head: int
    conv_kernel: bool = False
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jax.Array):
        h, d = self.heads, self.dim_head
        inner = h * d
        shape = (1, 1, inner, self.features) if self.conv_kernel else (
            inner,
            self.features,
        )
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), shape, jnp.float32
        )
        k = kernel.astype(self.dtype).reshape(h, d, self.features)
        if y.shape[-1] != d:
            # Padded-lane input from a kernel fed by HeadProj(emit_dim=...):
            # the pad lanes are exactly zero (zero V columns), so zero
            # weight rows consume them — the slice copy back to the true
            # head_dim disappears into the contraction.
            assert y.shape[-1] > d, (y.shape, d)
            k = jnp.pad(k, ((0, 0), (0, y.shape[-1] - d), (0, 0)))
        out = jnp.einsum("bhsd,hdo->bso", y, k)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            out = out + bias.astype(self.dtype)
        return out
