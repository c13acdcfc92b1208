"""Patch embedding as an einsum (MXU path for fwd AND the input-VJP).

Every ViT tower patchifies with a stride=kernel convolution. Expressed as
`lax.conv`, XLA's TPU *transposed-conv emitter* for the input gradient —
the gradient every guidance loss needs, dL/d(image) through the patch
embed — picks a pathological window emitter: profiling the fused guided
step showed a single bf16[1,3,224,224] conv-transpose fusion costing
~20 ms/step, ~half the whole step (CLIP ViT-B/32 at 224px; HLO
`fusion.2339`, EmitOutputBatchInLanesInputBatchInSublanes). Because the
patches don't overlap, the same op is exactly a reshape + matmul, whose
transpose is another matmul: both directions run on the MXU at full rate.

Parameter layout matches nn.Conv (kernel HWIO (P, P, C, W), optional
bias), so checkpoint converters and existing param trees are unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class PatchEmbed(nn.Module):
    """Non-overlapping convolution patch embedding, NHWC -> (N, H/P, W/P, F)."""

    features: int
    patch_size: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        n, h, w, c = x.shape
        if h % p or w % p:
            raise ValueError(f"image size ({h}, {w}) not divisible by patch {p}")
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, c, self.features),
        )
        x = x.reshape(n, h // p, p, w // p, p, c).astype(self.dtype)
        out = jnp.einsum("nhiwjc,ijcd->nhwd", x, kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias.astype(self.dtype)
        return out
