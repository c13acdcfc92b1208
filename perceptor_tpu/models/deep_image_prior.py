"""Deep-image-prior HQ skip network in flax.

Functional spec: reference perceptor/models/deep_image_prior/ —
`get_hq_skip_net` (get_hq_skip_net.py:72-118: 192-ch skip net, reflection
pad, cubic FIR up/downsampling, LeakyReLU, BatchNorm, 1x1 skip branches of
width 4, decorrelated-RGB head + sigmoid) assembled by skip.py:7-167, and
the wrapper deep_image_prior.py:17-151 with its latent factories (random
:73-79, Fourier-feature grids :80-119, noisy image latents :121-133).

Deformable-conv offsets (offset_type "1x1"/"full", common.py:92-219 over
torchvision DeformConv2d with offset_groups=4) are supported through
ops.deform_conv (per-tap bilinear gathers + MXU contraction); offset
branches carry "offset_conv" in their param path so the reference's
get_offset_params/get_non_offset_params LR split (get_hq_skip_net.py:120-140,
deep_image_prior.py:135-151) maps to `offset_param_labels` + optax
multi_transform.

BatchNorm is train-mode only (per-image optimization never uses running
stats), implemented as a stateless batch-stat normalization.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from perceptor_tpu import utils
from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.ops.upfirdn import fir_downsample_2x, fir_upsample_2x

DEFAULT_SIZE = 256
DEFAULT_SHAPE = (128, DEFAULT_SIZE, DEFAULT_SIZE)

# aphantasia color-correlation matrix (reference common.py:106-129)
_COLOR_CORR = np.array(
    [[0.26, 0.09, 0.02], [0.27, 0.00, -0.05], [0.27, -0.09, 0.03]], dtype=np.float32
)


def _decorrelation_matrix(inv_color_scale: float = 1.6) -> np.ndarray:
    m = _COLOR_CORR / np.array([inv_color_scale, 1.0, 1.0], dtype=np.float32)
    m = m / np.linalg.norm(m, axis=0).max()
    return m.T


class TrainBatchNorm(nn.Module):
    """BatchNorm using batch statistics (the only mode DIP ever runs in).

    Statistics and normalization run in fp32 regardless of the compute
    dtype (the repo's bf16-compute / fp32-norm convention, as in the
    SD/ADM GroupNorms); the output is cast back to `dtype`."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=(0, 1, 2), keepdims=True)
        var = xf.var(axis=(0, 1, 2), keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
        return (y * scale + bias).astype(self.dtype)


def _reflect_conv(x, features, kernel, dtype, name):
    pad = (kernel - 1) // 2
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    return nn.Conv(
        features, (kernel, kernel), padding="VALID", dtype=dtype, name=name
    )(x)


class DeformConvLayer(nn.Module):
    """Reflection-padded deformable conv (reference common.py:163-219).

    offset_type "1x1": offsets from a 1x1 conv on the unpadded input;
    "full": offsets from a KxK conv on the reflection-padded input. The
    offset branch is named `<name>/offset_conv` for LR-group filtering.
    Offset-group count is demoted until it divides the input channels
    (common.py:196-197). NHWC in/out.
    """

    features: int
    kernel: int = 3
    offset_groups: int = 4
    offset_type: str = "1x1"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from perceptor_tpu.ops.deform_conv import deform_conv2d

        k = self.kernel
        pad = (k - 1) // 2
        c = x.shape[-1]
        g = self.offset_groups
        while g > 1 and c % g:
            g -= 1

        x_pad = jnp.pad(
            x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect"
        )
        if self.offset_type == "1x1":
            offsets = nn.Conv(
                2 * g * k * k, (1, 1), dtype=self.dtype, name="offset_conv"
            )(x)
        elif self.offset_type == "full":
            offsets = nn.Conv(
                2 * g * k * k,
                (k, k),
                padding="VALID",
                dtype=self.dtype,
                name="offset_conv",
            )(x_pad)
        else:
            raise ValueError(f"unknown offset_type {self.offset_type!r}")

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, c, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        out = deform_conv2d(
            x_pad.transpose(0, 3, 1, 2).astype(self.dtype),
            offsets.transpose(0, 3, 1, 2),
            kernel.transpose(3, 2, 0, 1).astype(self.dtype),  # HWIO -> OIHW
            bias,
        )
        return out.transpose(0, 2, 3, 1)


class SkipNet(nn.Module):
    """The HQ skip encoder-decoder (reference skip.py:7-167). NHWC."""

    output_channels: int = 3
    n_scales: int = 2
    channels_down: int = 192
    channels_up: int = 192
    channels_skip: int = 4
    sigmoid: bool = True
    decorrelate_rgb: bool = True
    offset_type: str = "none"
    offset_groups: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents):
        """latents NCHW -> images NCHW."""
        x = latents.transpose(0, 2, 3, 1).astype(self.dtype)
        act = lambda h: jax.nn.leaky_relu(h, 0.2)

        def bn(h, name):
            return TrainBatchNorm(dtype=self.dtype, name=name)(h)

        def conv3(h, features, name):
            # 3x3 convs become deformable under offset_type "1x1"/"full"
            # (reference skip.py:95-146 routes them through common.conv)
            if self.offset_type != "none":
                return DeformConvLayer(
                    features,
                    kernel=3,
                    offset_groups=self.offset_groups,
                    offset_type=self.offset_type,
                    dtype=self.dtype,
                    name=name,
                )(h)
            return _reflect_conv(h, features, 3, self.dtype, name)

        def level(i, x):
            # skip branch: 1x1 conv -> BN -> act (skip.py:78-90)
            s = nn.Conv(
                self.channels_skip, (1, 1), dtype=self.dtype, name=f"skip_{i}_conv"
            )(x)
            s = act(bn(s, f"skip_{i}_bn"))

            # deeper branch: conv + cubic blur down, conv (skip.py:95-123)
            h = conv3(x, self.channels_down, f"down_{i}_conv1")
            h = h.transpose(0, 3, 1, 2)
            h = fir_downsample_2x(h, kernel="cubic")
            h = h.transpose(0, 2, 3, 1)
            h = act(bn(h, f"down_{i}_bn1"))
            h = conv3(h, self.channels_down, f"down_{i}_conv2")
            h = act(bn(h, f"down_{i}_bn2"))

            if i < self.n_scales - 1:
                h = level(i + 1, h)

            h = h.transpose(0, 3, 1, 2)
            h = fir_upsample_2x(h, kernel="cubic")
            h = h.transpose(0, 2, 3, 1)

            # concat [skip, deeper] then decode (skip.py:66-67, :136-157)
            y = jnp.concatenate([s, h], axis=-1)
            y = bn(y, f"up_{i}_bn0")
            y = conv3(y, self.channels_up, f"up_{i}_conv1")
            y = act(bn(y, f"up_{i}_bn1"))
            y = nn.Conv(
                self.channels_up, (1, 1), dtype=self.dtype, name=f"up_{i}_conv2"
            )(y)
            y = act(bn(y, f"up_{i}_bn2"))
            return y

        x = level(0, x)
        x = nn.Conv(
            self.output_channels, (1, 1), dtype=self.dtype, name="head_conv"
        )(x)
        x = x.transpose(0, 3, 1, 2).astype(jnp.float32)
        if self.decorrelate_rgb and self.output_channels == 3:
            x = jnp.einsum("nchw,cd->ndhw", x, jnp.asarray(_decorrelation_matrix()))
        if self.sigmoid:
            x = jax.nn.sigmoid(x)
        return x


def offset_param_labels(params):
    """Map a SkipNet params tree to {"offset", "main"} labels (the JAX form
    of the reference's get_offset_params/get_non_offset_params name filter,
    get_hq_skip_net.py:128/:140: "offset_branch" in parameter name)."""

    def label(path, _):
        return (
            "offset"
            if any("offset_conv" in str(getattr(k, "key", k)) for k in path)
            else "main"
        )

    return jax.tree_util.tree_map_with_path(label, params)


@utils.cache
class DeepImagePrior:
    """Wrapper mirroring reference deep_image_prior.py:17-151."""

    def __init__(
        self,
        shape: Tuple[int, int, int] = DEFAULT_SHAPE,
        offset_type: str = "none",
        n_scales: int = 2,
        sigmoid: bool = True,
        decorrelate_rgb: bool = True,
        output_channels: int = 3,
        seed: int = 0,
        fp16: bool = True,
    ):
        """`fp16=True` (default) runs the SkipNet convs in bf16 with fp32
        BatchNorm/head — the repo's standard compute convention. Measured
        round 4 (scripts/ab_deform_conv.py): the all-fp32 net ran at a
        fraction of MXU bf16 peak and dominated config 2's step time."""
        if offset_type not in ("none", "1x1", "full"):
            raise ValueError(f"unknown offset_type {offset_type!r}")
        input_channels, height, width = shape
        if height != width or height % 8:
            raise ValueError("DIP expects square size divisible by 8")
        self.shape = shape
        self.n_scales = n_scales
        self.output_channels = output_channels
        self.module = SkipNet(
            output_channels=output_channels,
            n_scales=n_scales,
            sigmoid=sigmoid,
            decorrelate_rgb=decorrelate_rgb,
            offset_type=offset_type,
            dtype=jnp.bfloat16 if fp16 else jnp.float32,
        )
        self.params = init_by_shape(
            self.module.init,
            jax.random.PRNGKey(seed),
            jnp.zeros((1, input_channels, height, width)),
            seed=seed,
        )["params"]
        self._jit_apply = jax.jit(
            lambda params, latents: self.module.apply({"params": params}, latents)
        )

    @property
    def input_channels(self):
        return self.shape[0]

    @property
    def height(self):
        return self.shape[1]

    @property
    def width(self):
        return self.shape[2]

    def __call__(self, latents, params=None):
        return self._jit_apply(self.params if params is None else params, latents)

    forward = __call__

    def apply_fn(self, params, latents):
        """Pure form for fused guidance steps."""
        return self.module.apply({"params": params}, latents)

    # -- latent factories (reference :73-133) ------------------------------------

    def random_latents(self, key, size: int = 1, n_channels: Optional[int] = None):
        n_channels = n_channels or self.input_channels
        return 0.1 * jax.random.normal(
            key, (size, n_channels, self.height, self.width)
        )

    def fourier_latents(
        self,
        size: int = 1,
        n_channels: Optional[int] = None,
        min_log2_frequency: float = 0.0,
        max_log2_frequency: float = 9.0,
        log2_space: bool = False,
    ):
        n_channels = n_channels or self.input_channels
        if n_channels % 4:
            raise ValueError("n_channels must be divisible by 4")
        xs = np.linspace(-1, 1, self.width)
        ys = np.linspace(-1, 1, self.height)
        meshgrid = np.stack(np.meshgrid(xs, ys, indexing="ij"), axis=0)
        if log2_space:
            frequencies = 2.0 ** np.linspace(
                min_log2_frequency, max_log2_frequency, n_channels // 4
            )
        else:
            frequencies = np.linspace(
                2.0**min_log2_frequency, 2.0**max_log2_frequency, n_channels // 4
            )
        phases = meshgrid[None] * frequencies[:, None, None, None] * 2 * np.pi
        latents = np.concatenate([np.sin(phases), np.cos(phases)], axis=0)
        latents = latents.reshape(1, -1, self.height, self.width)
        return jnp.asarray(np.repeat(latents, size, axis=0) * 0.3, dtype=jnp.float32)

    # -- LR groups for deformable offsets (reference get_hq_skip_net.py:120-140,
    #    deep_image_prior.py:135-151: offset branches train at lr/10) -----------

    def offset_param_labels(self, params=None):
        """Label pytree for optax.multi_transform: "offset" on offset-branch
        leaves, "main" elsewhere."""
        return offset_param_labels(self.params if params is None else params)

    def optimizer(self, learning_rate: float = 0.01):
        """Adam with the reference's lr/10 offset-branch group."""
        import optax

        return optax.multi_transform(
            {
                "main": optax.adam(learning_rate),
                "offset": optax.adam(learning_rate * 0.1),
            },
            self.offset_param_labels,
        )

    def noisy_image_latents(
        self, images, key, n_channels: Optional[int] = None, log_snr: float = -1.0
    ):
        n_channels = n_channels or self.input_channels
        sigma = 1.0 / (np.sqrt(np.exp(log_snr)) + 1.0)
        channels = images.shape[1]
        repeated = jnp.stack(
            [images[:, index % channels] for index in range(n_channels)], axis=1
        )
        noise = jax.random.normal(key, repeated.shape, repeated.dtype)
        return 0.1 * ((repeated * 2 - 1) * (1 - sigma) + noise * sigma)
