"""StyleGAN-XL / StyleGAN3 generator in flax (alias-free synthesis).

Functional spec: reference perceptor/models/stylegan_xl/ —
networks_stylegan3_resetting.py: FullyConnectedLayer (:~), MappingNetwork
(:134, class-embedding + 2 lrelu FC layers + per-class w_avg truncation),
SynthesisInput (Fourier features with learned affine transform),
SynthesisLayer (modulated/demodulated conv + filtered leaky ReLU with
per-layer Kaiser low-pass filters designed from the cutoff/stopband
geometric progression), SynthesisNetwork (:get_layer_specs), and the
wrapper stylegan_xl.py:18-62 (w -> image in [0,1], `latents()` seeds->w
with truncation, gen_utils.py:79,99).

The CUDA ops (bias_act/upfirdn2d/filtered_lrelu, torch_utils/ops/*) map to
ops/bias_act.py, ops/upfirdn.py and ops/filtered_lrelu.py. All filter
design (scipy Kaiser/jinc) runs at trace time on the host; buffers
(freqs/phases/magnitude_ema/filters) are loaded from checkpoints.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from perceptor_tpu import utils
from perceptor_tpu.core.init import init_by_shape
from perceptor_tpu.ops.bias_act import bias_act
from perceptor_tpu.ops.filtered_lrelu import filtered_lrelu
from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict


@dataclasses.dataclass(frozen=True)
class SynthesisConfig:
    w_dim: int = 512
    img_resolution: int = 128
    img_channels: int = 3
    channel_base: int = 32768
    channel_max: int = 512
    num_layers: int = 14
    num_critical: int = 2
    first_cutoff: float = 2.0
    first_stopband: float = 2**2.1
    last_stopband_rel: float = 2**0.3
    margin_size: int = 10
    output_scale: float = 0.25
    conv_kernel: int = 3
    filter_size: int = 6
    lrelu_upsampling: int = 2
    use_radial_filters: bool = False
    conv_clamp: float = 256.0

    @property
    def num_ws(self) -> int:
        return self.num_layers + 2


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    z_dim: int = 64
    c_dim: int = 1000
    w_dim: int = 512
    embed_dim: int = 320  # tf_efficientnet_lite0 feature dim
    mapping_layers: int = 2
    synthesis: SynthesisConfig = SynthesisConfig()


TINY = GeneratorConfig(
    z_dim=8, c_dim=4, w_dim=16, embed_dim=8,
    synthesis=SynthesisConfig(
        w_dim=16, img_resolution=32, channel_base=512, channel_max=32,
        num_layers=6, margin_size=2,
    ),
)

MODEL_CONFIGS = {
    "imagenet128": GeneratorConfig(synthesis=SynthesisConfig(img_resolution=128)),
    "ffhq256": GeneratorConfig(
        c_dim=0, synthesis=SynthesisConfig(img_resolution=256)
    ),
    "pokemon256": GeneratorConfig(synthesis=SynthesisConfig(img_resolution=256)),
    "tiny": TINY,
}


def design_lowpass_filter(numtaps, cutoff, width, fs, radial=False):
    """(reference networks_stylegan3_resetting.py design_lowpass_filter)."""
    import scipy.signal

    if numtaps == 1:
        return None
    if not radial:
        f = scipy.signal.firwin(numtaps=numtaps, cutoff=cutoff, width=width, fs=fs)
        return f.astype(np.float32)
    # radially symmetric jinc filter with Kaiser window
    import scipy.special

    x = (np.arange(numtaps) - (numtaps - 1) / 2) / fs
    r = np.hypot(*np.meshgrid(x, x))
    f = scipy.special.j1(2 * cutoff * (np.pi * r)) / (np.pi * r)
    beta = scipy.signal.kaiser_beta(
        scipy.signal.kaiser_atten(numtaps, width / (fs / 2))
    )
    w = np.kaiser(numtaps, beta)
    f *= np.outer(w, w)
    f /= np.sum(f)
    return f.astype(np.float32)


def layer_specs(cfg: SynthesisConfig):
    """(reference SynthesisNetwork.get_layer_specs)."""
    last_cutoff = cfg.img_resolution / 2
    last_stopband = last_cutoff * cfg.last_stopband_rel
    exponents = np.minimum(
        np.arange(cfg.num_layers + 1) / (cfg.num_layers - cfg.num_critical), 1
    )
    cutoffs = cfg.first_cutoff * (last_cutoff / cfg.first_cutoff) ** exponents
    stopbands = (
        cfg.first_stopband * (last_stopband / cfg.first_stopband) ** exponents
    )
    sampling_rates = np.exp2(
        np.ceil(np.log2(np.minimum(stopbands * 2, cfg.img_resolution)))
    )
    half_widths = np.maximum(stopbands, sampling_rates / 2) - cutoffs
    sizes = sampling_rates + cfg.margin_size * 2
    sizes[-2:] = cfg.img_resolution
    channels = np.rint(
        np.minimum((cfg.channel_base / 2) / cutoffs, cfg.channel_max)
    )
    channels[-1] = cfg.img_channels
    return cutoffs, stopbands, sampling_rates, half_widths, sizes, channels


def fully_connected(params, x, activation="linear", lr_multiplier=1.0):
    """FullyConnectedLayer forward (weight stored in torch (out,in) layout)."""
    weight = params["weight"] * (lr_multiplier / math.sqrt(params["weight"].shape[1]))
    x = x @ weight.T
    if "bias" in params:
        b = params["bias"] * lr_multiplier
        if activation == "linear":
            return x + b
        return bias_act(x, b, dim=-1, act=activation)
    if activation != "linear":
        return bias_act(x, act=activation, dim=-1)
    return x


def modulated_conv2d(x, weight, styles, padding=0, demodulate=True, input_gain=None):
    """(reference networks_stylegan3_resetting.py modulated_conv2d).
    x NCHW, weight (O, I, kh, kw) torch layout, styles (N, I)."""
    batch, in_channels = x.shape[0], x.shape[1]
    out_channels, _, kh, kw = weight.shape
    w = weight
    s = styles
    if demodulate:
        w = w * jax.lax.rsqrt(jnp.mean(jnp.square(w), axis=(1, 2, 3), keepdims=True))
        s = s * jax.lax.rsqrt(jnp.mean(jnp.square(s)))
    w = w[None] * s[:, None, :, None, None]  # (N, O, I, kh, kw)
    if demodulate:
        dcoefs = jax.lax.rsqrt(jnp.sum(jnp.square(w), axis=(2, 3, 4)) + 1e-8)
        w = w * dcoefs[:, :, None, None, None]
    if input_gain is not None:
        w = w * input_gain
    # grouped conv: batch as groups (reference casts w to x's dtype)
    x = x.reshape(1, batch * in_channels, *x.shape[2:])
    w = w.reshape(batch * out_channels, in_channels, kh, kw).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x,
        w.transpose(2, 3, 1, 0),  # (kh, kw, I, N*O) HWIO
        window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=batch,
    )
    return out.reshape(batch, out_channels, *out.shape[2:])


class StyleGANXLGenerator:
    """Pure-function generator over an explicit param/buffer tree."""

    def __init__(self, config: GeneratorConfig, dtype=jnp.float32):
        self.config = config
        self.dtype = dtype
        cfg = config.synthesis
        (self.cutoffs, self.stopbands, self.sampling_rates, self.half_widths,
         self.sizes, self.channels) = layer_specs(cfg)
        # static per-layer design
        self.layers = []
        for idx in range(cfg.num_layers + 1):
            prev = max(idx - 1, 0)
            is_torgb = idx == cfg.num_layers
            is_critical = idx >= cfg.num_layers - cfg.num_critical
            tmp_rate = max(self.sampling_rates[prev], self.sampling_rates[idx]) * (
                1 if is_torgb else cfg.lrelu_upsampling
            )
            up_factor = int(np.rint(tmp_rate / self.sampling_rates[prev]))
            down_factor = int(np.rint(tmp_rate / self.sampling_rates[idx]))
            up_taps = cfg.filter_size * up_factor if (
                up_factor > 1 and not is_torgb
            ) else 1
            down_taps = cfg.filter_size * down_factor if (
                down_factor > 1 and not is_torgb
            ) else 1
            down_radial = cfg.use_radial_filters and not is_critical
            up_filter = design_lowpass_filter(
                up_taps, self.cutoffs[prev], self.half_widths[prev] * 2, tmp_rate
            )
            down_filter = design_lowpass_filter(
                down_taps, self.cutoffs[idx], self.half_widths[idx] * 2, tmp_rate,
                radial=down_radial,
            )
            in_size = np.broadcast_to(np.asarray(int(self.sizes[prev])), [2])
            out_size = np.broadcast_to(np.asarray(int(self.sizes[idx])), [2])
            conv_kernel = 1 if is_torgb else cfg.conv_kernel
            pad_total = (out_size - 1) * down_factor + 1
            pad_total = pad_total - (in_size + conv_kernel - 1) * up_factor
            pad_total = pad_total + up_taps + down_taps - 2
            pad_lo = (pad_total + up_factor) // 2
            pad_hi = pad_total - pad_lo
            self.layers.append(dict(
                name=f"L{idx}_{int(out_size[0])}_{int(self.channels[idx])}",
                is_torgb=is_torgb,
                in_channels=int(self.channels[prev]),
                out_channels=int(self.channels[idx]),
                conv_kernel=conv_kernel,
                up_factor=up_factor,
                down_factor=down_factor,
                up_filter=up_filter,
                down_filter=down_filter,
                padding=(int(pad_lo[0]), int(pad_hi[0]), int(pad_lo[1]), int(pad_hi[1])),
            ))

    # -- initialization ---------------------------------------------------------

    def init_params(self, seed: int = 0) -> Dict:
        cfg = self.config.synthesis
        rng = np.random.default_rng(seed)
        c0 = int(self.channels[0])
        freqs = rng.normal(size=(c0, 2))
        radii = np.sqrt(np.sum(freqs**2, axis=1, keepdims=True))
        freqs = freqs / (radii * np.exp(radii**2) ** 0.25) * self.cutoffs[0]
        params: Dict = {
            "input": {
                "weight": rng.normal(size=(c0, c0)).astype(np.float32),
                "affine": {
                    "weight": np.zeros((4, cfg.w_dim), np.float32),
                    "bias": np.array([1, 0, 0, 0], np.float32),
                },
                "transform": np.eye(3, dtype=np.float32),
                "freqs": freqs.astype(np.float32),
                "phases": (rng.random(c0) - 0.5).astype(np.float32),
            }
        }
        for spec in self.layers:
            params[spec["name"]] = {
                "affine": {
                    "weight": rng.normal(
                        size=(spec["in_channels"], cfg.w_dim)
                    ).astype(np.float32),
                    "bias": np.ones((spec["in_channels"],), np.float32),
                },
                "weight": rng.normal(
                    size=(spec["out_channels"], spec["in_channels"],
                          spec["conv_kernel"], spec["conv_kernel"])
                ).astype(np.float32),
                "bias": np.zeros((spec["out_channels"],), np.float32),
                "magnitude_ema": np.ones((), np.float32),
            }
        gcfg = self.config
        mapping: Dict = {
            "w_avg": np.zeros(
                (gcfg.c_dim, gcfg.w_dim) if gcfg.c_dim else (gcfg.w_dim,),
                np.float32,
            ),
        }
        if gcfg.c_dim:
            mapping["embed"] = rng.normal(
                size=(gcfg.c_dim, gcfg.embed_dim)
            ).astype(np.float32)
            mapping["embed_proj"] = {
                "weight": rng.normal(size=(gcfg.z_dim, gcfg.embed_dim)).astype(
                    np.float32
                ),
                "bias": np.zeros((gcfg.z_dim,), np.float32),
            }
        in_features = gcfg.z_dim * (2 if gcfg.c_dim else 1)
        features = [in_features] + [gcfg.w_dim] * gcfg.mapping_layers
        for idx in range(gcfg.mapping_layers):
            mapping[f"fc{idx}"] = {
                "weight": (rng.normal(size=(features[idx + 1], features[idx]))
                           * (1 / 0.01)).astype(np.float32) * 0.01,
                "bias": np.zeros((features[idx + 1],), np.float32),
            }
        params["mapping"] = mapping
        return jax.tree.map(jnp.asarray, params)

    # -- synthesis ------------------------------------------------------------------

    def synthesis_input(self, params, w):
        """(reference SynthesisInput.forward)."""
        cfg = self.config.synthesis
        p = params["input"]
        size = int(self.sizes[0])
        sampling_rate = self.sampling_rates[0]
        bandwidth = self.cutoffs[0]

        t = fully_connected(p["affine"], w)  # (N, 4)
        t = t / jnp.linalg.norm(t[:, :2], axis=1, keepdims=True)
        n = w.shape[0]
        m_r = jnp.tile(jnp.eye(3), (n, 1, 1))
        m_r = m_r.at[:, 0, 0].set(t[:, 0]).at[:, 0, 1].set(-t[:, 1])
        m_r = m_r.at[:, 1, 0].set(t[:, 1]).at[:, 1, 1].set(t[:, 0])
        m_t = jnp.tile(jnp.eye(3), (n, 1, 1))
        m_t = m_t.at[:, 0, 2].set(-t[:, 2]).at[:, 1, 2].set(-t[:, 3])
        transforms = m_r @ m_t @ p["transform"][None]

        freqs = p["freqs"][None]  # (1, C, 2)
        phases = p["phases"][None]
        phases = phases + (freqs @ transforms[:, :2, 2:])[..., 0]
        freqs = freqs @ transforms[:, :2, :2]
        amplitudes = jnp.clip(
            1 - (jnp.linalg.norm(freqs, axis=2) - bandwidth)
            / (sampling_rate / 2 - bandwidth),
            0, 1,
        )
        # affine_grid(align_corners=False) over [size, size]
        theta_x = 0.5 * size / sampling_rate
        coords = (np.arange(size) * 2 + 1) / size - 1  # pixel centers in [-1,1]
        gx = coords[None, :] * theta_x
        gy = coords[:, None] * theta_x
        grid = np.stack(
            [np.broadcast_to(gx, (size, size)), np.broadcast_to(gy, (size, size))],
            axis=-1,
        )  # (H, W, 2)
        grid = jnp.asarray(grid, dtype=jnp.float32)
        x = jnp.einsum("hwd,ncd->nhwc", grid, freqs) + phases[:, None, None, :]
        x = jnp.sin(x * (np.pi * 2))
        x = x * amplitudes[:, None, None, :]
        weight = p["weight"] / np.sqrt(int(self.channels[0]))
        x = x @ weight.T
        return x.transpose(0, 3, 1, 2)  # NCHW

    def synthesis(self, params, ws) -> jax.Array:
        """ws (N, num_ws, w_dim) -> images NCHW in [-1, 1]-ish."""
        cfg = self.config.synthesis
        x = self.synthesis_input(params, ws[:, 0])
        for idx, spec in enumerate(self.layers):
            p = params[spec["name"]]
            w = ws[:, idx + 1]
            input_gain = jax.lax.rsqrt(p["magnitude_ema"])
            styles = fully_connected(p["affine"], w)
            if spec["is_torgb"]:
                styles = styles * (
                    1 / np.sqrt(spec["in_channels"] * spec["conv_kernel"] ** 2)
                )
            x = modulated_conv2d(
                x.astype(self.dtype),
                p["weight"].astype(self.dtype),
                styles.astype(self.dtype),
                padding=spec["conv_kernel"] - 1,
                demodulate=not spec["is_torgb"],
                input_gain=input_gain,
            )
            fu = (
                jnp.asarray(spec["up_filter"])
                if spec["up_filter"] is not None else None
            )
            fd = (
                jnp.asarray(spec["down_filter"])
                if spec["down_filter"] is not None else None
            )
            x = filtered_lrelu(
                x,
                fu=fu,
                fd=fd,
                b=p["bias"].astype(x.dtype),
                up=spec["up_factor"],
                down=spec["down_factor"],
                padding=spec["padding"],
                gain=1.0 if spec["is_torgb"] else math.sqrt(2),
                slope=1.0 if spec["is_torgb"] else 0.2,
                clamp=cfg.conv_clamp,
            )
        if cfg.output_scale != 1:
            x = x * cfg.output_scale
        return x.astype(jnp.float32)

    # -- mapping --------------------------------------------------------------------

    def mapping(self, params, z, class_indices=None, truncation_psi=1.0):
        """(reference MappingNetwork.forward + truncation)."""
        gcfg = self.config
        m = params["mapping"]
        x = z * jax.lax.rsqrt(jnp.mean(jnp.square(z), axis=1, keepdims=True) + 1e-8)
        if gcfg.c_dim:
            if class_indices is None:
                raise ValueError("class-conditional generator needs class_indices")
            y = m["embed"][jnp.asarray(class_indices)]
            y = fully_connected(m["embed_proj"], y, activation="lrelu")
            y = y * jax.lax.rsqrt(jnp.mean(jnp.square(y), axis=1, keepdims=True) + 1e-8)
            x = jnp.concatenate([x, y], axis=1)
        for idx in range(gcfg.mapping_layers):
            x = fully_connected(
                m[f"fc{idx}"], x, activation="lrelu", lr_multiplier=0.01
            )
        if truncation_psi != 1.0:
            if gcfg.c_dim:
                w_avg = m["w_avg"][jnp.asarray(class_indices)]
            else:
                w_avg = m["w_avg"][None]
            x = w_avg + truncation_psi * (x - w_avg)
        num_ws = gcfg.synthesis.num_ws
        return jnp.tile(x[:, None], (1, num_ws, 1))


@utils.cache
class StyleGANXL:
    def __init__(self, name: str = "imagenet128"):
        """(reference stylegan_xl.py:26-46)."""
        if name not in MODEL_CONFIGS:
            raise ValueError(f"unknown stylegan-xl model: {name}")
        self.name = name
        self.config = MODEL_CONFIGS[name]
        self.generator = StyleGANXLGenerator(self.config, dtype=jnp.bfloat16)
        path = find_checkpoint(f"stylegan_xl_{name}", name)
        if path is not None:
            self.params = jax.device_put(
                convert_stylegan_xl(load_state_dict(path), self.generator),
                jax.devices()[0],
            )
        else:
            self.params = jax.device_put(
                self.generator.init_params(), jax.devices()[0]
            )
        self._jit_synthesis = jax.jit(self.generator.synthesis)

    @property
    def num_ws(self):
        return self.config.synthesis.num_ws

    @property
    def w_dim(self):
        return self.config.w_dim if hasattr(self.config, "w_dim") else (
            self.config.synthesis.w_dim
        )

    def forward(self, latents) -> jax.Array:
        """w latents -> images in [0,1] (reference :54-55, gen_utils.py:79)."""
        images = self._jit_synthesis(self.params, latents)
        return (images + 1) / 2

    __call__ = forward

    def synthesis_fn(self, params, latents) -> jax.Array:
        return (self.generator.synthesis(params, latents) + 1) / 2

    def latents(self, size: int, seeds=None, class_indices=None,
                truncation_psi: float = 0.7) -> jax.Array:
        """seeds -> w latents with truncation (reference :57-62,
        gen_utils.py:99)."""
        if seeds is None:
            seeds = list(range(size))
        zs = np.stack([
            np.random.default_rng(seed).standard_normal(self.config.z_dim)
            for seed in seeds
        ]).astype(np.float32)
        if self.config.c_dim and class_indices is None:
            class_indices = [
                int(np.random.default_rng(seed).integers(self.config.c_dim))
                for seed in seeds
            ]
        return self.generator.mapping(
            self.params, jnp.asarray(zs), class_indices, truncation_psi
        )


def convert_stylegan_xl(state_dict: Dict, generator: StyleGANXLGenerator) -> Dict:
    """torch G state_dict (synthesis.L*_*, mapping.*) -> param tree."""
    from perceptor_tpu.models.clip.convert import _np

    sd = state_dict

    def fc(prefix):
        out = {"weight": _np(sd[f"{prefix}.weight"])}
        if f"{prefix}.bias" in sd:
            out["bias"] = _np(sd[f"{prefix}.bias"])
        return out

    params: Dict = {
        "input": {
            "weight": _np(sd["synthesis.input.weight"]),
            "affine": fc("synthesis.input.affine"),
            "transform": _np(sd["synthesis.input.transform"]),
            "freqs": _np(sd["synthesis.input.freqs"]),
            "phases": _np(sd["synthesis.input.phases"]),
        }
    }
    for spec in generator.layers:
        p = f"synthesis.{spec['name']}"
        params[spec["name"]] = {
            "affine": fc(f"{p}.affine"),
            "weight": _np(sd[f"{p}.weight"]),
            "bias": _np(sd[f"{p}.bias"]),
            "magnitude_ema": _np(sd[f"{p}.magnitude_ema"]),
        }
    if "mapping.w_avg" in sd:
        mapping: Dict = {"w_avg": _np(sd["mapping.w_avg"])}
        # conditional snapshots carry embed + embed_proj; UNCONDITIONAL
        # real snapshots still carry mapping.embed.weight (the reference
        # MappingNetwork always loads the imagenet embedding table,
        # networks_stylegan3_resetting.py:155-158) but no embed_proj —
        # the table is inference-dead there, so key on embed_proj
        if "mapping.embed_proj.weight" in sd:
            mapping["embed"] = _np(sd["mapping.embed.weight"])
            mapping["embed_proj"] = fc("mapping.embed_proj")
        idx = 0
        while f"mapping.fc{idx}.weight" in sd:
            mapping[f"fc{idx}"] = fc(f"mapping.fc{idx}")
            idx += 1
        params["mapping"] = mapping
    else:
        # synthesis-only checkpoint: keep a random-init mapping
        params["mapping"] = generator.init_params()["mapping"]
    return params
