"""crowsonkb v-diffusion torch checkpoints -> flax param trees.

The torch models are deeply nested nn.Sequentials with positional names
("net.3.main.2.main.0.weight" ...), so instead of reconstructing index
arithmetic, the converter walks the SAME structural order as
net.VDiffusionUNet's trace (torch state_dicts preserve registration order,
which equals that traversal) and consumes key groups as it goes. Skip-conv
presence is detected by peeking the next key's block prefix, so no channel
bookkeeping can drift from the checkpoint.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from perceptor_tpu.models.clip.convert import _np
from perceptor_tpu.models.velocity_diffusion.configs import VNetConfig


class _Stream:
    def __init__(self, state_dict: Dict):
        self.items = [(k, v) for k, v in state_dict.items()]
        self.pos = 0

    def take(self, suffix: str):
        key, value = self.items[self.pos]
        if not key.endswith(suffix):
            raise ValueError(
                f"checkpoint walk mismatch at #{self.pos}: expected *{suffix}, "
                f"got {key}"
            )
        self.pos += 1
        return key, _np(value)

    def peek_key(self):
        return self.items[self.pos][0] if self.pos < len(self.items) else None

    def done(self):
        return self.pos >= len(self.items)


def _conv(stream: _Stream) -> Dict[str, np.ndarray]:
    _, weight = stream.take("weight")  # (O, I, kh, kw)
    _, bias = stream.take("bias")
    return {"kernel": weight.transpose(2, 3, 1, 0), "bias": bias}


def _linear(stream: _Stream, bias=True) -> Dict[str, np.ndarray]:
    _, weight = stream.take("weight")
    out = {"kernel": weight.T}
    if bias:
        _, b = stream.take("bias")
        out["bias"] = b
    return out


def _take_skip(stream: _Stream, conv: bool):
    _, weight = stream.take("skip.weight")
    if conv:
        return {"kernel": weight.transpose(2, 3, 1, 0)}
    return {"kernel": weight.T}


def _block_prefix(key: str) -> str:
    """Prefix of the block owning this key: strip the LAST main./skip.
    segment (blocks nest, so earlier occurrences belong to ancestors)."""
    idx = max(key.rfind("main."), key.rfind("skip."))
    return key[:idx]


def _residual_block(stream: _Stream, take_main) -> Dict:
    prefix = _block_prefix(stream.peek_key())
    out = {}
    conv = True
    if stream.peek_key() == f"{prefix}skip.weight":
        out["skip"] = _take_skip(stream, conv)
    out.update(take_main())
    if "skip" not in out and stream.peek_key() == f"{prefix}skip.weight":
        out["skip"] = _take_skip(stream, conv)
    return out


def _res_conv_block(stream: _Stream) -> Dict:
    return _residual_block(
        stream, lambda: {"conv1": _conv(stream), "conv2": _conv(stream)}
    )


def _mod_conv_block(stream: _Stream, is_last: bool) -> Dict:
    def take_main():
        out = {"conv1": _conv(stream), "mod1_mod": _linear(stream, bias=False)}
        out["conv2"] = _conv(stream)
        if not is_last:
            out["mod2_mod"] = _linear(stream, bias=False)
        return out

    return _residual_block(stream, take_main)


def _res_linear_block(stream: _Stream) -> Dict:
    prefix = _block_prefix(stream.peek_key())
    out = {}
    if stream.peek_key() == f"{prefix}skip.weight":
        _, weight = stream.take("skip.weight")
        out["skip"] = {"kernel": weight.T}
    out.update({"fc1": _linear(stream), "fc2": _linear(stream)})
    if "skip" not in out and stream.peek_key() == f"{prefix}skip.weight":
        _, weight = stream.take("skip.weight")
        out["skip"] = {"kernel": weight.T}
    return out


def _attention(stream: _Stream, use_norm: bool = True) -> Dict:
    out = {}
    if use_norm:
        _, norm_w = stream.take("weight")
        _, norm_b = stream.take("bias")
        out["norm"] = {"scale": norm_w, "bias": norm_b}
    out["qkv_proj"] = _conv(stream)
    out["out_proj"] = _conv(stream)
    return out


def from_torch(state_dict: Dict, cfg: VNetConfig) -> Dict:
    """Ordered walk of a v-diffusion checkpoint onto net.VDiffusionUNet."""
    stream = _Stream(state_dict)
    params: Dict = {}

    conditioned = cfg.mapping is not None
    if conditioned:
        _, fourier = stream.take("weight")
        params["mapping_timestep_embed"] = {"weight": fourier}
        params["mapping_0"] = _res_linear_block(stream)
        params["mapping_1"] = _res_linear_block(stream)

    _, fourier = stream.take("weight")
    params["timestep_embed"] = {"weight": fourier}

    cs = cfg.channels
    n_levels = len(cs)

    def take_block(name, is_last=False):
        params[name] = (
            _mod_conv_block(stream, is_last)
            if conditioned
            else _res_conv_block(stream)
        )

    def walk_level(level):
        use_attn = level in cfg.attn_levels
        if level == n_levels - 1:
            for j in range(cfg.n_inner):
                take_block(f"inner_{j}")
                if use_attn:
                    params[f"inner_{j}_attn"] = _attention(stream, cfg.attn_norm)
            return
        for j in range(cfg.n_blocks):
            take_block(f"down_{level}_{j}")
            if use_attn:
                params[f"down_{level}_{j}_attn"] = _attention(stream, cfg.attn_norm)
        walk_level(level + 1)
        for j in range(cfg.n_blocks):
            last = j == cfg.n_blocks - 1
            take_block(f"up_{level}_{j}", is_last=(level == 0 and last))
            if use_attn:
                params[f"up_{level}_{j}_attn"] = _attention(stream, cfg.attn_norm)

    walk_level(0)
    if not stream.done():
        raise ValueError(
            f"checkpoint has {len(stream.items) - stream.pos} unconsumed keys, "
            f"next: {stream.peek_key()}"
        )
    return params
