"""Monster-diffusion torch checkpoints -> flax param trees (ordered walk).

State-dict layout (reference base/model.py:143-233, registration order):
network.timestep_embed.weight (Fourier buffer), network.mapping_cond.weight,
network.mapping.{0,2}, network.proj_in, network.proj_out, then
u_net.d_blocks (with Downsample2d `kernel` buffers) and u_net.u_blocks
stored innermost-first (model.py:203: reversed(u_blocks)).
"""

from __future__ import annotations

from typing import Dict

from perceptor_tpu.models.monster_diffusion.net import MonsterConfig
from perceptor_tpu.models.velocity_diffusion.convert import (
    _Stream,
    _conv,
    _linear,
)


def _adagn(stream: _Stream) -> Dict:
    return {"mapper": _linear(stream)}


def _res_block(stream: _Stream) -> Dict:
    prefix_key = stream.peek_key()
    out = {
        "norm1": _adagn(stream),
        "conv1": _conv(stream),
        "norm2": _adagn(stream),
        "conv2": _conv(stream),
    }
    key = stream.peek_key()
    if key is not None and key.endswith("skip.weight") and key.startswith(
        prefix_key.rsplit("main.", 1)[0]
    ):
        _, weight = stream.take("skip.weight")
        out["skip"] = {"kernel": weight.transpose(2, 3, 1, 0)}
    return out


def _attention(stream: _Stream) -> Dict:
    return {
        "norm_in": _adagn(stream),
        "qkv_proj": _conv(stream),
        "out_proj": _conv(stream),
    }


def from_torch(state_dict: Dict, cfg: MonsterConfig) -> Dict:
    sd = {
        (k[len("network."):] if k.startswith("network.") else k): v
        for k, v in state_dict.items()
    }
    stream = _Stream(sd)
    params: Dict = {}

    _, fourier = stream.take("weight")
    params["timestep_embed"] = {"weight": fourier}
    _, mc = stream.take("weight")
    params["mapping_cond"] = {"kernel": mc.T}
    params["mapping_0"] = _linear(stream)
    params["mapping_1"] = _linear(stream)
    params["proj_in"] = _conv(stream)
    params["proj_out"] = _conv(stream)

    def walk(kind, i):
        if kind == "d" and i > 0:
            stream.take("kernel")  # fixed Downsample2d blur buffer
        for j in range(cfg.depths[i]):
            params[f"{kind}_{i}_res_{j}"] = _res_block(stream)
            if cfg.self_attn_depths[i]:
                params[f"{kind}_{i}_attn_{j}"] = _attention(stream)
        if kind == "u" and i > 0:
            stream.take("kernel")  # fixed Upsample2d blur buffer

    for i in range(len(cfg.depths)):
        walk("d", i)
    for i in reversed(range(len(cfg.depths))):  # u_blocks stored innermost-first
        walk("u", i)

    if not stream.done():
        raise ValueError(f"unconsumed keys, next: {stream.peek_key()}")
    return params
