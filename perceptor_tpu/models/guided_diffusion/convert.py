"""ADM torch checkpoints -> flax param trees (name-mapped).

ADM state_dict names are positional but shallow
("input_blocks.3.0.in_layers.2.weight"); unet.ADMUNet mirrors the indices,
so conversion is a rename table + layout transposes:
    conv (O,I,kh,kw) -> (kh,kw,I,O); conv1d (O,I,1) -> (I,O) dense;
    linear (O,I) -> (I,O); norm weight -> scale.
"""

from __future__ import annotations

import re
from typing import Dict

from perceptor_tpu.models.clip.convert import _np

_SUB_MAP = {
    "in_layers.0": ("norm1", "norm"),
    "in_layers.2": ("conv1", "conv"),
    "emb_layers.1": ("emb_proj", "linear"),
    "out_layers.0": ("norm2", "norm"),
    "out_layers.3": ("conv2", "conv"),
    "skip_connection": ("skip", "conv"),
    "norm": ("norm", "norm"),
    "qkv": ("qkv", "conv1d"),
    "proj_out": ("proj_out", "conv1d"),
}


def _convert_value(value, kind, leaf):
    value = _np(value)
    if leaf == "bias" or kind == "norm":
        return value
    if value.ndim == 4:
        return value.transpose(2, 3, 1, 0)
    if value.ndim == 3:  # conv1d acting as dense
        return value[:, :, 0].T
    if value.ndim == 2:
        return value.T
    return value


def from_torch(state_dict: Dict) -> Dict:
    params: Dict = {}

    def put(module, sub, kind, leaf, value):
        name = "scale" if (kind == "norm" and leaf == "weight") else leaf
        if leaf == "weight" and kind != "norm":
            name = "kernel"
        params.setdefault(module, {})
        if sub is None:
            params[module][name] = _convert_value(value, kind, leaf)
        else:
            params[module].setdefault(sub, {})
            params[module][sub][name] = _convert_value(value, kind, leaf)

    for key, value in state_dict.items():
        leaf = key.rsplit(".", 1)[1]  # weight | bias
        body = key.rsplit(".", 1)[0]

        if body in ("time_embed.0", "time_embed.2"):
            put(f"time_embed_{body[-1]}", None, "linear", leaf, value)
            continue
        if body == "out.0":
            put("out_norm", None, "norm", leaf, value)
            continue
        if body == "out.2":
            put("out_conv", None, "conv", leaf, value)
            continue
        if body == "input_blocks.0.0":
            put("input_blocks_0_0", None, "conv", leaf, value)
            continue

        match = re.match(
            r"(input_blocks|output_blocks|middle_block)\.?(\d+)?\.(\d+)\.(.+)", key
        )
        if not match:
            raise ValueError(f"unrecognized ADM key: {key}")
        group, idx, sub_idx, rest = match.groups()
        rest_body = rest.rsplit(".", 1)[0]
        base = f"{group}_{idx}_{sub_idx}" if idx is not None else f"{group}_{sub_idx}"

        if rest_body == "op":  # Downsample conv
            put(f"{base}_op", None, "conv", leaf, value)
        elif rest_body == "conv":  # Upsample conv
            put(f"{base}_conv", None, "conv", leaf, value)
        elif rest_body in _SUB_MAP:
            sub, kind = _SUB_MAP[rest_body]
            put(base, sub, kind, leaf, value)
        elif rest_body.startswith(("proj_in", "proj_out", "transformer_blocks")):
            _put_spatial_transformer(params, base, rest, value)
        else:
            raise ValueError(f"unrecognized ADM sub-layer: {key}")

    return params


_TRANSFORMER_LINEARS = {"to_q", "to_k", "to_v"}


def _put_spatial_transformer(params, base, rest, value):
    """LDM SpatialTransformer keys (openaimodel UNet with
    use_spatial_transformer) -> the SD SpatialTransformer flax tree."""
    params.setdefault(base, {})
    node = params[base]
    parts = rest.split(".")
    leaf = parts[-1]
    if parts[0] in ("proj_in", "proj_out"):
        node.setdefault(parts[0], {})
        node[parts[0]]["kernel" if leaf == "weight" else leaf] = _convert_value(
            value, "conv", leaf
        )
        return
    # transformer_blocks.{k}.<module...>.{weight|bias}
    block = f"transformer_blocks_{parts[1]}"
    node.setdefault(block, {})
    sub = node[block]
    path = parts[2:-1]
    if path[0] in ("norm1", "norm2", "norm3"):
        sub.setdefault(path[0], {})
        sub[path[0]]["scale" if leaf == "weight" else leaf] = _convert_value(
            value, "norm", leaf
        )
        return
    if path[0] in ("attn1", "attn2"):
        name = "to_out_0" if path[1] == "to_out" else path[1]
        sub.setdefault(path[0], {}).setdefault(name, {})
        sub[path[0]][name]["kernel" if leaf == "weight" else leaf] = _convert_value(
            value, "linear", leaf
        )
        return
    if path[0] == "ff":
        name = "net_0_proj" if path[1:3] == ["net", "0"] else "net_2"
        sub.setdefault("ff", {}).setdefault(name, {})
        sub["ff"][name]["kernel" if leaf == "weight" else leaf] = _convert_value(
            value, "linear", leaf
        )
        return
    raise ValueError(f"unrecognized transformer sub-layer: {base}.{rest}")
