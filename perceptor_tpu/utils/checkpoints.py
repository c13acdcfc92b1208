"""Checkpoint resolution and loading.

The reference downloads weights on construction (reference §2.9:
basicsr.load_file_from_url / HF hub, cached under a local `models/` dir).
This environment is zero-egress, so resolution is local-only: checkpoints
are searched in the cache dirs below; loading supports torch pickles
(.pt/.pth/.ckpt/.bin), numpy archives (.npz), and safetensors. Wrappers
fall back to deterministic random init when no checkpoint is present
(`pretrained="auto"`), so the full pipeline runs — weights drop in later
without code changes.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional

import numpy as np

CACHE_DIRS = (
    "models",
    os.path.expanduser("~/.cache/perceptor_tpu"),
    os.environ.get("PERCEPTOR_TPU_CACHE", ""),
)

_SUFFIXES = (".safetensors", ".npz", ".pt", ".pth", ".ckpt", ".bin")


def find_checkpoint(*names: str) -> Optional[str]:
    """Return the first existing checkpoint path among candidate basenames."""
    for name in names:
        if not name:
            continue
        if os.path.exists(name):
            return name
        for cache_dir in CACHE_DIRS:
            if not cache_dir:
                continue
            candidates: Iterable[str] = (
                [os.path.join(cache_dir, name)]
                if os.path.splitext(name)[1]
                else [os.path.join(cache_dir, name + sfx) for sfx in _SUFFIXES]
            )
            for path in candidates:
                if os.path.exists(path):
                    return path
    return None


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a checkpoint into a flat {name: np.ndarray} dict."""
    if path.endswith(".npz"):
        with np.load(path) as data:
            return {k: data[k] for k in data.files}
    if path.endswith(".safetensors"):
        from perceptor_tpu.utils import native_io

        if native_io.native_available():
            return native_io.load_safetensors(path)
        try:
            from safetensors.numpy import load_file

            return load_file(path)
        except ImportError as e:
            raise ImportError(
                "safetensors not available; convert the checkpoint to .npz"
            ) from e
    # torch pickle
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    out = {}
    for key, value in obj.items():
        if hasattr(value, "detach"):
            out[key] = value.detach().cpu().float().numpy()
        else:
            out[key] = np.asarray(value)
    return out


# -- native pre-converted artifacts ------------------------------------------------

NATIVE_FORMAT_KEY = "__perceptor_tpu_format__"
_NATIVE_FORMAT = "params-v1"


def flatten_params(params: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    """Nested flax param tree -> flat {'a/b/c': array} dict."""
    out: Dict[str, np.ndarray] = {}
    for key, value in params.items():
        path = f"{prefix}/{key}" if prefix else str(key)
        if isinstance(value, dict):
            out.update(flatten_params(value, path))
        else:
            out[path] = np.asarray(value)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]) -> Dict:
    """Inverse of flatten_params."""
    out: Dict = {}
    for path, value in flat.items():
        node = out
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return out


def save_params(path: str, params: Dict) -> None:
    """Write a pre-converted native-params artifact (.npz).

    The artifact is the wrapper's own (nested, NHWC/flax-layout) param
    tree, flattened with '/' separators plus a format sentinel — wrappers
    load it directly with no torch-layout conversion (and no torch
    dependency at serving time). Produced by `python -m
    perceptor_tpu.convert`."""
    flat = flatten_params(params)
    flat[NATIVE_FORMAT_KEY] = np.asarray(_NATIVE_FORMAT)
    if not path.endswith(".npz"):
        path += ".npz"
    np.savez(path, **flat)


def native_params(state_dict: Dict[str, np.ndarray]) -> Optional[Dict]:
    """Return the nested param tree if `state_dict` is a native
    pre-converted artifact (see save_params), else None."""
    if NATIVE_FORMAT_KEY not in state_dict:
        return None
    flat = {
        k: v for k, v in state_dict.items() if k != NATIVE_FORMAT_KEY
    }
    return unflatten_params(flat)
