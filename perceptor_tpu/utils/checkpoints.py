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

_SUFFIXES = (".safetensors", ".npz", ".pt", ".pth", ".ckpt", ".bin", ".pkl")


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


_SNAPSHOT_KEYS = ("G_ema", "G", "generator", "model_ema", "net")


def _module_state_dict(obj) -> Optional[Dict[str, np.ndarray]]:
    """Flat numpy state dict from a pickled nn.Module-like object (has
    .state_dict()), or None when `obj` isn't one."""
    state_dict = getattr(obj, "state_dict", None)
    if not callable(state_dict):
        return None
    out = {}
    for key, value in state_dict().items():
        out[key] = (
            value.detach().cpu().float().numpy()
            if hasattr(value, "detach")
            else np.asarray(value)
        )
    return out


def load_network_snapshot(path: str) -> Dict[str, np.ndarray]:
    """Network-snapshot pickle ({'G_ema': <module>, ...} dill layout, the
    StyleGAN-XL distribution format — reference
    perceptor/models/stylegan_xl/stylegan_xl.py:40-45) -> flat numpy
    state dict of the generator.

    The pickle reconstructs source-embedded module classes, so their
    import-time dependencies (`torch_utils`, `dnnlib`) must be importable
    — the reference arranges this with sys.modules injection before the
    dill.load (stylegan_xl.py:41-43); callers here do the same (or have
    the packages installed). Falls back from dill to stdlib pickle when
    dill isn't installed (dill-written files are ordinary pickles unless
    they needed dill-only features)."""
    try:
        import dill as pickler
    except ImportError:  # dill files are usually plain-pickle readable
        import pickle as pickler
    with open(path, "rb") as f:
        obj = pickler.load(f)
    if isinstance(obj, dict):
        for key in _SNAPSHOT_KEYS:
            if key in obj:
                obj = obj[key]
                break
    sd = _module_state_dict(obj)
    if sd is None:
        if isinstance(obj, dict):  # already a raw state dict
            return {
                k: (
                    v.detach().cpu().float().numpy()
                    if hasattr(v, "detach")
                    else np.asarray(v)
                )
                for k, v in obj.items()
            }
        raise ValueError(
            f"{path}: pickle holds {type(obj).__name__}, expected a module "
            f"with .state_dict() or a dict (keys tried: {_SNAPSHOT_KEYS})"
        )
    return sd


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a checkpoint into a flat {name: np.ndarray} dict."""
    if path.endswith(".npz"):
        with np.load(path) as data:
            return {k: data[k] for k in data.files}
    if path.endswith(".pkl"):
        return load_network_snapshot(path)
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
