"""Native (C++) checkpoint IO with a pure-Python fallback.

The safetensors header (JSON) is parsed in Python; the bulk tensor bytes
are read by perceptor_tpu/native/tensor_io.cpp (mmap + MADV_SEQUENTIAL +
multithreaded copy) built lazily with g++ and bound via ctypes — the
TPU-host analogue of the reference's JIT-compiled native plugins
(reference torch_utils/custom_ops.py:59-157, also built at import time
with graceful fallback).
"""

from __future__ import annotations

import ctypes
import json
import os
import struct
import subprocess
from typing import Dict, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SOURCE = os.path.join(_NATIVE_DIR, "tensor_io.cpp")
_LIBRARY = os.path.join(
    os.path.expanduser("~/.cache/perceptor_tpu"), "libtensor_io.so"
)

_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "BF16": np.uint16,  # raw bits; converted by the caller via jnp.bfloat16 view
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
}

_lib = None
_build_failed = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not os.path.exists(_LIBRARY) or (
            os.path.getmtime(_LIBRARY) < os.path.getmtime(_SOURCE)
        ):
            os.makedirs(os.path.dirname(_LIBRARY), exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-o", _LIBRARY,
                 _SOURCE],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIBRARY)
        lib.pt_read_span.argtypes = [
            ctypes.c_char_p, ctypes.c_ulonglong, ctypes.c_ulonglong,
            ctypes.c_void_p, ctypes.c_int,
        ]
        lib.pt_read_span.restype = ctypes.c_int
        lib.pt_file_size.argtypes = [ctypes.c_char_p]
        lib.pt_file_size.restype = ctypes.c_longlong
        _lib = lib
    except Exception:
        _build_failed = True
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_library() is not None


def read_span(path: str, offset: int, nbytes: int, n_threads: int = 8) -> np.ndarray:
    """Read file[offset:offset+nbytes] into a fresh byte buffer."""
    out = np.empty(nbytes, dtype=np.uint8)
    lib = _load_library()
    if lib is not None:
        status = lib.pt_read_span(
            path.encode(), offset, nbytes,
            out.ctypes.data_as(ctypes.c_void_p), n_threads,
        )
        if status == 0:
            return out
    with open(path, "rb") as f:  # pure-python fallback
        f.seek(offset)
        f.readinto(memoryview(out))
    return out


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Parse a safetensors file: header in Python, payload natively."""
    with open(path, "rb") as f:
        (header_len,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(header_len))
    base = 8 + header_len
    out: Dict[str, np.ndarray] = {}
    for name, spec in header.items():
        if name == "__metadata__":
            continue
        begin, end = spec["data_offsets"]
        raw = read_span(path, base + begin, end - begin)
        dtype = _DTYPES[spec["dtype"]]
        array = raw.view(dtype).reshape(spec["shape"])
        if spec["dtype"] == "BF16":
            import jax.numpy as jnp

            array = np.asarray(
                jnp.asarray(array).view(jnp.bfloat16).astype(jnp.float32)
            )
        out[name] = array
    return out
