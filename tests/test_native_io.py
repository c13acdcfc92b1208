"""Native C++ tensor IO tests (builds with g++ at test time)."""

import numpy as np
import pytest

from perceptor_tpu.utils import native_io


def _write_safetensors(path, tensors):
    import json
    import struct

    header = {}
    payload = b""
    for name, arr in tensors.items():
        dtype = {"float32": "F32", "int32": "I32"}[str(arr.dtype)]
        data = arr.tobytes()
        header[name] = {
            "dtype": dtype,
            "shape": list(arr.shape),
            "data_offsets": [len(payload), len(payload) + len(data)],
        }
        payload += data
    blob = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(blob)))
        f.write(blob)
        f.write(payload)


def test_native_build_and_read(tmp_path):
    assert native_io.native_available(), "g++ build of tensor_io.cpp failed"
    path = tmp_path / "blob.bin"
    data = np.arange(1_000_00, dtype=np.uint8)
    path.write_bytes(data.tobytes())
    out = native_io.read_span(str(path), 17, 4096, n_threads=4)
    np.testing.assert_array_equal(out, data[17:17 + 4096])


def test_load_safetensors_roundtrip(tmp_path):
    path = str(tmp_path / "weights.safetensors")
    tensors = {
        "w": np.random.default_rng(0).normal(size=(64, 32)).astype(np.float32),
        "idx": np.arange(128, dtype=np.int32).reshape(8, 16),
    }
    _write_safetensors(path, tensors)
    loaded = native_io.load_safetensors(path)
    np.testing.assert_allclose(loaded["w"], tensors["w"])
    np.testing.assert_array_equal(loaded["idx"], tensors["idx"])


def test_checkpoints_uses_native_path(tmp_path):
    from perceptor_tpu.utils.checkpoints import load_state_dict

    path = str(tmp_path / "weights.safetensors")
    tensors = {"a": np.ones((4, 4), dtype=np.float32)}
    _write_safetensors(path, tensors)
    state = load_state_dict(path)
    np.testing.assert_allclose(state["a"], tensors["a"])
