"""Trace-time shape assertions.

The reference uses lantern `Tensor.dims("NCHW")` runtime annotations
(e.g. reference perceptor/models/stable_diffusion/stable_diffusion.py:177).
Under jit, shapes are static at trace time, so the checks are free.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

Dim = Union[int, str, None]


def assert_shape(x, shape: Sequence[Dim], name: str = "array") -> None:
    """Assert x's static shape. `None`/str entries are wildcards/named dims.

    Named (str) dims must agree wherever repeated: assert_shape(x, ("N", 3, "H", "H")).
    """
    if x.ndim != len(shape):
        raise ValueError(
            f"{name}: expected rank {len(shape)} {tuple(shape)}, got shape {x.shape}"
        )
    named: dict = {}
    for i, (actual, expected) in enumerate(zip(x.shape, shape)):
        if expected is None:
            continue
        if isinstance(expected, str):
            if expected in named and named[expected] != actual:
                raise ValueError(
                    f"{name}: dim {i} ({expected})={actual} conflicts with "
                    f"earlier {expected}={named[expected]}; full shape {x.shape}"
                )
            named[expected] = actual
        elif actual != expected:
            raise ValueError(
                f"{name}: expected shape {tuple(shape)}, got {x.shape} (dim {i})"
            )


def assert_dims(x, ndim: int, name: str = "array") -> None:
    if x.ndim != ndim:
        raise ValueError(f"{name}: expected {ndim} dims, got shape {x.shape}")
