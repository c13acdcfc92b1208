"""Device mesh construction over ICI/DCN.

TPU-native replacement for the reference's absent distributed init
(SURVEY §2.8): `jax.make_mesh` lays logical axes onto the physical
torus so that the fastest-varying axis ("tensor", then "context") rides
ICI links while "data" can span DCN across slices.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh

AXIS_DATA = "data"
AXIS_TENSOR = "tensor"
AXIS_CONTEXT = "context"
AXIS_STAGE = "stage"

_DEFAULT_ORDER = (AXIS_DATA, AXIS_STAGE, AXIS_CONTEXT, AXIS_TENSOR)


def create_mesh(
    data: int = -1,
    tensor: int = 1,
    context: int = 1,
    stage: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_order: Tuple[str, ...] = _DEFAULT_ORDER,
) -> Mesh:
    """Create a named mesh; `data=-1` absorbs the remaining devices.

    Axis order puts "data" outermost (slowest links OK), "stage" next
    (pipeline neighbors need one link each), and "tensor" innermost
    (needs the fastest ICI), matching the scaling-book recipe.
    """
    devices = list(devices) if devices is not None else list(jax.devices())
    sizes = {
        AXIS_DATA: data,
        AXIS_TENSOR: tensor,
        AXIS_CONTEXT: context,
        AXIS_STAGE: stage,
    }
    fixed = tensor * context * stage
    if data == -1:
        if len(devices) % fixed:
            raise ValueError(
                f"{len(devices)} devices not divisible by "
                f"tensor*context*stage={fixed}"
            )
        sizes[AXIS_DATA] = len(devices) // fixed
    total = sizes[AXIS_DATA] * fixed
    if total != len(devices):
        raise ValueError(f"mesh size {total} != device count {len(devices)}")
    shape = tuple(sizes[a] for a in axis_order)
    # Auto axis types: GSPMD propagates shardings and inserts collectives
    # (jax>=0.9 defaults to Explicit, which demands per-op out_shardings).
    axis_types = (jax.sharding.AxisType.Auto,) * len(axis_order)
    return jax.make_mesh(shape, axis_order, axis_types, devices=devices)
