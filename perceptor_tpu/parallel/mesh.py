"""Device mesh construction over ICI/DCN.

TPU-native replacement for the reference's absent distributed init
(SURVEY §2.8): `jax.make_mesh` lays logical axes onto the physical
torus so that the fastest-varying axis ("tensor", then "context") rides
ICI links while "data" can span DCN across slices.

Multi-slice / multi-host: `initialize_distributed()` brings up the JAX
distributed runtime (the TPU-native equivalent of the reference's absent
NCCL/MPI init), `create_hybrid_mesh()` builds a mesh whose "data" axis
spans DCN granules (slices or hosts) outermost while the inner axes stay
within a granule on ICI, and `global_batch_from_local()` assembles the
global data-parallel batch from per-process shards.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import numpy as np
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


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Bring up the JAX distributed runtime (multi-host / multi-slice).

    The TPU-native replacement for NCCL/MPI process-group init: on TPU
    pods `jax.distributed.initialize()` auto-detects the coordinator and
    process topology from the TPU metadata, so all arguments are
    optional; on CPU/GPU clusters pass them explicitly. Idempotent —
    a second call is a no-op (the reference has no equivalent; SURVEY
    §2.8 calls for this as a new first-class component).

    Must run before any other JAX call in the process (backend init
    freezes the device topology).
    """
    state = getattr(jax.distributed, "global_state", None)
    if state is not None and getattr(state, "coordinator_address", None):
        return  # already initialized
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def _granule_id(device) -> int:
    """DCN granule of a device: the TPU slice when the runtime reports
    one (multi-slice), else the host process (multi-host single-slice)."""
    slice_index = getattr(device, "slice_index", None)
    if slice_index is not None:
        return int(slice_index)
    return int(device.process_index)


def group_by_granule(
    devices: Sequence[jax.Device],
    granule_key: Optional[Callable] = None,
):
    """Group devices into equal-size DCN granules (sorted by granule id).

    Devices within one granule share fast ICI; traffic between granules
    crosses DCN. Raises if granules are unequal (a partial slice cannot
    form a rectangular mesh).
    """
    key = granule_key or _granule_id
    groups: dict = {}
    for d in devices:
        groups.setdefault(key(d), []).append(d)
    granules = [groups[k] for k in sorted(groups)]
    if len({len(g) for g in granules}) != 1:
        raise ValueError(
            f"unequal DCN granules: {[len(g) for g in granules]} devices"
        )
    return granules


def create_hybrid_mesh(
    data_dcn: int = -1,
    data: int = 1,
    tensor: int = 1,
    context: int = 1,
    stage: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_order: Tuple[str, ...] = _DEFAULT_ORDER,
    granule_key: Optional[Callable] = None,
) -> Mesh:
    """Mesh whose "data" axis spans DCN granules outermost.

    The returned mesh has the SAME axis names as `create_mesh` — "data"
    has size `data_dcn * data` with the DCN granule dimension
    slowest-varying, so pure data-parallel collectives (the psum of loss
    gradients across replicas) are the only traffic that crosses DCN
    while "tensor"/"context"/"stage" collectives stay on ICI — the
    scaling-book hybrid recipe. `data_dcn=-1` uses every granule;
    `data=-1` absorbs the remaining devices of each granule.

    `granule_key` overrides the granule grouping (testing; custom
    topologies). Single-granule setups degrade to `create_mesh` exactly.
    """
    devices = list(devices) if devices is not None else list(jax.devices())
    granules = group_by_granule(devices, granule_key)
    if data_dcn == -1:
        data_dcn = len(granules)
    if data_dcn != len(granules):
        raise ValueError(
            f"data_dcn={data_dcn} != {len(granules)} DCN granules; pass the "
            f"devices of exactly the granules you want"
        )
    per_granule = len(granules[0])
    inner_fixed = tensor * context * stage
    if data == -1:
        if per_granule % inner_fixed:
            raise ValueError(
                f"{per_granule} devices/granule not divisible by "
                f"tensor*context*stage={inner_fixed}"
            )
        data = per_granule // inner_fixed
    if data * inner_fixed != per_granule:
        raise ValueError(
            f"inner mesh size {data * inner_fixed} != granule size {per_granule}"
        )

    sizes = {
        AXIS_DATA: data,
        AXIS_TENSOR: tensor,
        AXIS_CONTEXT: context,
        AXIS_STAGE: stage,
    }
    inner_shape = tuple(sizes[a] for a in axis_order)
    # good ICI placement within each granule (mesh_utils walks the torus
    # coordinates on real TPUs; trivial order elsewhere), DCN stacked
    # outermost on the data axis
    from jax.experimental import mesh_utils

    inner = [
        mesh_utils.create_device_mesh(
            inner_shape, devices=np.asarray(g, dtype=object)
        )
        for g in granules
    ]
    stacked = np.stack(inner, axis=0)  # (dcn, *inner_shape)
    data_pos = axis_order.index(AXIS_DATA)
    # move the dcn dim next to (outside of) the inner data dim, then merge
    stacked = np.moveaxis(stacked, 0, data_pos)
    shape = list(inner_shape)
    shape[data_pos] = data_dcn * data
    device_array = stacked.reshape(shape)
    axis_types = (jax.sharding.AxisType.Auto,) * len(axis_order)
    return Mesh(device_array, axis_order, axis_types=axis_types)


def global_batch_from_local(local_batch, mesh: Mesh, axis: str = AXIS_DATA):
    """Assemble the global data-parallel batch from per-process arrays.

    Each process passes its local shard (leading dim = global_batch /
    num_processes); the result is a global jax.Array sharded over `axis`
    — the multi-host input pipeline idiom
    (`jax.make_array_from_process_local_data`). Works unchanged (and is
    equivalent to `shard_batch`) in a single process.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def place(leaf):
        leaf = np.asarray(leaf)
        spec = P(axis, *([None] * (leaf.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), leaf
        )

    return jax.tree.map(place, local_batch)
