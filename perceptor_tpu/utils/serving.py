"""Portable serving artifacts via ``jax.export`` (StableHLO).

The reference has no deployment story beyond "run the Python library"
(its samplers are host-side generator loops, reference
stable_diffusion.py:384-491). On TPU the natural serving unit is the
fully-fused sampling program itself: trace it ONCE — on any host, for
any target platform — serialize the StableHLO, and load it in the
serving process with zero Python retracing (tracing the 50-step scan is
a large share of cold-start, docs/PERFORMANCE.md "Compile times").

``jax.export`` gives three properties the persistent compilation cache
cannot:

- **portability**: the artifact is a versioned StableHLO module, loadable
  by any later jax/XLA (or a C++ PJRT host) — not a machine-keyed cache
  entry;
- **cross-platform build**: ``platforms=("tpu",)`` lowers FOR TPU from a
  CPU-only builder host (probed: works in this environment);
- **a stable call signature**: the flattened array inputs are recorded in
  the artifact, so the serving side needs no model code to know what to
  feed (``input_specs``).

Weights are NOT baked into the artifact — they stay a pytree argument
(ship them via utils/session.py's orbax checkpoints or safetensors), so
one program serves any finetune of the same architecture.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Sequence

import jax
from jax import export as _jax_export

_SUFFIX = ".jaxexport"


def export_program(fn, *example_args, platforms: Optional[Sequence[str]] = None):
    """Trace + lower ``fn`` at ``example_args`` and return the
    ``jax.export.Exported`` (call ``.serialize()`` for bytes).

    ``fn`` may be a plain callable or already ``jax.jit``-wrapped.
    ``platforms=None`` lowers for the current default platform;
    pass e.g. ``("tpu",)`` or ``("cpu", "tpu")`` for cross-platform
    artifacts built on a CPU host.
    """
    jitted = fn if isinstance(fn, jax.stages.Wrapped) else jax.jit(fn)
    kwargs = {} if platforms is None else {"platforms": tuple(platforms)}
    return _jax_export.export(jitted, **kwargs)(*example_args)


def serialize_program(fn, *example_args, platforms=None) -> bytes:
    """``export_program(...).serialize()`` in one step."""
    return bytes(export_program(fn, *example_args, platforms=platforms).serialize())


def load_program(blob: bytes) -> Callable:
    """Deserialize an artifact into a callable (its ``.call``).

    Custom pytrees appearing in the signature (e.g. stable_diffusion's
    ``Conditioning``) must be registered in the loading process — import
    ``perceptor_tpu`` before calling.
    """
    return _jax_export.deserialize(blob).call


def input_specs(blob: bytes):
    """The flattened avals (shape/dtype specs) the artifact expects."""
    return _jax_export.deserialize(blob).in_avals


def save_programs(directory: str, programs: Dict[str, bytes]) -> None:
    """Write ``{name: artifact_bytes}`` as ``<directory>/<name>.jaxexport``."""
    os.makedirs(directory, exist_ok=True)
    for name, blob in programs.items():
        with open(os.path.join(directory, name + _SUFFIX), "wb") as f:
            f.write(blob)


def load_programs(directory: str) -> Dict[str, bytes]:
    """Read every ``*.jaxexport`` in ``directory`` back to bytes."""
    out = {}
    for entry in sorted(os.listdir(directory)):
        if entry.endswith(_SUFFIX):
            with open(os.path.join(directory, entry), "rb") as f:
                out[entry[: -len(_SUFFIX)]] = f.read()
    return out
