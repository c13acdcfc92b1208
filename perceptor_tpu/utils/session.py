"""Session checkpoint/resume: drawer params + optimizer state + PRNG key.

The reference has no training checkpoints at all — an interrupted guided
generation simply re-runs (SURVEY §5: "State that must survive in the
rebuild: drawer parameters + optimizer state + PRNG key"). Here that
state is one pytree saved through orbax (the TPU-native checkpointer:
sharded arrays are gathered/restored per their shardings) with a
flax.serialization msgpack fallback for environments without orbax.

The restore target supplies the pytree structure (functional JAX has no
module to hang state on), so `load_session(path, like=state)` mirrors
`flax.serialization.from_bytes`.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def _orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except Exception:
        return None


def save_session(path: str, state: Any) -> str:
    """Persist a session pytree (e.g. {"params", "opt_state", "key", "step"}).

    Returns the path written. PRNG keys are stored as raw uint32 key data.
    """
    path = os.path.abspath(path)
    state = jax.tree.map(
        lambda leaf: jax.random.key_data(leaf)
        if hasattr(leaf, "dtype") and jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.prng_key)
        else leaf,
        state,
    )
    ocp = _orbax()
    if ocp is not None:
        checkpointer = ocp.StandardCheckpointer()
        checkpointer.save(path, state, force=True)
        checkpointer.wait_until_finished()
        return path
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    return path


def load_session(path: str, like: Any) -> Any:
    """Restore a session pytree saved by save_session.

    `like` is a pytree with the target structure (typically a freshly
    initialized session state); leaves that are PRNG keys in `like` are
    re-wrapped from the stored raw key data.
    """
    path = os.path.abspath(path)
    is_key = jax.tree.map(
        lambda leaf: hasattr(leaf, "dtype")
        and jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.prng_key),
        like,
    )
    template = jax.tree.map(
        lambda leaf, k: jax.random.key_data(leaf) if k else leaf, like, is_key
    )
    ocp = _orbax()
    if ocp is not None and os.path.isdir(path):
        checkpointer = ocp.StandardCheckpointer()
        restored = checkpointer.restore(path, template)
    else:
        from flax import serialization

        with open(path, "rb") as f:
            restored = serialization.from_bytes(template, f.read())
    return jax.tree.map(
        lambda leaf, k: jax.random.wrap_key_data(leaf) if k else leaf,
        restored,
        is_key,
    )
