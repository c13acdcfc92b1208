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


def _strip_keys(state: Any) -> Any:
    """PRNG key arrays -> raw uint32 key data (serializable)."""
    return jax.tree.map(
        lambda leaf: jax.random.key_data(leaf)
        if hasattr(leaf, "dtype")
        and jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.prng_key)
        else leaf,
        state,
    )


def _key_mask(like: Any) -> Any:
    return jax.tree.map(
        lambda leaf: hasattr(leaf, "dtype")
        and jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.prng_key),
        like,
    )


def save_session(path: str, state: Any) -> str:
    """Persist a session pytree (e.g. {"params", "opt_state", "key", "step"}).

    Returns the path written. PRNG keys are stored as raw uint32 key data.
    """
    path = os.path.abspath(path)
    state = _strip_keys(state)
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
    is_key = _key_mask(like)
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


class SessionManager:
    """Periodic, async, preemption-aware session checkpointing.

    Production companion to `save_session`/`load_session`: wraps orbax's
    `CheckpointManager` so long guided-generation or finetuning runs
    survive TPU preemption (spot/defragmentation events) and host
    restarts. TPU-native behaviors it adds over the plain functions:

    - **interval policy**: `save(step, state)` is a no-op except every
      `save_interval_steps` (plus `force=True`), so the call can sit
      unconditionally in the host loop;
    - **preemption safety**: on a multislice/preemptible deployment, JAX's
      preemption sync signal makes `save` fire immediately regardless of
      the interval (orbax `reached_preemption`), checkpointing the session
      before the VM disappears;
    - **async saves**: the gather/serialize happens on a background thread
      (orbax async checkpointing); the device loop keeps running. `wait()`
      or `close()` joins outstanding writes;
    - **retention**: keeps the newest `max_to_keep` steps.

    Falls back to synchronous msgpack files (one per step, same retention)
    when orbax is unavailable. PRNG keys round-trip like `save_session`.
    """

    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        save_interval_steps: int = 1,
        async_save: bool = True,
    ):
        self.directory = os.path.abspath(directory)
        self._interval = max(1, int(save_interval_steps))
        self._max_to_keep = max_to_keep
        ocp = _orbax()
        self._ocp = ocp
        self._manager = None
        if ocp is not None:
            options = ocp.CheckpointManagerOptions(
                save_interval_steps=self._interval,
                max_to_keep=max_to_keep,
                create=True,
                enable_async_checkpointing=bool(async_save),
            )
            self._manager = ocp.CheckpointManager(self.directory, options=options)
        else:
            os.makedirs(self.directory, exist_ok=True)

    # -- fallback helpers ------------------------------------------------
    def _fallback_steps(self):
        steps = []
        for name in os.listdir(self.directory):
            if name.startswith("step_") and name.endswith(".msgpack"):
                try:
                    steps.append(int(name[5:-8]))
                except ValueError:
                    pass
        return sorted(steps)

    # -- API ---------------------------------------------------------------
    def reached_preemption(self, step: int) -> bool:
        """True when the runtime signalled an impending preemption."""
        if self._manager is not None:
            return bool(self._manager.reached_preemption(step))
        return False

    def should_save(self, step: int) -> bool:
        if self._manager is not None:
            return bool(self._manager.should_save(step))
        steps = self._fallback_steps()
        last = steps[-1] if steps else None
        return last is None or step >= last + self._interval

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        """Checkpoint `state` at `step` if the policy says so; returns
        whether a save was actually issued."""
        state = _strip_keys(state)
        if self._manager is not None:
            if int(step) in (self._manager.all_steps() or ()):
                # idempotent: resuming exactly at a checkpointed step must
                # not raise (orbax refuses to overwrite an existing step)
                return False
            saved = self._manager.save(
                int(step), args=self._ocp.args.StandardSave(state), force=force
            )
            if self.reached_preemption(int(step)):
                # flush before the VM goes away
                self._manager.wait_until_finished()
            return bool(saved)
        if not force and not self.should_save(step):
            return False
        from flax import serialization

        path = os.path.join(self.directory, f"step_{int(step)}.msgpack")
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(state))
        if self._max_to_keep is not None:
            for old in self._fallback_steps()[: -self._max_to_keep]:
                os.remove(os.path.join(self.directory, f"step_{old}.msgpack"))
        return True

    def latest_step(self):
        if self._manager is not None:
            return self._manager.latest_step()
        steps = self._fallback_steps()
        return steps[-1] if steps else None

    def restore(self, step: int, like: Any) -> Any:
        is_key = _key_mask(like)
        template = _strip_keys(like)
        if self._manager is not None:
            restored = self._manager.restore(
                int(step), args=self._ocp.args.StandardRestore(template)
            )
        else:
            from flax import serialization

            path = os.path.join(self.directory, f"step_{int(step)}.msgpack")
            with open(path, "rb") as f:
                restored = serialization.from_bytes(template, f.read())
        return jax.tree.map(
            lambda leaf, k: jax.random.wrap_key_data(leaf) if k else leaf,
            restored,
            is_key,
        )

    def restore_latest(self, like: Any):
        """(step, state) for the newest checkpoint, or None if empty."""
        step = self.latest_step()
        if step is None:
            return None
        return int(step), self.restore(step, like)

    def wait(self) -> None:
        if self._manager is not None:
            self._manager.wait_until_finished()

    def close(self) -> None:
        if self._manager is not None:
            self._manager.wait_until_finished()
            self._manager.close()

    def __enter__(self) -> "SessionManager":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
