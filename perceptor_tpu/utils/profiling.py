"""Runtime observability: profiler traces + per-step timing.

The reference's only runtime observability is tqdm progress bars and
print statements (SURVEY §5). The TPU-native equivalents here:

  - `trace(logdir)`: context manager around `jax.profiler.trace` — the
    resulting trace opens in xprof/TensorBoard and shows per-HLO timing,
    HBM traffic, and MXU utilization for everything inside.
  - `annotate(name)`: `jax.profiler.TraceAnnotation` wrapper so loop
    phases (synthesize / loss / step) are labeled inside the trace.
  - `StepTimer`: wall-clock per-step stats with an honest device sync
    (block_until_ready on a probe array) — the number the headline
    bench reports, available to user loops.
  - `memory_stats()` / `live_array_bytes()`: HBM occupancy — peak and
    current bytes from the device allocator plus bytes held by live
    jax.Arrays, for sizing batch/resolution against the 16 GB v5e HBM.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace of the enclosed block into `logdir`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a region inside a profiler trace (usable as ctx manager)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates per-step wall times around device work.

    >>> timer = StepTimer()
    >>> for _ in range(n):
    ...     with timer.step() as probe:
    ...         out = jitted_step(...)
    ...         probe(out)   # sync target: timing stops when out is ready
    >>> timer.summary()  # {"steps", "mean_s", "p50_s", "steps_per_sec", ...}
    """

    def __init__(self):
        self.times: List[float] = []

    @contextlib.contextmanager
    def step(self):
        holder: List[Any] = []
        start = time.perf_counter()
        yield holder.append
        if holder:
            jax.block_until_ready(holder[-1])
        self.times.append(time.perf_counter() - start)

    def summary(self, skip_warmup: int = 1) -> dict:
        if not self.times:
            raise ValueError("StepTimer.summary() called before any steps")
        times = np.asarray(self.times[skip_warmup:] or self.times)
        return {
            "steps": int(times.size),
            "mean_s": float(times.mean()),
            "p50_s": float(np.percentile(times, 50)),
            "p90_s": float(np.percentile(times, 90)),
            "steps_per_sec": float(1.0 / times.mean()),
        }


def memory_stats(device: Optional[jax.Device] = None) -> dict:
    """HBM occupancy of `device` (default: first device), in bytes.

    Returns {"bytes_in_use", "peak_bytes_in_use", "bytes_limit", ...} from
    the device allocator, or {} on backends that don't report memory
    stats (the virtual CPU mesh; the axon-tunneled chip). After a step,
    `peak_bytes_in_use` is the number to size batch/resolution against
    the 16 GB v5e HBM.
    """
    device = device or jax.devices()[0]
    stats = device.memory_stats()
    return dict(stats) if stats else {}


def live_array_bytes(device: Optional[jax.Device] = None) -> int:
    """Total bytes of live jax.Arrays (on `device` if given, else all).

    The allocator's `bytes_in_use` minus this is roughly what jit
    executables and temporaries hold — useful for spotting leaked
    compiled-program memos (ADVICE round-1 found one such leak)."""
    total = 0
    for arr in jax.live_arrays():
        try:
            devs = arr.devices()
        except Exception:
            continue
        if device is None:
            total += arr.nbytes
        elif device in devs:
            # per-device share of a (possibly sharded) array
            total += arr.nbytes // max(1, len(devs))
    return total
