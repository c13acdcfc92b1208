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
