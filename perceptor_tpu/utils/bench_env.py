"""Self-describing benchmark conditions (VERDICT r4 #3).

Round 4's driver-visible headline drifted 5% below the builder's own
quiet-host remeasure, and the emitted JSON recorded nothing that could
classify the regime (host contention? cold compile? tunnel warmup?).
Every bench JSON now carries the conditions it was measured under:

- ``loadavg``: 1/5/15-minute host load at measurement time. The bench
  host has ONE core; loadavg >~0.5 at the 1-min mark means something
  else was contending during the run (measured 2x compile inflation
  from a stale pytest orphan in round 4).
- ``other_python_procs``: concurrent python processes (excluding this
  one and the axon tunnel daemon) — the usual contention source.
- ``cache``: persistent-compile-cache delta across the timed compile —
  ``hit`` (no new cache entries written: the compile was served from
  ``~/.cache/jax_comp``), ``miss`` (new entries appeared: a fresh XLA
  compile ran), or ``off`` (no cache dir configured).
- ``warmup_readback_s``: the measured cost of the first device->host
  fetch — the axon tunnel pays a one-time transfer-path warmup
  (7-90 s observed) that must not be folded into compile or step time.
- ``timestamp``: ISO-8601 UTC, so BENCH_r{N}.json artifacts can be
  correlated with STATUS.md narrative after the fact.
"""

from __future__ import annotations

import datetime
import os
from typing import Optional, Set, Tuple


def _iter_python_procs():
    """(pid, cmdline) for every python process on the host."""
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode(errors="replace")
        except OSError:
            continue
        argv0 = cmd.split(" ", 1)[0]
        if "python" in os.path.basename(argv0):
            yield int(pid), cmd


def other_python_procs() -> int:
    """Concurrent python processes, excluding self and the tunnel daemon."""
    me = os.getpid()
    count = 0
    for pid, cmd in _iter_python_procs():
        if pid == me:
            continue
        if ".tpu_init" in cmd:  # the always-on axon tunnel daemon
            continue
        count += 1
    return count


def cache_snapshot(cache_dir: Optional[str] = None) -> Set[Tuple[str, float]]:
    """(name, mtime) of every persistent-compile-cache entry; empty set
    when the cache dir is unset/absent. Diff two snapshots around a
    compile to classify hit vs miss."""
    if cache_dir is None:
        import jax

        cache_dir = jax.config.jax_compilation_cache_dir
    if not cache_dir:
        return set()
    cache_dir = os.path.expanduser(cache_dir)
    out: Set[Tuple[str, float]] = set()
    try:
        with os.scandir(cache_dir) as entries:
            for entry in entries:
                try:
                    out.add((entry.name, entry.stat().st_mtime))
                except OSError:
                    continue
    except OSError:
        return set()
    return out


def classify_cache(before: Set, after: Set, cache_dir: Optional[str] = None) -> str:
    """"hit" / "miss" / "off" from two `cache_snapshot`s.

    New or rewritten entries mean XLA compiled fresh and persisted the
    result ("miss"); an unchanged dir means the compile was served from
    cache ("hit"). Entries are only written for compiles above the
    configured min-compile-time, so sub-threshold programs read as
    "hit" — fine: their compile cost is too small to distort a bench.
    """
    if cache_dir is None:
        import jax

        cache_dir = jax.config.jax_compilation_cache_dir
    if not cache_dir:
        return "off"
    return "miss" if after - before else "hit"


def bench_env(
    cache_before: Optional[Set] = None,
    cache_after: Optional[Set] = None,
    warmup_readback_s: Optional[float] = None,
) -> dict:
    """The conditions dict embedded in every bench JSON line."""
    try:
        load1, load5, load15 = os.getloadavg()
    except OSError:  # pragma: no cover - getloadavg exists on linux
        load1 = load5 = load15 = -1.0
    env = {
        "timestamp": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "loadavg": [round(load1, 2), round(load5, 2), round(load15, 2)],
        "other_python_procs": other_python_procs(),
    }
    if cache_before is not None and cache_after is not None:
        env["cache"] = classify_cache(cache_before, cache_after)
    if warmup_readback_s is not None:
        env["warmup_readback_s"] = round(warmup_readback_s, 1)
    return env
