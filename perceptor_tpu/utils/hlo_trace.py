"""Parse jax.profiler traces into per-HLO timings.

`jax.profiler.trace` works through the axon remote-TPU tunnel and records
one complete event per executed HLO on the "XLA Ops" lane, with
`hlo_category`, `model_flops`, `bytes_accessed` and the full `long_name`
HLO string (which embeds flax param names — free subsystem attribution).
This module turns that into the tables behind docs/PERFORMANCE.md.

Usage:
    with profiling.trace(logdir):
        run_step()
    ops = load_ops(logdir)
    print_rollup(ops, subsystems={"unet": "unet_params", ...})
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from collections import defaultdict
from dataclasses import dataclass
from typing import Dict, List, Optional


@dataclass
class OpEvent:
    name: str
    duration_ms: float
    category: str
    long_name: str
    model_flops: int
    bytes_accessed: int


def _find_trace(logdir: str) -> Optional[str]:
    paths = glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True
    )
    return max(paths, key=os.path.getmtime) if paths else None


def load_ops(logdir: str) -> List[OpEvent]:
    """All XLA-op events of the most recent trace under `logdir`."""
    path = _find_trace(logdir)
    if path is None:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    with gzip.open(path, "rt") as f:
        trace = json.load(f)

    tids = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tids[(ev["pid"], ev["tid"])] = ev.get("args", {}).get("name", "")

    ops = []
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if tids.get((ev["pid"], ev["tid"])) != "XLA Ops":
            continue
        args = ev.get("args", {}) or {}
        ops.append(
            OpEvent(
                name=ev.get("name", ""),
                duration_ms=ev.get("dur", 0.0) / 1e3,
                category=args.get("hlo_category", "?"),
                long_name=args.get("long_name", ""),
                model_flops=int(args.get("model_flops", 0) or 0),
                bytes_accessed=int(args.get("bytes_accessed", 0) or 0),
            )
        )
    return ops


def rollup(ops: List[OpEvent], subsystems: Optional[Dict[str, str]] = None):
    """-> (total_ms, by_category, by_subsystem) where subsystems maps
    label -> substring matched against the HLO long_name."""
    by_cat = defaultdict(float)
    by_sub = defaultdict(float)
    total = 0.0
    for op in ops:
        total += op.duration_ms
        by_cat[op.category] += op.duration_ms
        label = "other"
        for sub, pat in (subsystems or {}).items():
            if pat in op.long_name or pat in op.name:
                label = sub
                break
        by_sub[label] += op.duration_ms
    return total, dict(by_cat), dict(by_sub)


def print_rollup(
    ops: List[OpEvent],
    subsystems: Optional[Dict[str, str]] = None,
    top: int = 20,
    peak_tflops: float = 197.0,
):
    total, by_cat, by_sub = rollup(ops, subsystems)
    flops = sum(op.model_flops for op in ops)
    print(f"device total: {total:.2f} ms, {flops/1e12:.3f} model TFLOP "
          f"-> {flops/1e9/max(total,1e-9):.1f} TFLOP/s "
          f"({100*flops/1e9/max(total,1e-9)/peak_tflops:.1f}% of "
          f"{peak_tflops:.0f} TF/s peak)")
    print("\nby hlo_category:")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {k:28s} {v:8.2f} ms")
    if subsystems:
        print("\nby subsystem:")
        for k, v in sorted(by_sub.items(), key=lambda kv: -kv[1]):
            print(f"  {k:28s} {v:8.2f} ms")
    print(f"\ntop {top} ops (ms, TFLOP/s, GB/s):")
    for op in sorted(ops, key=lambda o: -o.duration_ms)[:top]:
        tfs = op.model_flops / op.duration_ms / 1e9 if op.duration_ms else 0
        gbs = op.bytes_accessed / op.duration_ms / 1e6 if op.duration_ms else 0
        print(f"  {op.duration_ms:8.3f}  {tfs:7.1f}  {gbs:7.1f}  "
              f"{op.name[:40]:40s} {op.long_name[:90]}")
