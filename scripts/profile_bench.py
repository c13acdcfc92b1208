"""Per-HLO profile of the fused guided step (the bench.py program).

Runs the single guided step under `jax.profiler.trace` (works through the
axon tunnel — docs/PERFORMANCE.md), then parses the trace_viewer JSON and
prints the top ops by device time plus a category rollup (convs, reduces,
flash attention, copies). This is the tool behind the "Where the N ms
goes" tables in docs/PERFORMANCE.md.

Usage: python scripts/profile_bench.py [--quick]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

if "--quick" in sys.argv:
    os.environ["BENCH_QUICK"] = "1"

import bench


def main():
    step, scan, params, latents, context = bench.build()
    unet_params, vae_params, clip_params = params

    # warm up / compile outside the trace
    out, _ = step(unet_params, vae_params, clip_params, latents, context)
    _ = float(jnp.sum(out))

    logdir = tempfile.mkdtemp(prefix="bench_trace_")
    with jax.profiler.trace(logdir):
        out, _ = step(unet_params, vae_params, clip_params, latents, context)
        _ = float(jnp.sum(out))

    paths = glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        print(f"no trace written under {logdir}", file=sys.stderr)
        sys.exit(1)
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)

    # device-lane complete events only (TensorFlow-op lanes duplicate them)
    device_pids = set()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "/device:" in name or "XLA" in name:
                device_pids.add(ev["pid"])

    tid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev["tid"])] = ev.get("args", {}).get("name", "")

    per_op = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        lane = tid_names.get((ev["pid"], ev["tid"]), "")
        if "Steps" in lane or "Framework" in lane:
            continue
        name = ev.get("name", "")
        per_op[name] = per_op.get(name, 0.0) + ev.get("dur", 0.0) / 1e3  # ms

    total = sum(per_op.values())
    print(f"device total: {total:.2f} ms over {len(per_op)} distinct ops\n")

    cats = {
        "conv": r"conv",
        "reduce/norm": r"reduce|norm",
        "flash attention": r"flash|attn_kernel|pallas",
        "copy/transpose": r"copy|transpose|bitcast",
        "dot/matmul": r"dot|einsum|matmul|gemm",
        "dynamic-update/scatter": r"scatter|dynamic",
    }
    rolled = {k: 0.0 for k in cats}
    other = 0.0
    for name, ms in per_op.items():
        for cat, pat in cats.items():
            if re.search(pat, name, re.I):
                rolled[cat] += ms
                break
        else:
            other += ms
    print("category rollup (first matching category wins):")
    for cat, ms in sorted(rolled.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:24s} {ms:8.2f} ms")
    print(f"  {'other':24s} {other:8.2f} ms\n")

    print("top 30 ops:")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {ms:8.3f} ms  {name[:110]}")
    print(f"\ntrace: {paths[0]}")


if __name__ == "__main__":
    main()
