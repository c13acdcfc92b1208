"""Per-HLO profile of the DIP SkipNet fwd+VJP (config 2's hot program).

Same trace-parsing approach as profile_bench.py, pointed at the SkipNet
gradient at the bench shape. Behind the round-4 "dip cost split" table
in docs/PERFORMANCE.md.

Usage: python scripts/profile_dip.py [--fp32]
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

import perceptor_tpu.models.deep_image_prior as dip_lib


def main():
    fp16 = "--fp32" not in sys.argv
    model = dip_lib.DeepImagePrior(shape=(64, 256, 256), seed=0, fp16=fp16)
    latents = model.random_latents(jax.random.PRNGKey(0))

    def loss(params, latents):
        return jnp.mean(jnp.square(model.apply_fn(params, latents)))

    grad = jax.jit(jax.grad(loss))
    g = grad(model.params, latents)
    _ = float(jnp.sum(jax.tree.leaves(g)[0].astype(jnp.float32)))

    logdir = tempfile.mkdtemp(prefix="dip_trace_")
    with jax.profiler.trace(logdir):
        g = grad(model.params, latents)
        _ = float(jnp.sum(jax.tree.leaves(g)[0].astype(jnp.float32)))

    paths = glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        print(f"no trace written under {logdir}", file=sys.stderr)
        sys.exit(1)
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)

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
        per_op[name] = per_op.get(name, 0.0) + ev.get("dur", 0.0) / 1e3

    total = sum(per_op.values())
    print(f"device total: {total:.2f} ms over {len(per_op)} distinct ops\n")
    print("top 30 ops:")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {ms:8.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
