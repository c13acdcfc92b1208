"""Audit the 1024px fused guided step for avoidable byte pools.

Compiles the full step (CPU backend — compile only, nothing executes)
and inventories every large buffer in the optimized HLO by dtype: if
the program still moved fp32-width activations anywhere material, they
show up here; if everything activation-sized is bf16, the round-4 "HBM
wall" diagnosis stands with evidence and the byte-reduction lever is
spent (docs/PERFORMANCE.md round-5 study).

Usage: python scripts/audit_1024_buffers.py [size] [min_mb]
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_tests")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

_SHAPE_RE = re.compile(r"\b(f32|bf16|f16|s32|u32|s8|u8|pred)\[([0-9,]+)\]")
_WIDTH = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
          "u8": 1, "pred": 1}


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    min_mb = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0

    import ab_highres

    scan, params, latents, context = ab_highres.build(size)
    import jax as _j

    txt = (
        _j.jit(lambda *a: scan(*a, 1))
        .lower(*params, latents, context)
        .compile()
        .as_text()
    )
    # every instruction's OUTPUT shape = a buffer the program materializes
    # (fused ops don't appear; what remains is real traffic)
    pool = defaultdict(lambda: [0, 0])  # dtype -> [count, bytes]
    big = defaultdict(int)  # (dtype, shape) -> count
    for line in txt.splitlines():
        line = line.strip()
        if "=" not in line or line.startswith("ROOT"):
            line = line.removeprefix("ROOT ").strip()
        m = _SHAPE_RE.search(line.split("=", 1)[0])
        if not m:
            continue
        dtype, dims = m.group(1), m.group(2)
        n = 1
        for d in dims.split(","):
            n *= int(d)
        b = n * _WIDTH[dtype]
        pool[dtype][0] += 1
        pool[dtype][1] += b
        if b >= min_mb * 2**20:
            big[(dtype, f"[{dims}]")] += 1

    print(f"== {size}px fused guided step: materialized-buffer inventory")
    for dtype, (count, total) in sorted(
        pool.items(), key=lambda kv: -kv[1][1]
    ):
        print(f"  {dtype:5s} {count:6d} buffers, {total / 2**30:7.2f} GiB total")
    print(f"== buffers >= {min_mb} MB")
    for (dtype, shape), count in sorted(
        big.items(), key=lambda kv: -kv[1]
    ):
        print(f"  {count:4d} x {dtype}{shape}")


if __name__ == "__main__":
    main()
