"""Recount every published TF/step row as MODEL FLOPs (VERDICT r4 #2).

Round 4's --mfu columns were counted from TPU traces where the flash
attention kernels' matmuls were invisible to the jaxpr counter (pallas
blocks counted without the grid multiplier) while the HeadProj 128-lane
emit padding inflated the visible projection dots — the headline read
6.47 TF/step where the model count is 6.825. This script re-derives the
TF/step column for every family + the high-res rows with
utils.flops.count_model_flops (trace-only: COUNT_ONLY skips execution),
so the docs table can be corrected without re-running the benches.

Usage: python scripts/recount_model_flops.py [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/recount_model_flops.jsonl")
    ap.add_argument("--families", default=None, help="comma list; default all")
    args = ap.parse_args()

    import bench_families
    from perceptor_tpu.utils.flops import count_model_flops

    bench_families.COUNT_ONLY = True
    bench_families.MFU = True

    fams = (
        args.families.split(",") if args.families else list(bench_families.FAMILIES)
    )
    out = open(args.out, "a")
    for fam in fams:
        t0 = time.time()
        try:
            result = bench_families.BENCHES[fam](False)
            row = {
                "family": fam,
                "model_tflops_per_step": result["counted_tflops_per_step"],
                "trace_s": round(time.time() - t0, 1),
            }
        except Exception as e:  # keep sweeping; record the failure
            row = {"family": fam, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(row), flush=True)
        out.write(json.dumps(row) + "\n")
        out.flush()

    # high-res guided rows (docs/PERFORMANCE.md "High-resolution
    # single-chip guided steps")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ab_highres

    for size in (512, 768, 1024):
        t0 = time.time()
        try:
            scan, params, latents, context = ab_highres.build(size)
            total = count_model_flops(
                lambda: scan(*params, latents, context, 1)
            )
            row = {
                "family": f"highres_{size}",
                "model_tflops_per_step": round(total / 1e12, 3),
                "trace_s": round(time.time() - t0, 1),
            }
        except Exception as e:
            row = {"family": f"highres_{size}", "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(row), flush=True)
        out.write(json.dumps(row) + "\n")
        out.flush()
    out.close()


if __name__ == "__main__":
    main()
