"""Render the docs/PERFORMANCE.md family table from a measure_r05 outdir.

Usage: python scripts/family_table.py [/tmp/r05_measure]
"""

import glob
import json
import os
import sys


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r05_measure"
    rows = []
    for path in sorted(glob.glob(os.path.join(out, "*.json"))):
        try:
            with open(path) as f:
                r = json.load(f)
        except Exception:
            continue
        env = r.get("env", {})
        rows.append(
            (
                os.path.basename(path).removesuffix(".json"),
                r.get("value"),
                r.get("unit", ""),
                r.get("counted_tflops_per_step", ""),
                r.get("mfu_pct", ""),
                r.get("compile_s", ""),
                env.get("loadavg", ["?"])[0],
                env.get("other_python_procs", "?"),
                env.get("cache", "?"),
            )
        )
    print("| run | value | unit | TF/step | MFU% | compile_s | load | procs | cache |")
    print("|---|---|---|---|---|---|---|---|---|")
    for row in rows:
        print("| " + " | ".join(str(x) for x in row) + " |")


if __name__ == "__main__":
    main()
