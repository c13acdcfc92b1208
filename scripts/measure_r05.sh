#!/bin/bash
# Round-5 quiet-host measurement session (VERDICT r4 #3/#6/#7/#9).
# Serialized: ONE process at a time on the 1-core host; every JSON now
# carries its env block (loadavg, contending procs, cache hit/miss).
# Usage: bash scripts/measure_r05.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r05_measure}
mkdir -p "$OUT"

note() { echo "[measure_r05 $(date +%H:%M:%S)] $*"; }

note "pre-flight: contending processes?"
ps aux | grep -E 'pytest|ici_roofline|recount' | grep -v grep || true

# 1) headline, cold compile (fresh round cache) + model-FLOPs MFU
note "headline bench (cold) ..."
python bench.py --mfu > "$OUT/headline_cold.json" 2> "$OUT/headline_cold.err"

# 2) headline again: persistent-cache-hit compile + steady remeasure
note "headline bench (cache hit) ..."
python bench.py --mfu > "$OUT/headline_hit.json" 2> "$OUT/headline_hit.err"

# 3) per-family quiet compile_s + steady + model-FLOPs MFU (VERDICT #7)
for fam in velocity adm ldm monster raw dip velocity-guided ensemble; do
  note "family $fam ..."
  python bench.py --family "$fam" --mfu \
    > "$OUT/family_$fam.json" 2> "$OUT/family_$fam.err"
done

# 4) the cutout-ensemble workflow (VERDICT #6): x8/x32/x64 in one go
note "family cutouts ..."
python bench.py --family cutouts --mfu \
  > "$OUT/family_cutouts.json" 2> "$OUT/family_cutouts.err"

# 5) batch scaling for the 256px guided configs (VERDICT #9)
for b in 4 8; do
  for fam in velocity-guided ensemble; do
    note "family $fam batch $b ..."
    BENCH_BATCH=$b python bench.py --family "$fam" --mfu \
      > "$OUT/family_${fam}_b$b.json" 2> "$OUT/family_${fam}_b$b.err"
  done
done

note "done; results in $OUT"
for f in "$OUT"/*.json; do echo "== $f"; cat "$f"; done
