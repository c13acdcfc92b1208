#!/bin/bash
# Round-4 perf measurement batch: MFU columns for every published number
# (VERDICT r3 next #1) + the 1024px studies (#1/#3). Run serially on a
# quiet VM; each step appends JSON/lines to /tmp/r04_measure.log.
set -x
cd /root/repo
LOG=/tmp/r04_measure.log
: > $LOG

for fam in velocity adm ldm monster raw dip velocity-guided ensemble; do
  echo "=== family $fam ===" >> $LOG
  python bench.py --family "$fam" --mfu >> $LOG 2>&1
done

echo "=== highres ===" >> $LOG
python scripts/ab_highres.py 512 768 1024 >> $LOG 2>&1

echo "=== flash 16k sweep ===" >> $LOG
python scripts/ab_flash_16k.py >> $LOG 2>&1

echo "=== scan blocks ===" >> $LOG
python scripts/ab_scan_blocks.py >> $LOG 2>&1

echo "=== headline ===" >> $LOG
python bench.py >> $LOG 2>&1
echo "=== done ===" >> $LOG
