#!/bin/bash
# Round-3 TPU measurement ladder, batch 1: the queued round-2 items.
# ONE TPU job at a time (axon quirk). Usage: bash tools/round3_measure.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r3_measure.log}
: > "$LOG"
say() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"; }
run() { local t=$1; shift; say "run: $*"; timeout "$t" "$@" >> "$LOG" 2>&1; say "exit=$?"; }

say "STEP 0: kernel smoke (incl. stage 4: RT_KEYCMP=u Mosaic lowering)"
run 900 python tools/tpu_smoke.py

say "STEP 1: north-star bench baseline at HEAD (includes last-bounce spec)"
run 700 python bench.py

say "STEP 2: RT_KEYCMP=u A/B"
run 700 env RT_KEYCMP=u python bench.py

say "STEP 3: block-rows resweep (both keycmp modes at the winner rows)"
for br in 96 32; do
  run 700 env RT_BLOCK_ROWS=$br python bench.py
  run 700 env RT_KEYCMP=u RT_BLOCK_ROWS=$br python bench.py
done

say "STEP 4: RT_NUM=neg and RT_DENSE_UNROLL=5 probes"
run 700 env RT_NUM=neg python bench.py
run 700 env RT_DENSE_UNROLL=5 python bench.py
run 700 env RT_KEYCMP=u RT_NUM=neg python bench.py

say "DONE — see $LOG"
