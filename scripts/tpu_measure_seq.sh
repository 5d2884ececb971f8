#!/bin/bash
# Wait for the TPU relay to come back, then run the queued measurement
# sweep (PERF.md round-2 "TPU numbers pending").  Log: /tmp/tpu_measure.log
# Run detached:  setsid nohup scripts/tpu_measure_seq.sh >/dev/null 2>&1 &
LOG=${LOG:-/tmp/tpu_measure.log}
cd "$(dirname "$0")/.."
echo "=== tpu_measure_seq start $(date)" >> "$LOG"
UP=
for i in $(seq 1 400); do
  if timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "=== relay up after probe $i $(date)" >> "$LOG"
    UP=1
    break
  fi
  sleep 90
done
if [ -z "$UP" ]; then
  echo "=== relay never came up; aborting sweep $(date)" >> "$LOG"
  exit 1
fi
run() {
  echo "=== $1 $(date)" >> "$LOG"
  shift
  timeout 2400 env "$@" >> "$LOG" 2>&1
}
# phase 1: the stall-elimination pass + path A/B decision data
run "profile_paint merged+plive"        python scripts/profile_paint.py
run "profile_paint MERGEB=0 (A/B)"      DOOMTPU_PAINT_MERGEB=0 python scripts/profile_paint.py
run "profile_paint ITEMS=1"             ITEMS=1 python scripts/profile_paint.py
# phase 2: cost decomposition (outputs intentionally wrong, timing only)
run "skip: no walls (1)"                DOOMTPU_PAINT_SKIP=1 python scripts/profile_paint.py
run "skip: no planes (2)"               DOOMTPU_PAINT_SKIP=2 python scripts/profile_paint.py
run "skip: no paints (3)"               DOOMTPU_PAINT_SKIP=3 python scripts/profile_paint.py
run "skip: no emits (4)"                DOOMTPU_PAINT_SKIP=4 python scripts/profile_paint.py
run "skip: everything (15)"             DOOMTPU_PAINT_SKIP=15 python scripts/profile_paint.py
run "inputonly=1 (full input build)"    DOOMTPU_PAINT_INPUTONLY=1 python scripts/profile_paint.py
run "inputonly=2 (compaction metadata)" DOOMTPU_PAINT_INPUTONLY=2 python scripts/profile_paint.py
run "inputonly=3 (camera stage only)"   DOOMTPU_PAINT_INPUTONLY=3 python scripts/profile_paint.py
# phase 3: knob A/Bs on the merged-fori kernel
run "U=8 GSUB=4 retry"                  DOOMTPU_PAINT_UNROLL=8 DOOMTPU_PAINT_GSUB=4 python scripts/profile_paint.py
run "U=2 GSUB=8"                        DOOMTPU_PAINT_UNROLL=2 DOOMTPU_PAINT_GSUB=8 python scripts/profile_paint.py
run "early-exit on"                     DOOMTPU_PAINT_EXIT=1 python scripts/profile_paint.py
run "segwhen on"                        DOOMTPU_PAINT_SEGWHEN=1 python scripts/profile_paint.py
run "sharedtex OFF (A/B)"               DOOMTPU_PAINT_SHAREDTEX=0 python scripts/profile_paint.py
# TB=16 removed: crashes Mosaic AOT on real TPU (ApplyVectorLayoutPass
# Check failed: limits[i] <= dim(i)); TB=8 is the only supported tile.
# headline numbers
run "bench default"                     python bench.py
run "bench itempaint"                   DOOMTPU_BENCH_ITEMPAINT=1 python bench.py
echo "=== done $(date)" >> "$LOG"
