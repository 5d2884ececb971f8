#!/bin/bash
# Round-3 measurement queue #7: the final honest bench after the two
# sweep-#6 fixes — pallas_items vmem_limit_bytes (the composite item
# kernel's scoped stack is ~18 MB at the honest KC=56 pools, past
# Mosaic's 16 MB default) and per-camera live lists as the bench
# default (sweep #6: paint 72.3 ms/chunk percam CAP=256 vs 88.6 union
# CAP=416, input build +3.6 ms).  Log: /tmp/tpu_measure7.log
LOG=${LOG:-/tmp/tpu_measure7.log}
cd "$(dirname "$0")/.."
echo "=== tpu_measure7 start $(date)" >> "$LOG"
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
# NOTE: after sweep #7 the shipped bench default is UNION CAP=416
# (percam lost end-to-end); pin the percam run explicitly so rerunning
# this script logs correctly-labeled results
run "bench PERCAM CAP256 honest" DOOMTPU_BENCH_PERCAM=1 DOOMTPU_BENCH_PAINTCAP=256 python bench.py
# union A/B at the same honest pools (the sweep-#6 step that OOMed)
run "bench UNION CAP416 honest" DOOMTPU_BENCH_PERCAM=0 python bench.py
echo "=== done $(date)" >> "$LOG"
