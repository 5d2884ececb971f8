#!/bin/bash
# Round-2 measurement queue #3: PREBOUNDS mode 2 (walls + emit bits
# precomputed, planes keep exact in-kernel bounds), E3 reverted, and
# the decontaminated skeleton / sync-cost decomposition.
# Log: /tmp/tpu_measure3.log
LOG=${LOG:-/tmp/tpu_measure3.log}
cd "$(dirname "$0")/.."
echo "=== tpu_measure3 start $(date)" >> "$LOG"
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
  echo "=== relay never came up; aborting $(date)" >> "$LOG"
  exit 1
fi
run() {
  echo "=== $1 $(date)" >> "$LOG"
  shift
  timeout 2400 env "$@" >> "$LOG" 2>&1
}
run "profile_paint mode2 (new default)"   python scripts/profile_paint.py
run "profile_paint mode0 (baseline)"      DOOMTPU_PAINT_PREBOUNDS=0 python scripts/profile_paint.py
run "skip=7 mode2 (body+plane reds)"      DOOMTPU_PAINT_SKIP=7 python scripts/profile_paint.py
run "skip=7 mode0 (body+all reds)"        DOOMTPU_PAINT_SKIP=7 DOOMTPU_PAINT_PREBOUNDS=0 python scripts/profile_paint.py
run "skip=15 mode0 (true skeleton)"       DOOMTPU_PAINT_SKIP=15 DOOMTPU_PAINT_PREBOUNDS=0 python scripts/profile_paint.py
run "item_decomp NP=2048 (bench chunk)"   NP=2048 python scripts/probe_item_decomp.py
run "bench mode2"                         python bench.py
echo "=== done $(date)" >> "$LOG"
