#!/bin/bash
# Round-2 measurement queue #2: the PREBOUNDS pass (XLA-precomputed
# paint bounds + emit bits replacing every in-kernel vector->scalar
# reduction) + batched svf window loads.  Waits for the relay like
# tpu_measure_seq.sh.  Log: /tmp/tpu_measure2.log
# Run detached:  setsid nohup scripts/tpu_measure2.sh >/dev/null 2>&1 &
LOG=${LOG:-/tmp/tpu_measure2.log}
cd "$(dirname "$0")/.."
echo "=== tpu_measure2 start $(date)" >> "$LOG"
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
run "profile_paint PREBOUNDS (new default)"  python scripts/profile_paint.py
run "profile_paint PREBOUNDS=0 (old)"        DOOMTPU_PAINT_PREBOUNDS=0 python scripts/profile_paint.py
run "skip: everything (15), prebounds"       DOOMTPU_PAINT_SKIP=15 python scripts/profile_paint.py
run "inputonly=1 (input build w/ bounds)"    DOOMTPU_PAINT_INPUTONLY=1 python scripts/profile_paint.py
run "bench default"                          python bench.py
echo "=== done $(date)" >> "$LOG"
