#!/bin/bash
# Round-2 measurement queue #4: skeleton attribution (svf dynamic load,
# plive SMEM read, dead grid steps) + the paint_live_capacity win, at
# both clustered (legacy) and bench-chunk (NP=2048) poses.
# Log: /tmp/tpu_measure4.log
LOG=${LOG:-/tmp/tpu_measure4.log}
cd "$(dirname "$0")/.."
echo "=== tpu_measure4 start $(date)" >> "$LOG"
UP=
for i in $(seq 1 400); do
  if timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "=== relay up after probe $i $(date)" >> "$LOG"
    UP=1
    break
  fi
  sleep 90
done
[ -z "$UP" ] && { echo "=== relay never up $(date)" >> "$LOG"; exit 1; }
run() {
  echo "=== $1 $(date)" >> "$LOG"
  shift
  timeout 2400 env "$@" >> "$LOG" 2>&1
}
run "default (revert sanity)"        python scripts/profile_paint.py
run "skip15 (skeleton)"              DOOMTPU_PAINT_SKIP=15 python scripts/profile_paint.py
run "skip15 STATLOAD (svf attrib)"   DOOMTPU_PAINT_SKIP=15 DOOMTPU_PAINT_STATLOAD=1 python scripts/profile_paint.py
run "skip31 (no plive read)"         DOOMTPU_PAINT_SKIP=31 python scripts/profile_paint.py
run "skip15 CAP=416 (dead steps)"    DOOMTPU_PAINT_SKIP=15 CAP=416 python scripts/profile_paint.py
run "default CAP=416"                CAP=416 python scripts/profile_paint.py
run "NP=2048 default (bench chunk)"  NP=2048 python scripts/profile_paint.py
run "NP=2048 CAP=416"                NP=2048 CAP=416 python scripts/profile_paint.py
run "bench default (restore check)"  python bench.py
run "bench PAINTCAP=416"             DOOMTPU_BENCH_PAINTCAP=416 python bench.py
echo "=== done $(date)" >> "$LOG"
