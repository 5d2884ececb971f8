#!/bin/bash
# Round-3 measurement queue #5: the paint kernel at BENCH (spread)
# poses, which sweep #4 exposed as the real wall (104 ms/chunk vs the
# clustered 65): input-build attribution at CAP=416, spread-pose
# skeleton, TB=4 tile A/B, and the deferred-pass stage cuts.
# Log: /tmp/tpu_measure5.log
LOG=${LOG:-/tmp/tpu_measure5.log}
cd "$(dirname "$0")/.."
echo "=== tpu_measure5 start $(date)" >> "$LOG"
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
run "NP2048 CAP416 INPUTONLY=3 (camera)"  NP=2048 CAP=416 DOOMTPU_PAINT_INPUTONLY=3 python scripts/profile_paint.py
run "NP2048 CAP416 INPUTONLY=2 (+meta)"   NP=2048 CAP=416 DOOMTPU_PAINT_INPUTONLY=2 python scripts/profile_paint.py
run "NP2048 CAP416 INPUTONLY=1 (+gather)" NP=2048 CAP=416 DOOMTPU_PAINT_INPUTONLY=1 python scripts/profile_paint.py
run "NP2048 CAP416 skip15 (skeleton)"     NP=2048 CAP=416 DOOMTPU_PAINT_SKIP=15 python scripts/profile_paint.py
run "NP2048 CAP416 default"               NP=2048 CAP=416 python scripts/profile_paint.py
run "NP2048 CAP416 TB=4"                  NP=2048 CAP=416 DOOMTPU_PAINT_TB=4 python scripts/profile_paint.py
run "NP2048 CAP416 TB=4 skip15"           NP=2048 CAP=416 DOOMTPU_PAINT_TB=4 DOOMTPU_PAINT_SKIP=15 python scripts/profile_paint.py
run "deferred cuts NP2048"                NP=2048 python scripts/probe_deferred_cuts.py
run "bench new defaults (CAP416+assert)"  python bench.py
echo "=== done $(date)" >> "$LOG"
