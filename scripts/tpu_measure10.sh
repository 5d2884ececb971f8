#!/bin/bash
# Round-4 sweep #10: block-local item emission A/B (the deferred pass's
# presence/cumsum/one-hot stages were ~13 ms/chunk dense in N=288;
# census says <= 20 live items per (tile, block)).  Runs from a git
# snapshot (sweep #8 lesson).  Queue AFTER sweep #9 drains:
#   setsid nohup scripts/tpu_measure10.sh >/dev/null 2>&1 &
# Results: /tmp/tpu_measure.log
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_measure.log

SNAP=/tmp/sweep10_repo
rm -rf "$SNAP" && mkdir -p "$SNAP"
git archive HEAD | tar -x -C "$SNAP"
cd "$SNAP"
echo "=== tpu_measure10 start $(date) snapshot=$(git -C /root/repo rev-parse --short HEAD)" >> "$LOG"

until timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  echo "relay down, retry in 300s $(date)" >> "$LOG"
  sleep 300
done
echo "relay up $(date)" >> "$LOG"

run() {
  echo "--- $1 $(date)" >> "$LOG"
  shift
  timeout 2400 env "$@" >> "$LOG" 2>&1
}

# 1. deferred stage ladder: dense vs block-local emission
run "deferred cuts KIB=24" KIB=24 python scripts/probe_deferred_cuts.py
run "deferred cuts KIB=0 (dense ref)" KIB=0 python scripts/probe_deferred_cuts.py
# 2. STREAM retry with 128-padded seg packs (sweep-#9 AOT fix)
run "profile_paint STREAM=1 padded" NP=2048 CAP=416 DOOMTPU_PAINT_STREAM=1 python scripts/profile_paint.py
run "skeleton STREAM=1 padded skip15" NP=2048 CAP=416 DOOMTPU_PAINT_STREAM=1 DOOMTPU_PAINT_SKIP=15 python scripts/profile_paint.py
# 2b. paint-work decomposition at bench poses (the seg body is
#     88.8 - 36.4 skeleton = ~52 ms/chunk; attribute walls/planes/emits)
run "paint skip1 (no walls)" NP=2048 CAP=416 DOOMTPU_PAINT_SKIP=1 python scripts/profile_paint.py
run "paint skip2 (no planes)" NP=2048 CAP=416 DOOMTPU_PAINT_SKIP=2 python scripts/profile_paint.py
run "paint skip3 (no paints)" NP=2048 CAP=416 DOOMTPU_PAINT_SKIP=3 python scripts/profile_paint.py
run "paint skip4 (no emits)" NP=2048 CAP=416 DOOMTPU_PAINT_SKIP=4 python scripts/profile_paint.py
run "paint skip7 (body only)" NP=2048 CAP=416 DOOMTPU_PAINT_SKIP=7 python scripts/profile_paint.py
# 3. end-to-end: bench auto-calibrates KIB > 0 by default now
run "bench KIB auto (candidate)" python bench.py
run "bench KIB=0 (dense ref)" DOOMTPU_BENCH_KIB=0 python bench.py
run "bench KIB auto STREAM=1" DOOMTPU_PAINT_STREAM=1 python bench.py
echo "=== tpu_measure10 done $(date)" >> "$LOG"
