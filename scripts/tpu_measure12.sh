#!/bin/bash
# Round-4 sweep #12: deferred plane records (DOOMTPU_PAINT_PDEFER) A/B
# on the new percam-default tree.  The footprint census (PERF.md) says
# the plane stage's tile-union y-loops process ~31x the painted px;
# PDEFER makes them store-only and resolves per final pixel in _finish
# (bit-exact, test_paint_planes_defer_bit_exact).  Stage-vs-pipeline
# lesson applies: the bench number decides, not the stage probe.
# Runs from a git snapshot; waits for sweep #11 to drain first.
#   setsid nohup scripts/tpu_measure12.sh >/dev/null 2>&1 &
# Results: /tmp/tpu_measure.log
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_measure.log

for i in $(seq 1 180); do
  grep -q "tpu_measure11 done" "$LOG" && break
  sleep 60
done

SNAP=/tmp/sweep12_repo
rm -rf "$SNAP" && mkdir -p "$SNAP"
git archive HEAD | tar -x -C "$SNAP"
cd "$SNAP"
echo "=== tpu_measure12 start $(date) snapshot=$(git -C /root/repo rev-parse --short HEAD)" >> "$LOG"

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

# 1. the exact configuration the driver's BENCH_r04 run will execute
#    (percam default): must reproduce sweep #11's 2205.9
run "bench default (percam default tree)" python bench.py
# 2. deferred plane records A/B, same tree
run "bench PDEFER=1" DOOMTPU_PAINT_PDEFER=1 python bench.py
# 3. stage-scoped: paint call only, percam CAP=256 shapes
run "profile_paint PDEFER=1 percam CAP=256" NP=2048 CAP=256 \
  DOOMTPU_PAINT_PERCAM=1 DOOMTPU_PAINT_PDEFER=1 python scripts/profile_paint.py
echo "=== tpu_measure12 done $(date)" >> "$LOG"
