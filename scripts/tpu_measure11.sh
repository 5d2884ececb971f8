#!/bin/bash
# Round-4 sweep #11: the percam end-to-end RETRY.  Percam won the paint
# stage by 16.3 ms/chunk (sweep #6) yet lost the sweep-#7 bench 798.7
# vs 1439.0 — ~226 ms/chunk appeared end-to-end that no stage probe
# shows.  Since then: k-outer composite landed (+35%), capacities are
# auto-calibrated (live_cam census), and the percam compaction chain
# now materializes behind lax.optimization_barrier (the CLAUDE.md
# re-fusion suspect).  This sweep re-runs the A/B on today's code.
# Runs from a git snapshot; waits for sweep #10 to drain first.
#   setsid nohup scripts/tpu_measure11.sh >/dev/null 2>&1 &
# Results: /tmp/tpu_measure.log
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_measure.log

# wait for sweep #10's completion marker (max ~3 h)
for i in $(seq 1 180); do
  grep -q "tpu_measure10 done" "$LOG" && break
  sleep 60
done

SNAP=/tmp/sweep11_repo
rm -rf "$SNAP" && mkdir -p "$SNAP"
git archive HEAD | tar -x -C "$SNAP"
cd "$SNAP"
echo "=== tpu_measure11 start $(date) snapshot=$(git -C /root/repo rev-parse --short HEAD)" >> "$LOG"

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

# 1. default bench on the new tree (KIB opt-in flip): must reproduce
#    sweep #9's 1825.4
run "bench default (KIB=0 tree)" python bench.py
# 2. the percam retry: auto-calibrated live_cam CAP + barrier
run "bench PERCAM (barrier, calibrated)" DOOMTPU_BENCH_PERCAM=1 python bench.py
# 3. percam stage ref at the calibrated shape (sweep-#6 said 72.3)
run "profile_paint PERCAM CAP=256" NP=2048 CAP=256 DOOMTPU_PAINT_PERCAM=1 python scripts/profile_paint.py
# 4. deferred ladder with the merged 40-word tmq atlas + the new 5a
#    gather-only cut (attributes pregather between gather and relayout)
run "deferred cuts (merged tmq)" KIB=0 python scripts/probe_deferred_cuts.py
echo "=== tpu_measure11 done $(date)" >> "$LOG"
