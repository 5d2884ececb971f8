#!/bin/bash
# Round-4 sweep #9: re-run of sweep #8's broken steps (they raced live
# working-tree edits — this sweep runs from a GIT SNAPSHOT, the fix) +
# the new STREAM paint-kernel A/B.
# Queue with:  setsid nohup scripts/tpu_measure9.sh >/dev/null 2>&1 &
# Results:     /tmp/tpu_measure.log
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_measure.log

# snapshot HEAD so concurrent edits to the working tree cannot race the
# queued runs (sweep #8 lesson: half-edited kernels crashed 4 steps)
SNAP=/tmp/sweep9_repo
rm -rf "$SNAP" && mkdir -p "$SNAP"
git archive HEAD | tar -x -C "$SNAP"
cd "$SNAP"
echo "=== tpu_measure9 start $(date) snapshot=$(git -C /root/repo rev-parse --short HEAD)" >> "$LOG"

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

# 1. deferred decomposition A/B: k-outer composite vs unrolled KI fold
run "deferred cuts KOUTER=1" DOOMTPU_ITEMS_KOUTER=1 python scripts/probe_deferred_cuts.py
run "deferred cuts KOUTER=0" DOOMTPU_ITEMS_KOUTER=0 python scripts/probe_deferred_cuts.py
# 2. STREAM paint kernel at bench-chunk poses / honest pools (the
#    sweep-5/6 comparison config: NP=2048 CAP=416)
run "profile_paint STREAM=1" NP=2048 CAP=416 DOOMTPU_PAINT_STREAM=1 python scripts/profile_paint.py
run "profile_paint STREAM=0 (ref)" NP=2048 CAP=416 DOOMTPU_PAINT_STREAM=0 python scripts/profile_paint.py
run "skeleton STREAM=1 skip15" NP=2048 CAP=416 DOOMTPU_PAINT_STREAM=1 DOOMTPU_PAINT_SKIP=15 python scripts/profile_paint.py
run "skeleton STREAM=0 skip15" NP=2048 CAP=416 DOOMTPU_PAINT_SKIP=15 python scripts/profile_paint.py
run "skeleton STREAM=1 NBUF=4 skip15" NP=2048 CAP=416 DOOMTPU_PAINT_STREAM=1 DOOMTPU_PAINT_NBUF=4 DOOMTPU_PAINT_SKIP=15 python scripts/profile_paint.py
# 2b. counting-sort seg order (camera-stage A/B, VERDICT r3 #4)
run "INPUTONLY=3 COUNTING=1" NP=2048 CAP=416 DOOMTPU_PAINT_INPUTONLY=3 DOOMTPU_COUNTING_ORDER=1 python scripts/profile_paint.py
run "INPUTONLY=3 COUNTING=0" NP=2048 CAP=416 DOOMTPU_PAINT_INPUTONLY=3 DOOMTPU_COUNTING_ORDER=0 python scripts/profile_paint.py
run "INPUTONLY=1 COUNTING=1" NP=2048 CAP=416 DOOMTPU_PAINT_INPUTONLY=1 DOOMTPU_COUNTING_ORDER=1 python scripts/profile_paint.py
run "INPUTONLY=1 COUNTING=0" NP=2048 CAP=416 DOOMTPU_PAINT_INPUTONLY=1 DOOMTPU_COUNTING_ORDER=0 python scripts/profile_paint.py
# 3. end-to-end adoption criteria (stage wins lie — sweep #7)
run "bench KOUTER=1 STREAM=1" DOOMTPU_ITEMS_KOUTER=1 DOOMTPU_PAINT_STREAM=1 python bench.py
run "bench KOUTER=1 STREAM=0" DOOMTPU_ITEMS_KOUTER=1 DOOMTPU_PAINT_STREAM=0 python bench.py
run "bench KOUTER=0 STREAM=0 COUNTING=0 (round-3 ref)" DOOMTPU_ITEMS_KOUTER=0 DOOMTPU_PAINT_STREAM=0 DOOMTPU_COUNTING_ORDER=0 python bench.py
# 4. on-TPU pixel exactness vs the spec oracle (VERDICT #5)
run "tpu exactness" python scripts/probe_tpu_exactness.py
echo "=== tpu_measure9 done $(date)" >> "$LOG"
