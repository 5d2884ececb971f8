#!/bin/bash
# Round-4 sweep #8: k-outer composite fold A/B + on-TPU exactness +
# GSPMD/Pallas composition + item-occupancy census.
# Queue with:  setsid nohup scripts/tpu_measure8.sh >/dev/null 2>&1 &
# Results:     /tmp/tpu_measure.log
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_measure.log
echo "=== tpu_measure8 start $(date)" >> "$LOG"

# wait for the relay (import jax hangs when it is down: probe w/ timeout)
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

# 1. GSPMD + Pallas composition on the real chip (VERDICT weak #6)
run "sharded paint 1-dev mesh" python scripts/probe_sharded_paint.py
# 2. item-pool occupancy census at honest KI=24 (kimax justification)
run "item blockmax census" python scripts/probe_item_blockmax.py
# 3. deferred decomposition A/B: k-outer composite vs unrolled KI fold
run "deferred cuts KOUTER=1" DOOMTPU_ITEMS_KOUTER=1 python scripts/probe_deferred_cuts.py
run "deferred cuts KOUTER=0" DOOMTPU_ITEMS_KOUTER=0 python scripts/probe_deferred_cuts.py
# 4. end-to-end adoption criterion (sweep-#7 lesson: stage wins lie)
run "bench KOUTER=1 (candidate)" DOOMTPU_ITEMS_KOUTER=1 python bench.py
run "bench KOUTER=0 (round-3 ref)" DOOMTPU_ITEMS_KOUTER=0 python bench.py
# 5. on-TPU pixel exactness vs the spec oracle (VERDICT #5)
run "tpu exactness" python scripts/probe_tpu_exactness.py
echo "=== tpu_measure8 done $(date)" >> "$LOG"
