#!/bin/bash
# Wait for the TPU relay to come back, then run the queued measurement
# sequence.  Log: /tmp/tpu_measure.log
LOG=/tmp/tpu_measure.log
cd /root/repo
echo "=== tpu_measure_seq start $(date)" >> "$LOG"
for i in $(seq 1 200); do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "=== relay up after probe $i $(date)" >> "$LOG"
    break
  fi
  sleep 120
done
echo "=== profile_paint (merged-fori + plive) $(date)" >> "$LOG"
timeout 2400 python scripts/profile_paint.py >> "$LOG" 2>&1
echo "=== profile_paint ITEMS=1 $(date)" >> "$LOG"
ITEMS=1 timeout 2400 python scripts/profile_paint.py >> "$LOG" 2>&1
echo "=== done $(date)" >> "$LOG"
