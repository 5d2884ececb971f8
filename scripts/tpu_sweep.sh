#!/bin/bash
# Parameterized TPU measurement sweep runner (replaces the one-shot
# tpu_measure2..12.sh accumulation; VERDICT r4 #8).
#
# Usage:
#   scripts/tpu_sweep.sh NAME STEPS_FILE [AFTER_MARKER]
#
#   NAME         sweep name; completion marker "NAME done" is appended
#                to the log so later sweeps can chain on it
#   STEPS_FILE   text file of steps, one per line:
#                    label :: command...
#                '#' lines and blanks ignored; commands run under
#                `bash -c` from a git-archive SNAPSHOT of HEAD (never
#                the live working tree — sweep-#8 lesson, PERF.md),
#                each bounded by `timeout ${STEP_TIMEOUT:-2400}`
#   AFTER_MARKER wait (max ~3 h) until this marker string appears in
#                the log before starting; if it never appears, ABORT
#                with a logged error instead of running concurrently
#                with the unfinished sweep (one-CPU box / shared relay
#                would skew both — ADVICE r4)
#
# Run detached:
#   setsid nohup scripts/tpu_sweep.sh s13 scripts/sweeps/s13.steps \
#       >/dev/null 2>&1 &
# Results: /tmp/tpu_measure.log
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_measure.log}
NAME=${1:?sweep name}
STEPS=$(readlink -f "${2:?steps file}")
AFTER=${3:-}

if [ -n "$AFTER" ]; then
  # the log is append-only and persistent, so the named marker alone
  # could be satisfied by a PREVIOUS run of that sweep — also require
  # that no sweep is currently mid-flight (the last '=== ' header line
  # is a done/ABORT, not a dangling start)
  ok=
  for i in $(seq 1 180); do
    if grep -q "$AFTER" "$LOG" 2>/dev/null; then
      last=$(grep -E '^=== ' "$LOG" | tail -1)
      case "$last" in
        *" done "*|*" ABORT"*) ok=1; break;;
      esac
    fi
    sleep 60
  done
  if [ -z "$ok" ]; then
    echo "=== $NAME ABORT: marker '$AFTER' never appeared (or a sweep is still mid-flight) $(date)" >> "$LOG"
    exit 1
  fi
fi

SNAP=/tmp/sweep_${NAME}_repo
rm -rf "$SNAP" && mkdir -p "$SNAP"
git archive HEAD | tar -x -C "$SNAP"
# the calibration cache is shared across snapshots (same repo key)
export DOOMTPU_CALIB_CACHE=${DOOMTPU_CALIB_CACHE:-/root/repo/.calib_cache}
cd "$SNAP"
echo "=== $NAME start $(date) snapshot=$(git -C /root/repo rev-parse --short HEAD)" >> "$LOG"

until timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  echo "relay down, retry in 300s $(date)" >> "$LOG"
  sleep 300
done
echo "relay up $(date)" >> "$LOG"

while IFS= read -r line; do
  case "$line" in ''|'#'*) continue;; esac
  label=${line%% ::*}
  cmd=${line#* :: }
  echo "--- $label $(date)" >> "$LOG"
  timeout "${STEP_TIMEOUT:-2400}" bash -c "$cmd" >> "$LOG" 2>&1 \
    || echo "--- $label FAILED rc=$? $(date)" >> "$LOG"
done < "$STEPS"
echo "=== $NAME done $(date)" >> "$LOG"
