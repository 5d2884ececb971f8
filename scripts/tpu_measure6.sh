#!/bin/bash
# Round-3 measurement queue #6: per-camera live-list compaction
# (DOOMTPU_PAINT_PERCAM) vs the union lists at the bench's spread
# poses, the re-queued INPUTONLY attribution (the sweep-5 probes
# crashed on a stale live_dropped fetch, fixed), and the bench re-run
# that sweep #5 lost to a relay FailedPrecondition.
# Log: /tmp/tpu_measure6.log
LOG=${LOG:-/tmp/tpu_measure6.log}
cd "$(dirname "$0")/.."
echo "=== tpu_measure6 start $(date)" >> "$LOG"
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
# round-3 baseline first (sweep-5's failed step): union lists, CAP=416
run "bench union CAP416 (baseline re-run)" python bench.py
# per-camera lists at the bench's spread poses: like-for-like at 416,
# then the per-camera capacity ladder (live_dropped printed each run)
run "NP2048 PERCAM CAP416"        NP=2048 CAP=416 DOOMTPU_PAINT_PERCAM=1 python scripts/profile_paint.py
run "NP2048 PERCAM CAP192"        NP=2048 CAP=192 DOOMTPU_PAINT_PERCAM=1 python scripts/profile_paint.py
run "NP2048 PERCAM CAP128"        NP=2048 CAP=128 DOOMTPU_PAINT_PERCAM=1 python scripts/profile_paint.py
run "NP2048 PERCAM CAP192 skip15" NP=2048 CAP=192 DOOMTPU_PAINT_PERCAM=1 DOOMTPU_PAINT_SKIP=15 python scripts/profile_paint.py
# input-build attribution (union CAP=416) — the fixed probes
run "NP2048 CAP416 INPUTONLY=3 (camera)"  NP=2048 CAP=416 DOOMTPU_PAINT_INPUTONLY=3 python scripts/profile_paint.py
run "NP2048 CAP416 INPUTONLY=2 (+meta)"   NP=2048 CAP=416 DOOMTPU_PAINT_INPUTONLY=2 python scripts/profile_paint.py
run "NP2048 CAP416 INPUTONLY=1 (+gather)" NP=2048 CAP=416 DOOMTPU_PAINT_INPUTONLY=1 python scripts/profile_paint.py
# percam metadata cost (the 8x-wider argsort)
run "NP2048 PERCAM CAP192 INPUTONLY=2" NP=2048 CAP=192 DOOMTPU_PAINT_PERCAM=1 DOOMTPU_PAINT_INPUTONLY=2 python scripts/profile_paint.py
run "NP2048 PERCAM CAP192 INPUTONLY=1" NP=2048 CAP=192 DOOMTPU_PAINT_PERCAM=1 DOOMTPU_PAINT_INPUTONLY=1 python scripts/profile_paint.py
# deferred cuts with the new cut 5 (item-kernel input pregather):
# splits the ~30 ms composite into XLA pregather vs in-VMEM fold
run "deferred cuts NP2048 (+cut5)" NP=2048 python scripts/probe_deferred_cuts.py
# end-to-end: percam bench at the ladder's best-guess cap
run "bench PERCAM CAP192" DOOMTPU_BENCH_PERCAM=1 DOOMTPU_BENCH_PAINTCAP=192 python bench.py
echo "=== done $(date)" >> "$LOG"
