#!/bin/bash
# Round-3 measurement queue #6: HONEST capacities (probe 2026-08-19:
# cnt_mid 16 / cnt_clip 51 / item presence 20 over the 2048 bench
# poses — the round-2 pools 8/24/8 silently dropped work) + the
# per-camera live-list A/B (DOOMTPU_PAINT_PERCAM; per-camera live peak
# 225 vs union 385) + the re-queued INPUTONLY attribution + the
# deferred cut-5 split (composite pregather vs in-VMEM fold).
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
# honest round-3 baseline: union lists, CAP=416, honest pools — the
# number every optimization below must beat (assert-guarded)
run "bench union CAP416 honest" python bench.py
# honest bench with the standalone item-pass kernel (draws EVERY item,
# no per-column cap): at KI=20-honest deferred it may now WIN
run "bench union CAP416 honest ITEMPASS" DOOMTPU_BENCH_ITEMPASS=1 python bench.py
# per-camera lists at the bench's spread poses (honest pools):
# like-for-like at 416, then the per-camera cap (peak 225 -> 256)
run "NP2048 PERCAM CAP416"        NP=2048 CAP=416 DOOMTPU_PAINT_PERCAM=1 python scripts/profile_paint.py
run "NP2048 PERCAM CAP256"        NP=2048 CAP=256 DOOMTPU_PAINT_PERCAM=1 python scripts/profile_paint.py
run "NP2048 UNION  CAP416 (ref)"  NP=2048 CAP=416 python scripts/profile_paint.py
run "NP2048 PERCAM CAP256 skip15" NP=2048 CAP=256 DOOMTPU_PAINT_PERCAM=1 DOOMTPU_PAINT_SKIP=15 python scripts/profile_paint.py
# input-build attribution (fixed probes; union CAP=416 then percam)
run "NP2048 CAP416 INPUTONLY=3 (camera)"  NP=2048 CAP=416 DOOMTPU_PAINT_INPUTONLY=3 python scripts/profile_paint.py
run "NP2048 CAP416 INPUTONLY=2 (+meta)"   NP=2048 CAP=416 DOOMTPU_PAINT_INPUTONLY=2 python scripts/profile_paint.py
run "NP2048 CAP416 INPUTONLY=1 (+gather)" NP=2048 CAP=416 DOOMTPU_PAINT_INPUTONLY=1 python scripts/profile_paint.py
run "NP2048 PERCAM CAP256 INPUTONLY=2" NP=2048 CAP=256 DOOMTPU_PAINT_PERCAM=1 DOOMTPU_PAINT_INPUTONLY=2 python scripts/profile_paint.py
run "NP2048 PERCAM CAP256 INPUTONLY=1" NP=2048 CAP=256 DOOMTPU_PAINT_PERCAM=1 DOOMTPU_PAINT_INPUTONLY=1 python scripts/profile_paint.py
# deferred cuts with the new cut 5 (item-kernel input pregather) at
# honest pools: splits the composite into XLA pregather vs VMEM fold
run "deferred cuts NP2048 (+cut5)" NP=2048 python scripts/probe_deferred_cuts.py
# end-to-end: percam bench at the per-camera cap
run "bench PERCAM CAP256 honest" DOOMTPU_BENCH_PERCAM=1 DOOMTPU_BENCH_PAINTCAP=256 python bench.py
echo "=== done $(date)" >> "$LOG"
