#!/usr/bin/env python
"""Benchmark: batched-camera render throughput on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north star of 100k
aggregate frames/sec at >= 2048 parallel viewpoints on one TPU chip
(the reference publishes no numbers of its own — BASELINE.md).

Uses doom1.wad e1m1 when present (./doom1.wad or $DOOM_WAD), otherwise
the built-in synthetic level at e1m1 scale (736 segs / 130 sectors /
215 things vs e1m1's 747/85/~140, reference src/map/mod.rs:48-78) that
exercises the full feature set (portals, sky, masked mids, sprites,
light specials, animated flats).

Parity labeling: no Rust toolchain or game WAD exists in this
environment, so pixel parity is asserted against the scalar spec oracle
(doomtpu/render/spec.py, a line-accurate transcription with file:line
citations), not the Rust binary itself — see tests/test_scale.py.

Env knobs: DOOMTPU_BENCH_B (batch, default 2048), DOOMTPU_BENCH_ITERS,
DOOMTPU_BENCH_THINGS=0 to benchmark the walls/planes pipeline only.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

NORTH_STAR_FPS = 100_000.0


def main() -> int:
    import jax
    import jax.numpy as jnp

    from doomtpu.config import RenderConfig
    from doomtpu.engine import DoomEngine

    B = int(os.environ.get("DOOMTPU_BENCH_B", 2048))
    iters = int(os.environ.get("DOOMTPU_BENCH_ITERS", 8))
    with_things = os.environ.get("DOOMTPU_BENCH_THINGS", "1") != "0"
    use_pallas = os.environ.get("DOOMTPU_BENCH_PALLAS", "1") != "0"
    use_paint = os.environ.get("DOOMTPU_BENCH_PAINT", "1") != "0"
    use_itempass = os.environ.get("DOOMTPU_BENCH_ITEMPASS", "0") != "0"

    chunk = int(os.environ.get("DOOMTPU_BENCH_CHUNK", 256))
    # deferred-pass cost is linear in the selected-item count N; the
    # e1m1-scale fixture peaks at 284 valid items per camera over the
    # bench poses (incl. ticks), so a 320 cap drops NOTHING (bit-exact
    # output, items_dropped == 0 — see tests/test_scale.py) while
    # cutting every [B, N, W] stage ~22%
    maxn = int(os.environ.get("DOOMTPU_BENCH_MAXN", 320))
    cfg = RenderConfig(
        width=320, height=200,
        render_chunk=chunk,
        max_visible_mobjs=maxn,
        # 64 random views on the e1m1-scale fixture peak at 46
        # spans/column (tests/test_scale.py measures this)
        span_capacity=48,
        # TRUE per-column peaks over all 2048 bench poses, measured on
        # the v5e with oversized pools (scripts/probe_bench_capacities,
        # 2026-08-19): cnt_mid 16, cnt_clip 51, item presence 20.  The
        # round-2 defaults (8/24/8) silently dropped work at these
        # poses — the warmup assert below now enforces honesty.  Items
        # get +4 margin because the timed loop ticks the sim (sprite
        # frames change size); mid/clip counts are geometry-only.
        mid_capacity=int(os.environ.get("DOOMTPU_BENCH_KM", 16)),
        clip_capacity=int(os.environ.get("DOOMTPU_BENCH_KC", 56)),
        item_capacity=int(os.environ.get("DOOMTPU_BENCH_KI", 24)),
        use_pallas_scan=use_pallas and jax.default_backend() != "cpu",
        # paint-at-emit kernel (ops/pallas_paint.py): the fast path when
        # the level is eligible; frame.paint_available falls back cleanly
        use_pallas_paint=use_paint and jax.default_backend() != "cpu",
        # standalone item-pass kernel (ops/pallas_itempass.py)
        use_item_pass_kernel=use_itempass,
        # per-camera live lists (config.py): A/B knob, default OFF.
        # Sweep #6 measured percam CAP=256 winning the paint stage
        # (72.3 vs 88.6 ms/chunk union CAP=416) but sweep #7's
        # END-TO-END bench flipped it hard: 798.7 f/s percam vs 1439.0
        # union at the same honest pools — the 8x-wider compaction
        # metadata costs far more in the full pipeline than the
        # paint-stage probes showed (PERF.md sweep #7).
        paint_percam_compact=(
            os.environ.get("DOOMTPU_BENCH_PERCAM", "0") != "0"
        ),
        # compacted live-seg list capacity (0 = exact/full).  Defaults
        # ride ~8-14% above the measured bench-pose census peaks
        # (scripts/probe_visits.py: union 385 -> 416, percam 225 -> 256);
        # the warmup below asserts live_dropped == 0 so an undersized
        # cap can never ship wrong bench pixels silently
        # (tests/test_paint.py proves the counter catches any excess).
        # NOTE: the census is at the default B=2048, where camera_sort
        # makes each 8-camera tile spatially coherent; at small B the
        # tiles are less coherent and the union peak is HIGHER (B=32
        # trips the assert at 416).  For small-B runs set
        # DOOMTPU_BENCH_PAINTCAP=0 (exact, uncapped).
        paint_live_capacity=int(
            os.environ.get(
                "DOOMTPU_BENCH_PAINTCAP",
                256 if os.environ.get("DOOMTPU_BENCH_PERCAM", "0") != "0"
                else 416,
            )
        ),
    )
    wad_path = os.environ.get("DOOM_WAD", "doom1.wad")
    if os.path.exists(wad_path):
        engine = DoomEngine.from_wad(wad_path, "e1m1", config=cfg)
        source = wad_path
    else:
        from doomtpu.wad import synth

        engine = DoomEngine.from_wad_bytes(
            synth.e1m1_scale_wad(), "e1m1", config=cfg
        )
        source = "synthetic e1m1-scale level"

    # random valid camera poses spread over the map
    t = engine.tables
    rng = np.random.default_rng(0)
    poses = []
    left, right, top, bottom = [float(v) for v in t.bbox]
    while len(poses) < B:
        x = rng.uniform(left, right)
        y = rng.uniform(top, bottom)
        s = t.sector_at(x, y)
        if s >= 0 and t.sector_floor_h[s] < t.sector_ceil_h[s]:
            poses.append((x, y, rng.uniform(0, 2 * math.pi)))
    pos = np.asarray([(p[0], p[1]) for p in poses], np.float32)
    ang = np.asarray([p[2] for p in poses], np.float32)

    state = engine.new_game(B, key=jax.random.PRNGKey(0), pos=pos, angle=ang)
    render = engine.render if with_things else engine.render_walls

    def checksum(x):
        # a host fetch of a dependent value is the only reliable barrier
        # on relay-backed runtimes (block_until_ready can return early)
        return int(np.asarray(x.sum()))

    # compile + warm up (checksum also warms the sum/fetch path)
    t0 = time.time()
    idx, rgb = render(state)
    warm_cs = checksum(idx)
    compile_s = time.time() - t0

    # exactness guard: every capacity counter must be 0 on the bench
    # workload, or the configured caps (paint_live_capacity above all)
    # would be trading wrong pixels for speed.  Runs once, outside the
    # timed loop.
    if with_things:
        counters = engine.render_counters(state)
        bad = {k: v for k, v in counters.items() if v != 0}
        assert not bad, f"bench config drops work: {bad}"

    # timed loop (state advances so frames differ)
    controls = jnp.zeros(B, jnp.int32)
    key = jax.random.PRNGKey(1)
    states = [state]
    for i in range(iters - 1):
        states.append(
            engine.tick(states[-1], controls, jax.random.fold_in(key, i))
        )
    checksum(states[-1].tick)

    t0 = time.time()
    out = None
    for st in states:
        out = render(st)
    final_cs = checksum(out[0])
    dt = time.time() - t0

    fps = B * iters / dt
    print(
        f"# {source}: B={B} iters={iters} things={with_things} "
        f"compile={compile_s:.1f}s run={dt:.3f}s "
        f"({dt / iters * 1000:.1f} ms/batched-frame)",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "e1m1-scale 320×200 frames/sec/chip (batched cameras); "
                  "pixel parity vs spec oracle (Rust binary unavailable "
                  "in this environment)",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / NORTH_STAR_FPS, 4),
        "map": {
            "source": source,
            "segs": int(len(t.seg_line)),
            "sectors": int(len(t.sector_floor_h)),
            "things": int(len(t.thing_type)),
        },
        "batch": B,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
