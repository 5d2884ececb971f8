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

    if os.environ.get("DOOMTPU_CPU", "0") != "0":
        # smoke-test escape hatch: sitecustomize force-registers the
        # axon TPU backend in every process and JAX_PLATFORMS=cpu alone
        # cannot override it — only this post-import config call can
        jax.config.update("jax_platforms", "cpu")
    exact = int(os.environ.get("DOOMTPU_EXACT", "0"))
    if exact:
        # exact-TPU mode A/B (jmath.set_exact_tpu): pinned products
        # (1) / + host-libm trig (2); the headline metric line says
        # which mode produced it
        from doomtpu.render import jmath

        jmath.set_exact_tpu(exact)
    import jax.numpy as jnp

    from doomtpu.config import RenderConfig
    from doomtpu.engine import DoomEngine

    # default batch 4096 since sweep #21: the BASELINE metric is
    # f/s/chip at >= 2048 viewpoints, and denser Morton-sorted tiles at
    # 4096 cut per-chunk live-seg visits — 3168.4 vs 2814.2 f/s/chip
    # measured at identical per-chunk shapes, counters 0 at both
    B = int(os.environ.get("DOOMTPU_BENCH_B", 4096))
    iters = int(os.environ.get("DOOMTPU_BENCH_ITERS", 8))
    with_things = os.environ.get("DOOMTPU_BENCH_THINGS", "1") != "0"
    use_pallas = os.environ.get("DOOMTPU_BENCH_PALLAS", "1") != "0"
    use_paint = os.environ.get("DOOMTPU_BENCH_PAINT", "1") != "0"
    use_itempass = os.environ.get("DOOMTPU_BENCH_ITEMPASS", "0") != "0"

    chunk = int(os.environ.get("DOOMTPU_BENCH_CHUNK", 256))
    cfg = RenderConfig(
        width=320, height=200,
        render_chunk=chunk,
        use_pallas_scan=use_pallas and jax.default_backend() != "cpu",
        # paint-at-emit kernel (ops/pallas_paint.py): the fast path when
        # the level is eligible; frame.paint_available falls back cleanly
        use_pallas_paint=use_paint and jax.default_backend() != "cpu",
        # standalone item-pass kernel (ops/pallas_itempass.py)
        use_item_pass_kernel=use_itempass,
        # per-camera live lists (config.py): default ON since sweep #11.
        # Sweep #7 had percam LOSING end-to-end (798.7 vs 1439.0)
        # despite winning the paint stage; the cause was XLA re-fusing
        # the 8x-wider compaction chain into every consumer.  With the
        # chain materialized behind lax.optimization_barrier (e2d59d2)
        # sweep #11 measures percam 2205.9 f/s vs 1897.2 union
        # (rollout 2232.4 vs 1919.1) at auto-calibrated pools
        # (livecap 256 vs 416), every drop counter 0.
        paint_percam_compact=(
            os.environ.get("DOOMTPU_BENCH_PERCAM", "1") != "0"
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

    def spread_poses(t, n, seed=0):
        """Random valid camera poses spread over the map."""
        rng = np.random.default_rng(seed)
        poses = []
        left, right, top, bottom = [float(v) for v in t.bbox]
        while len(poses) < n:
            x = rng.uniform(left, right)
            y = rng.uniform(top, bottom)
            s = t.sector_at(x, y)
            if s >= 0 and t.sector_floor_h[s] < t.sector_ceil_h[s]:
                poses.append((x, y, rng.uniform(0, 2 * math.pi)))
        return (
            np.asarray([(p[0], p[1]) for p in poses], np.float32),
            np.asarray([p[2] for p in poses], np.float32),
        )

    t = engine.tables
    pos, ang = spread_poses(t, B)

    state = engine.new_game(B, key=jax.random.PRNGKey(0), pos=pos, angle=ang)

    def checksum(x):
        # a host fetch of a dependent value is the only reliable barrier
        # on relay-backed runtimes (block_until_ready can return early)
        return int(np.asarray(x.sum()))

    # ---- tick chain (sim only, render-config-independent) -------------
    # Zero controls: poses stay at the censused spots; the thinkers
    # still animate sprites.  The chain covers the timed renders (ticks
    # 0..iters-1) AND the rollout (ticks 0..roll_T): mobj animation is
    # key-independent under zero controls (PRNG keys only drive light
    # flicker, which no capacity depends on).
    controls = jnp.zeros(B, jnp.int32)
    key = jax.random.PRNGKey(1)
    roll_T = (
        int(os.environ.get("DOOMTPU_BENCH_ROLLOUT_T", 32))
        if with_things else 0
    )
    chain = [state]
    for i in range(max(iters, roll_T + 1) - 1):
        chain.append(
            engine.tick(chain[-1], controls, jax.random.fold_in(key, i))
        )
    checksum(chain[-1].tick)
    states = chain[:iters]

    # ---- auto-capacity calibration (doomtpu/calibrate.py) -------------
    # No hand-tuned pool constants: every capacity is measured from an
    # uncapped census of the exact states rendered below, then asserted
    # drop-free at warmup.  DOOMTPU_BENCH_* env vars remain as explicit
    # A/B overrides.
    t0 = time.time()
    engine = engine.calibrate(chain)
    from dataclasses import replace as _replace

    overrides = {}
    for env_name, fld in (
        ("DOOMTPU_BENCH_MAXN", "max_visible_mobjs"),
        ("DOOMTPU_BENCH_SPAN", "span_capacity"),
        ("DOOMTPU_BENCH_KM", "mid_capacity"),
        ("DOOMTPU_BENCH_KC", "clip_capacity"),
        ("DOOMTPU_BENCH_KI", "item_capacity"),
        ("DOOMTPU_BENCH_KIB", "item_block_capacity"),
        ("DOOMTPU_BENCH_PAINTCAP", "paint_live_capacity"),
    ):
        v = os.environ.get(env_name)
        if v is not None:
            overrides[fld] = int(v)
    if overrides:
        engine = _replace(
            engine, config=_replace(engine.config, **overrides)
        )
    c = engine.config
    print(
        f"# calibrated in {time.time() - t0:.1f}s: span={c.span_capacity} "
        f"mid={c.mid_capacity} clip={c.clip_capacity} "
        f"items={c.item_capacity} kib={c.item_block_capacity} "
        f"maxn={c.max_visible_mobjs} livecap={c.paint_live_capacity}"
        + (f" overrides={overrides}" if overrides else ""),
        file=sys.stderr,
    )

    def measure_render(eng, sts, label):
        """Shared honest-measurement flow: compile+warm on the first
        state, assert EVERY capacity counter is 0 (an undersized pool
        would trade wrong pixels for speed), then time renders over all
        states (they advance, so frames differ)."""
        render_fn = eng.render if with_things else eng.render_walls
        t0 = time.time()
        out = render_fn(sts[0])
        checksum(out[0])
        comp_s = time.time() - t0
        cts = (
            eng.render_counters(sts[0]) if with_things
            else eng.render_walls_counters(sts[0])
        )
        bad = {k: v for k, v in cts.items() if v != 0}
        assert not bad, f"{label} bench config drops work: {bad}"
        t0 = time.time()
        for st_ in sts:
            out = render_fn(st_)
        checksum(out[0])
        return time.time() - t0, comp_s

    dt, compile_s = measure_render(engine, states, source)
    fps = B * iters / dt

    # ---- rollout workload: step+render under lax.scan (the RL-env
    # product shape, BASELINE configs[4]).  Zero controls keep every
    # pose inside the censused capacity envelope (the thinkers still
    # tick, so sprites animate frame to frame); the final state's
    # counters are asserted below, same honesty bar as the render loop.
    # Chained 16-tick segments stay far under the relay's ~100 s
    # single-execution kill (engine.rollout chains bit-identically).
    rollout = None
    if with_things and roll_T > 0:
        # cross-tick live-list reuse (engine.rollout live_reuse): each
        # 16-tick segment reuses its first tick's traversal/compaction
        # metadata; the summed live_stale counter is asserted 0 below,
        # proving frames bit-identical to the recompute-every-tick path.
        # Default ON since sweep #13 (rollout 2306.8 vs 2230.6 f/s on
        # the pre-PCYB tree, stale 0); the JSON records live_reuse.
        # Requires the paint pipeline WITH percam compaction: off on
        # CPU smoke runs, in exact mode (both fall back to the XLA
        # pipeline), and on union-list A/B runs (render_paint asserts
        # percam for reuse).  DOOMTPU_PAINT_PERCAM overrides the cfg
        # flag inside render_paint, so honor it here too.
        percam_on = cfg.paint_percam_compact
        _pc = os.environ.get("DOOMTPU_PAINT_PERCAM")
        if _pc is not None:
            percam_on = _pc != "0"
        reuse = (
            os.environ.get("DOOMTPU_BENCH_REUSE", "1") != "0"
            and cfg.use_pallas_paint and percam_on and not exact
        )
        seq = jnp.zeros((roll_T, B), jnp.int32)
        rkey = jax.random.PRNGKey(2)

        # segment length: 16-tick segments stay far under the relay's
        # ~100 s single-execution kill; at post-round-5 speeds a
        # 32-tick segment measures ~27 s, so DOOMTPU_BENCH_SEGTICKS=32
        # halves the chain overhead AND the live-reuse refresh rate
        segticks = int(os.environ.get("DOOMTPU_BENCH_SEGTICKS", 16))

        def run_rollout():
            r = engine.rollout(
                state, seq, rkey, return_frames=False,
                max_ticks_per_jit=segticks, live_reuse=reuse,
            )
            if reuse:
                fstate, cks, stale = r
                assert int(np.asarray(stale)) == 0, (
                    f"live-list reuse went stale: {int(np.asarray(stale))}"
                )
                return fstate, cks
            return r

        t0 = time.time()
        fstate, cks = run_rollout()
        checksum(cks)
        roll_compile_s = time.time() - t0
        t0 = time.time()
        fstate, cks = run_rollout()
        checksum(cks)
        roll_dt = time.time() - t0
        rcounters = engine.render_counters(fstate)
        rbad = {k: v for k, v in rcounters.items() if v != 0}
        assert not rbad, f"rollout drops work: {rbad}"
        rollout = {
            "value": round(B * roll_T / roll_dt, 1),
            "unit": "step+render frames/sec/chip",
            "T": roll_T,
            "vs_baseline": round(B * roll_T / roll_dt / NORTH_STAR_FPS, 4),
            "live_reuse": reuse,
        }
        print(
            f"# rollout: T={roll_T} compile={roll_compile_s:.1f}s "
            f"run={roll_dt:.3f}s -> {rollout['value']:.1f} f/s/chip",
            file=sys.stderr,
        )
    print(
        f"# {source}: B={B} iters={iters} things={with_things} "
        f"compile={compile_s:.1f}s run={dt:.3f}s "
        f"({dt / iters * 1000:.1f} ms/batched-frame)",
        file=sys.stderr,
    )

    # ---- second map line: the doom1-ASSET-scale fixture (~50 flats,
    # TEXTURE2, 256-wide composites, deeper BSP — wad/synth.py
    # doom1_scale_wad, VERDICT r4 #6).  Same honesty bar: calibrated
    # capacities (cache-keyed per map), every drop counter asserted 0.
    map2 = None
    if (os.environ.get("DOOMTPU_BENCH_MAP2", "1") != "0"
            and not os.path.exists(wad_path)):
        from doomtpu.wad import synth

        eng2 = DoomEngine.from_wad_bytes(
            synth.doom1_scale_wad(), "e1m1", config=cfg
        )
        t2 = eng2.tables
        iters2 = max(2, iters // 2)
        pos2, ang2 = spread_poses(t2, B, seed=3)
        st2 = eng2.new_game(
            B, key=jax.random.PRNGKey(4), pos=pos2, angle=ang2
        )
        chain2 = [st2]
        for i in range(iters2 - 1):
            chain2.append(
                eng2.tick(chain2[-1], controls, jax.random.fold_in(key, i))
            )
        checksum(chain2[-1].tick)
        t0 = time.time()
        eng2 = eng2.calibrate(chain2)
        cal2_s = time.time() - t0
        dt2, compile2_s = measure_render(eng2, chain2, "map2")
        map2 = {
            "value": round(B * iters2 / dt2, 1),
            "unit": "frames/sec/chip",
            "vs_baseline": round(B * iters2 / dt2 / NORTH_STAR_FPS, 4),
            "map": {
                "source": "synthetic doom1-asset-scale level",
                "segs": int(len(t2.seg_line)),
                "sectors": int(len(t2.sector_floor_h)),
                "things": int(len(t2.thing_type)),
                "flats": int(eng2.assets.flat_pixels.shape[0]),
            },
        }
        print(
            f"# map2 doom1-asset-scale: B={B} iters={iters2} "
            f"calibrate={cal2_s:.1f}s compile={compile2_s:.1f}s "
            f"run={dt2:.3f}s -> {map2['value']:.1f} f/s/chip",
            file=sys.stderr,
        )
    print(json.dumps({
        "metric": "e1m1-scale 320×200 frames/sec/chip (batched cameras); "
                  "pixel parity vs spec oracle (Rust binary unavailable "
                  "in this environment)"
                  + (f"; DOOMTPU_EXACT={exact} fp mode" if exact else ""),
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
        # the RL-product workload (step+render under lax.scan), VERDICT
        # round-3 #9 — rides inside the single JSON line the driver
        # records, so both numbers land in BENCH_r{N}.json
        "rollout": rollout,
        # the doom1-asset-scale fixture (~50 flats / TEXTURE2 / wide
        # composites), VERDICT r4 #6 — same honesty bar, second map
        "map2": map2,
        # honest ceiling (PERF.md round-4 roofline): exact per-column
        # rendering at this seg count has a ~20k f/s/chip issue+grid
        # floor on one v5e; 100k is unreachable without quality trades
        "ceiling_note": "roofline (PERF.md r4): measured issue floors "
                        "sum to ~11-13 ms/256-chunk => ~20k f/s/chip "
                        "architectural ceiling on one v5e; 100k "
                        "north star unreachable for exact rendering",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
