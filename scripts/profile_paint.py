#!/usr/bin/env python
"""Time ONLY the render_paint kernel on TPU (fast A/B loop).

Env: B (default 256), LEVEL=demo|e1m1, ITEMS=1 to include the
in-kernel item pass.  Timing discipline per PERF.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    B = int(os.environ.get("B", 256))
    level_name = os.environ.get("LEVEL", "e1m1")
    from doomtpu.config import RenderConfig
    from doomtpu.engine import DoomEngine
    from doomtpu.render import camera as cam, things
    from doomtpu.ops.pallas_paint import render_paint
    from doomtpu.wad import synth

    cap = int(os.environ.get("CAP", 0))
    # honest bench capacities (probe_bench_capacities 2026-08-19):
    # the clip/mid pool sizes shape the kernel's emit + DMA costs, so
    # paint timings must ride the same pools the bench ships
    cfg = RenderConfig(
        span_capacity=48, paint_live_capacity=cap,
        mid_capacity=int(os.environ.get("KM", 16)),
        clip_capacity=int(os.environ.get("KC", 56)),
    )
    wad = synth.demo_wad() if level_name == "demo" else synth.e1m1_scale_wad()
    eng = DoomEngine.from_wad_bytes(wad, "e1m1", config=cfg)
    level = eng.level
    NP = int(os.environ.get("NP", 0))
    print(f"backend={jax.default_backend()} B={B} "
          f"G={level.num_segs} NP={NP} CAP={cap}", flush=True)
    if NP > B:
        # bench-chunk poses: NP spread poses, Morton-sorted, middle
        # B-chunk (new_game's default puts every camera at the spawn —
        # a clustered best case; see probe_item_decomp)
        import math

        from doomtpu.engine import _camera_sort_perm

        t = eng.tables
        rng = np.random.default_rng(0)
        poses = []
        left, right, top, bottom = [float(v) for v in t.bbox]
        while len(poses) < NP:
            x = rng.uniform(left, right)
            y = rng.uniform(top, bottom)
            s = t.sector_at(x, y)
            if s >= 0 and t.sector_floor_h[s] < t.sector_ceil_h[s]:
                poses.append((x, y, rng.uniform(0, 2 * math.pi)))
        poses = np.asarray(poses, np.float32)
        state = eng.new_game(
            NP, pos=poses[:, :2], angle=poses[:, 2],
            key=jax.random.PRNGKey(0),
        )
        perm = _camera_sort_perm(state)
        state = jax.tree_util.tree_map(lambda x: x[perm], state)
        c0 = (NP // B // 2) * B
        state = jax.tree_util.tree_map(lambda x: x[c0:c0 + B], state)
    else:
        state = eng.new_game(B, key=jax.random.PRNGKey(0))
        if os.environ.get("SORT", "0") != "0":
            from doomtpu.engine import _camera_sort_perm

            perm = _camera_sort_perm(state)
            state = jax.tree_util.tree_map(lambda x: x[perm], state)
    px, py = state.pos[:, 0], state.pos[:, 1]
    ang, fh = state.angle, state.floor_height
    sl, ts = state.sector_light, state.timestamp

    def fn(lv, x, y, an, f, s_l, t, ms):
        frame = cam.build_seg_frame(lv, cfg, x, y, an, f, s_l, t)
        frame = jax.lax.optimization_barrier(frame)
        rank = cam.traversal_rank(lv, x, y)
        order = cam.seg_order(lv, rank)
        out = render_paint(lv, cfg, frame, order, an, x, y, f)
        # INPUTONLY cuts return early without the counter
        return out["rgb"], out.get("live_dropped", 0)

    f = jax.jit(fn)
    t0 = time.time()
    out, dropped = f(level, px, py, ang, fh, sl, ts, state.mobj_state)
    _ = int(np.asarray(out.sum()))
    comp = time.time() - t0
    t0 = time.time()
    n = 5
    for _ in range(n):
        out, dropped = f(level, px, py, ang, fh, sl, ts, state.mobj_state)
    _ = int(np.asarray(out.sum()))
    dt = (time.time() - t0) / n
    print(f"paint(+camera stage): {dt * 1000:9.2f} ms  (compile {comp:.0f}s)"
          f"  live_dropped={int(np.asarray(dropped))}",
          flush=True)


if __name__ == "__main__":
    main()
