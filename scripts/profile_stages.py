#!/usr/bin/env python
"""Per-stage TPU timing for the render pipeline on the e1m1-scale map.

Env: B (default 256), PALLAS=0/1 (default 1 on TPU), LEVEL=demo|e1m1.
Timing discipline (PERF.md): host-fetch a dependent scalar per
measurement; arrays are jit args, not closure constants.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    B = int(os.environ.get("B", 256))
    use_pallas = os.environ.get("PALLAS", "1") != "0" and \
        jax.default_backend() != "cpu"
    level_name = os.environ.get("LEVEL", "e1m1")
    from doomtpu.config import RenderConfig
    from doomtpu.engine import DoomEngine
    from doomtpu.render import camera as cam, resolve as res, walls
    from doomtpu.wad import synth

    cfg = RenderConfig(span_capacity=48)
    wad = synth.demo_wad() if level_name == "demo" else synth.e1m1_scale_wad()
    eng = DoomEngine.from_wad_bytes(wad, "e1m1", config=cfg)
    level = eng.level
    print(f"backend={jax.default_backend()} B={B} pallas={use_pallas} "
          f"G={level.num_segs} MO={level.num_mobjs} D={level.dseg_ix.shape[0]}",
          flush=True)
    state = eng.new_game(B, key=jax.random.PRNGKey(0))
    px, py = state.pos[:, 0], state.pos[:, 1]
    ang, fh = state.angle, state.floor_height
    sl, ts = state.sector_light, state.timestamp

    def timeit(name, fn, *args, n=5):
        f = jax.jit(fn)
        t0 = time.time()
        out = f(*args)
        _ = int(np.asarray(jax.tree_util.tree_leaves(out)[0].sum()))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(n):
            out = f(*args)
        _ = int(np.asarray(jax.tree_util.tree_leaves(out)[0].sum()))
        dt = (time.time() - t0) / n
        print(f"{name:26s} {dt * 1000:9.2f} ms   (compile {compile_s:.0f}s)",
              flush=True)
        return out

    frame = timeit(
        "build_seg_frame",
        lambda lv, *a: cam.build_seg_frame(lv, cfg, *a),
        level, px, py, ang, fh, sl, ts,
    )
    order = timeit(
        "order",
        lambda lv, px, py: cam.seg_order(lv, cam.traversal_rank(lv, px, py)),
        level, px, py,
    )

    if use_pallas:
        from doomtpu.ops.pallas_scan import wall_scan_pallas

        pool, cnt, ov = timeit(
            "wall_scan (pallas)",
            lambda lv, fr, o: wall_scan_pallas(lv, cfg, fr, o),
            level, frame, order,
        )
    else:
        pool, cnt, ov = timeit(
            "wall_scan (lax.scan)",
            lambda lv, fr, o: walls.wall_scan(lv, cfg, fr, o),
            level, frame, order,
        )
    print("  max cnt:", int(np.asarray(cnt).max()),
          "overflow:", int(np.asarray(ov).max()), flush=True)

    outs = timeit(
        "resolve_frame",
        lambda lv, fr, p, c, *a: res.resolve_frame(lv, cfg, fr, p, c, *a),
        level, frame, pool, cnt, px, py, ang, fh,
    )
    timeit(
        "shade",
        lambda lv, i, l, d, s: res.shade(lv, i, l, d, s),
        level, *outs,
    )

    from doomtpu.render import things

    timeit(
        "deferred_pass",
        lambda lv, fr, p, c, o, ms, i, l, d, s: things.deferred_pass(
            lv, cfg, fr, things.pools_from_unified(p, c), o,
            px, py, ang, fh, sl, ms, i, l, d, s
        )[:4],
        level, frame, pool, cnt, order,
        state.mobj_state, outs[0], outs[1], outs[2], outs[3],
    )

    # paint-at-emit kernel path (walls+planes+sky+shade in one kernel)
    if use_pallas and level.paint_ok:
        from doomtpu.ops.pallas_paint import render_paint

        pout = timeit(
            "render_paint (kernel)",
            lambda lv, fr, o, *a: render_paint(lv, cfg, fr, o, *a)["rgb"],
            level, frame, order, ang, px, py, fh,
        )

        def _deferred_paint(lv, fr, o, an, x, y, f, s_l, ms):
            out = render_paint(lv, cfg, fr, o, an, x, y, f)
            ld = out["ld"]
            return things.deferred_pass(
                lv, cfg, fr, things.pools_from_paint(out), o,
                x, y, an, f, s_l, ms,
                out["idx"], (ld >> 16) & 0xFF,
                ((ld & 0xFFFF) << 16) >> 16, (ld & (1 << 25)) != 0,
                rgb=out["rgb"], item_kernel=lv.items_ok,
            )[:4]

        timeit(
            "paint + deferred",
            _deferred_paint,
            level, frame, order, ang, px, py, fh, sl, state.mobj_state,
        )

    # end to end for reference
    from doomtpu.render.frame import render_frame

    cfg_paint = cfg
    if use_pallas and level.paint_ok:
        import dataclasses

        cfg_paint = dataclasses.replace(cfg, use_pallas_paint=True)
    timeit(
        "render_frame (end2end)",
        lambda lv, *a: render_frame(lv, cfg_paint, *a)[:2],
        level, px, py, ang, fh, sl, state.mobj_state, ts,
    )


if __name__ == "__main__":
    main()
