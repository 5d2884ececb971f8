#!/usr/bin/env python
"""Attribute deferred-pass cost by scaling its knobs on TPU.

Times things.deferred_pass over the paint-kernel pools at several
(max_visible_mobjs N, item_capacity KI) settings; the deltas attribute
cost to the N-sequential emit loop, the K x N clip reductions, and the
KI-slot composite.  Env: B (default 256).
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    B = int(os.environ.get("B", 256))
    from doomtpu.config import RenderConfig
    from doomtpu.engine import DoomEngine
    from doomtpu.render import camera as cam, things
    from doomtpu.wad import synth

    cfg = RenderConfig(span_capacity=48)
    eng = DoomEngine.from_wad_bytes(synth.e1m1_scale_wad(), "e1m1", config=cfg)
    level = eng.level
    state = eng.new_game(B, key=jax.random.PRNGKey(0))
    px, py = state.pos[:, 0], state.pos[:, 1]
    ang, fh = state.angle, state.floor_height
    sl, ts = state.sector_light, state.timestamp
    print(f"B={B} G={level.num_segs} MO={level.num_mobjs} "
          f"D={level.dseg_ix.shape[0]}", flush=True)

    from doomtpu.ops.pallas_paint import render_paint

    @jax.jit
    def paint(lv, x, y, a, f, s_l, t_s):
        frame = cam.build_seg_frame(lv, cfg, x, y, a, f, s_l, t_s)
        order = cam.seg_order(lv, cam.traversal_rank(lv, x, y))
        out = render_paint(lv, cfg, frame, order, a, x, y, f)
        return frame, order, out

    t0 = time.time()
    frame, order, out = paint(level, px, py, ang, fh, sl, ts)
    _ = int(np.asarray(out["idx"].sum()))
    print(f"paint ready ({time.time() - t0:.0f}s)", flush=True)
    ld = out["ld"]
    args0 = (
        out["idx"], (ld >> 16) & 0xFF, ((ld & 0xFFFF) << 16) >> 16,
        (ld & (1 << 25)) != 0, out["rgb"],
    )

    def timeit(name, c, n=4, item_kernel=False):
        def fn(lv, fr, o, x, y, an, f_h, s_l, ms, i, l, d, s, rgb,
               *pools_flat):
            pools = (
                {"span": pools_flat[0], "d2": pools_flat[1],
                 "d6": pools_flat[2], "cnt": pools_flat[3]},
                {"span": pools_flat[4], "d1": pools_flat[5],
                 "d2": pools_flat[6], "d3": pools_flat[7],
                 "d4": pools_flat[8], "d5": pools_flat[9],
                 "d6": pools_flat[10], "cnt": pools_flat[11]},
            )
            return things.deferred_pass(
                lv, c, fr, pools, o, x, y, an, f_h, s_l, ms,
                i, l, d, s, rgb=rgb, item_kernel=item_kernel,
            )[0]

        clip, midp = things.pools_from_paint(out)
        flat = (clip["span"], clip["d2"], clip["d6"], clip["cnt"],
                midp["span"], midp["d1"], midp["d2"], midp["d3"],
                midp["d4"], midp["d5"], midp["d6"], midp["cnt"])
        f = jax.jit(fn)
        t0 = time.time()
        r = f(level, frame, order, px, py, ang, fh, sl,
              state.mobj_state, *args0, *flat)
        _ = int(np.asarray(r.sum()))
        comp = time.time() - t0
        t0 = time.time()
        for _i in range(n):
            r = f(level, frame, order, px, py, ang, fh, sl,
              state.mobj_state, *args0, *flat)
        _ = int(np.asarray(r.sum()))
        dt = (time.time() - t0) / n
        print(f"{name:34s} {dt * 1000:8.2f} ms  (compile {comp:.0f}s)",
              flush=True)

    if os.environ.get("ROWS", "all") == "kernel":
        timeit("N=all KI=8 item-kernel", cfg, item_kernel=True)
        timeit("N=64  KI=8 item-kernel",
               dataclasses.replace(cfg, max_visible_mobjs=64),
               item_kernel=True)
        return
    timeit("full N=all KI=8", cfg)
    timeit("N=64  KI=8", dataclasses.replace(cfg, max_visible_mobjs=64))
    timeit("N=64  KI=4",
           dataclasses.replace(cfg, max_visible_mobjs=64, item_capacity=4))
    timeit("N=all KI=4", dataclasses.replace(cfg, item_capacity=4))
    timeit("N=16  KI=8", dataclasses.replace(cfg, max_visible_mobjs=16))
    timeit("N=all KI=8 item-kernel", cfg, item_kernel=True)
    timeit("N=64  KI=8 item-kernel",
           dataclasses.replace(cfg, max_visible_mobjs=64), item_kernel=True)


if __name__ == "__main__":
    main()
