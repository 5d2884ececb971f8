#!/usr/bin/env python
"""Time render_paint alone at e1m1-scale for one SEG_UNROLL setting.

Usage: DOOMTPU_PAINT_UNROLL=N python scripts/bench_paint_sweep.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from doomtpu.config import RenderConfig
    from doomtpu.engine import DoomEngine
    from doomtpu.render import camera as cam
    from doomtpu.wad import synth
    from doomtpu.ops import pallas_paint
    from doomtpu.ops.pallas_paint import render_paint

    cfg = RenderConfig(span_capacity=48)
    eng = DoomEngine.from_wad_bytes(synth.e1m1_scale_wad(), "e1m1", config=cfg)
    level = eng.level
    state = eng.new_game(B, key=jax.random.PRNGKey(0))
    px, py = state.pos[:, 0], state.pos[:, 1]
    ang, fh = state.angle, state.floor_height
    sl, ts = state.sector_light, state.timestamp

    @jax.jit
    def stage(lv, x, y, a, f, s_l, t_s):
        frame = cam.build_seg_frame(lv, cfg, x, y, a, f, s_l, t_s)
        order = cam.seg_order(lv, cam.traversal_rank(lv, x, y))
        return frame, order

    frame, order = stage(level, px, py, ang, fh, sl, ts)
    _ = int(np.asarray(order.sum()))

    @jax.jit
    def paint(lv, fr, o, a, x, y, f):
        return render_paint(lv, cfg, fr, o, a, x, y, f)["rgb"]

    t0 = time.time()
    r = paint(level, frame, order, ang, px, py, fh)
    _ = int(np.asarray(r.sum()))
    comp = time.time() - t0
    t0 = time.time()
    n = 5
    for _i in range(n):
        r = paint(level, frame, order, ang, px, py, fh)
    _ = int(np.asarray(r.sum()))
    dt = (time.time() - t0) / n
    print(f"U={pallas_paint.SEG_UNROLL} B={B}: {dt * 1000:.2f} ms "
          f"(compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
