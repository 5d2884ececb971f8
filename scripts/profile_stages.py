#!/usr/bin/env python
"""Per-stage TPU timing for the render pipeline."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    B = int(os.environ.get("B", 32))
    from doomtpu.config import RenderConfig
    from doomtpu.engine import DoomEngine
    from doomtpu.render import camera as cam, resolve as res, walls
    from doomtpu.wad import synth

    cfg = RenderConfig()
    eng = DoomEngine.from_wad_bytes(synth.demo_wad(), "e1m1", config=cfg)
    level = eng.level
    state = eng.new_game(B, key=jax.random.PRNGKey(0))
    px, py = state.pos[:, 0], state.pos[:, 1]
    ang, fh = state.angle, state.floor_height
    sl, ts = state.sector_light, state.timestamp

    def timeit(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        n = 5
        for _ in range(n):
            out = fn(*args)
            jax.block_until_ready(out)
        dt = (time.time() - t0) / n
        print(f"{name:24s} {dt * 1000:8.1f} ms")
        return out

    f_frame = jax.jit(
        lambda *a: cam.build_seg_frame(level, cfg, *a)
    )
    frame = timeit("build_seg_frame", f_frame, px, py, ang, fh, sl, ts)

    f_order = jax.jit(
        lambda px, py: cam.seg_order(level, cam.traversal_rank(level, px, py))
    )
    order = timeit("order", f_order, px, py)

    f_scan = jax.jit(lambda fr, o: walls.wall_scan(level, cfg, fr, o))
    pool, cnt, ov = timeit("wall_scan", f_scan, frame, order)
    print("max cnt:", int(np.asarray(cnt).max()), "overflow:", int(np.asarray(ov).max()))

    f_win = jax.jit(lambda p, c: res.find_winners(p, c, cfg.height))
    timeit("find_winners", f_win, pool, cnt)

    f_res = jax.jit(
        lambda fr, p, c, *a: res.resolve_frame(level, cfg, fr, p, c, *a)
    )
    outs = timeit("resolve_frame(all)", f_res, frame, pool, cnt, px, py, ang, fh)

    f_shade = jax.jit(lambda i, l, d, s: res.shade(level, i, l, d, s))
    timeit("shade", f_shade, *outs)

    try:
        from doomtpu.render import things

        f_def = jax.jit(
            lambda fr, p, c, o, ms, i, l, d, s: things.deferred_pass(
                level, cfg, fr, p, c, o, px, py, ang, fh, sl, ms, i, l, d, s
            )
        )
        timeit(
            "deferred_pass", f_def, frame, pool, cnt, order,
            state.mobj_state, outs[0], outs[1], outs[2], outs[3],
        )
    except Exception as e:
        print("deferred fail:", e)


if __name__ == "__main__":
    main()
