#!/usr/bin/env python
"""Decompose the XLA camera-stage cost on TPU.

Times (separately jitted, checksum-fetched per PERF.md discipline):
  frame   build_seg_frame only
  rank    traversal_rank only
  order   rank + seg_order (argsort)
  pos     rank + traversal_positions (sort-free)
  inputonly=1/2/3  render_paint input-build probes (DOOMTPU_PAINT_INPUTONLY)

Env: B (default 256), LEVEL=demo|e1m1.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def timeit(f, args, n=10):
    out = f(*args)
    _ = int(np.asarray(jax.tree_util.tree_leaves(out)[0].sum()))
    t0 = time.time()
    for _i in range(n):
        out = f(*args)
    _ = int(np.asarray(jax.tree_util.tree_leaves(out)[0].sum()))
    return (time.time() - t0) / n * 1000


def main():
    B = int(os.environ.get("B", 256))
    level_name = os.environ.get("LEVEL", "e1m1")
    from doomtpu.config import RenderConfig
    from doomtpu.engine import DoomEngine
    from doomtpu.render import camera as cam
    from doomtpu.wad import synth

    cfg = RenderConfig(span_capacity=48)
    wad = synth.demo_wad() if level_name == "demo" else synth.e1m1_scale_wad()
    eng = DoomEngine.from_wad_bytes(wad, "e1m1", config=cfg)
    level = eng.level
    print(f"backend={jax.default_backend()} B={B} G={level.num_segs}",
          flush=True)
    state = eng.new_game(B, key=jax.random.PRNGKey(0))
    px, py = state.pos[:, 0], state.pos[:, 1]
    ang, fh = state.angle, state.floor_height
    sl, ts = state.sector_light, state.timestamp

    def f_frame(lv, x, y, an, f, s_l, t):
        fr = cam.build_seg_frame(lv, cfg, x, y, an, f, s_l, t)
        return fr["x0"] + fr["light"]

    def f_rank(lv, x, y):
        return cam.traversal_rank(lv, x, y)

    def f_order(lv, x, y):
        return cam.seg_order(lv, cam.traversal_rank(lv, x, y))

    def f_pos(lv, x, y):
        return cam.traversal_positions(lv, cam.traversal_rank(lv, x, y))

    def f_scatter(lv, x, y):
        import jax.numpy as jnp

        order = cam.seg_order(lv, cam.traversal_rank(lv, x, y))
        Bv, G = order.shape
        return (
            jnp.zeros((Bv, G), jnp.int32)
            .at[jnp.arange(Bv)[:, None], order]
            .set(jnp.arange(G, dtype=jnp.int32)[None])
        )

    for name, f, args in [
        ("frame  ", f_frame, (level, px, py, ang, fh, sl, ts)),
        ("rank   ", f_rank, (level, px, py)),
        ("order  ", f_order, (level, px, py)),
        ("pos    ", f_pos, (level, px, py)),
        ("scatter", f_scatter, (level, px, py)),
    ]:
        ms = timeit(jax.jit(f), args)
        print(f"{name}: {ms:8.2f} ms", flush=True)

    # render_paint input-build decomposition (needs a paint-eligible level)
    import functools

    from doomtpu.ops import pallas_paint as pp

    def f_input(lv, x, y, an, f, s_l, t):
        frame = cam.build_seg_frame(lv, cfg, x, y, an, f, s_l, t)
        frame = jax.lax.optimization_barrier(frame)
        order = cam.seg_order(lv, cam.traversal_rank(lv, x, y))
        return pp.render_paint(lv, cfg, frame, order, an, x, y, f)["rgb"]

    for mode in ("3", "2", "1"):
        # INPUTONLY is read inside render_paint at trace time; a fresh
        # jit object per mode forces a retrace
        os.environ["DOOMTPU_PAINT_INPUTONLY"] = mode
        ms = timeit(
            jax.jit(functools.partial(f_input)),
            (level, px, py, ang, fh, sl, ts),
        )
        print(f"inputonly={mode}: {ms:8.2f} ms", flush=True)
    os.environ["DOOMTPU_PAINT_INPUTONLY"] = "0"


if __name__ == "__main__":
    main()
