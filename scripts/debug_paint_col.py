#!/usr/bin/env python
"""Dissect one column's spans for the paint-vs-resolve single-pixel diff."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from doomtpu.config import RenderConfig
from doomtpu.render import camera as cam, jmath, resolve as res, walls
from doomtpu.engine import DoomEngine
from doomtpu.wad import synth

B_SEL, X_SEL, Y_SEL = 3, 124, 18

VIEWS = [
    (384.0, 256.0, 0.0),
    (900.0, 256.0, 2.5),
    (300.0, 700.0, 4.6),
    (384.0, 256.0, 3.1),
]


def main():
    jmath.set_strict_fp(False)
    cfg = RenderConfig(width=320, height=200, span_capacity=32)
    engine = DoomEngine.from_wad_bytes(synth.demo_wad(), "e1m1", config=cfg)
    level, t = engine.level, engine.tables

    B = len(VIEWS)
    px = jnp.asarray([v[0] for v in VIEWS], jnp.float32)
    py = jnp.asarray([v[1] for v in VIEWS], jnp.float32)
    pa = jnp.asarray([v[2] for v in VIEWS], jnp.float32)
    fh = jnp.asarray(
        [float(t.sector_floor_h[t.sector_at(v[0], v[1])]) for v in VIEWS],
        jnp.float32,
    )
    sl = jnp.asarray(t.sector_light, jnp.int32)[None].repeat(B, 0)
    ts = jnp.full(B, 0.4, jnp.float32)

    frame = cam.build_seg_frame(level, cfg, px, py, pa, fh, sl, ts)
    order = cam.seg_order(level, cam.traversal_rank(level, px, py))
    pool, cnt, _ = walls.wall_scan(level, cfg, frame, order)

    spans, planes = pool
    spans = np.asarray(spans)[B_SEL, X_SEL]
    pl_n = [np.asarray(p)[B_SEL, X_SEL] for p in planes]
    n = int(np.asarray(cnt)[B_SEL, X_SEL])
    print(f"column b={B_SEL} x={X_SEL}: {n} spans; pixel y={Y_SEL}")
    for k in range(n):
        s = spans[k]
        kind = (s >> 29) & 3
        y0 = ((s >> 8) & 255) - 1
        y1 = (s & 255) - 1
        nd = bool(np.int64(s) < 0)
        names = {0: "WALL", 1: "FLOOR", 2: "CEIL", 3: "MID"}
        cover = y0 <= Y_SEL <= y1
        d = [int(p[k]) for p in pl_n]
        extra = ""
        if kind in (0, 3):
            by = (d[1] >> 16) & 0xFFFF
            ty = d[1] & 0xFFFF
            th = d[2] & 0xFFFF
            offy = (d[2] >> 16) & 0xFFFF
            extra = (f" colbase={d[0]} by={by} ty={ty} th={th} offy={offy}"
                     f" seg={d[5]}")
        else:
            extra = f" d1={d[0]:x} height={(d[1] >> 16) & 0xFFFF} seg={d[5]}"
        print(f"  k={k:2d} {names[kind]:5s} y0={y0:3d} y1={y1:3d} "
              f"nodraw={int(nd)} cover={int(cover)}{extra}")

    idx_r, light_r, dist_r, sky_r = res.resolve_frame(
        level, cfg, frame, pool, cnt, px, py, pa, fh
    )
    print("resolve idx:", int(np.asarray(idx_r)[B_SEL, Y_SEL, X_SEL]))


if __name__ == "__main__":
    main()
