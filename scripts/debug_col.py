#!/usr/bin/env python
"""Debug a mismatching column between spec and JAX renderers."""
import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", default="single")
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--view", type=int, default=0)
    ap.add_argument("--col", type=int, required=True)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from doomtpu.render import jmath

    jmath.set_strict_fp(True)
    import jax.numpy as jnp

    from doomtpu.assets.bundle import LevelAssets
    from doomtpu.config import RenderConfig
    from doomtpu.info import load_default_tables
    from doomtpu.level.tables import MapTables
    from doomtpu.render.device import DeviceLevel
    from doomtpu.render.frame import render_walls_planes
    from doomtpu.render.spec import Player, SpecRenderer
    from doomtpu.wad import synth
    from doomtpu.wad.reader import WadFile

    info = load_default_tables()
    cfg = RenderConfig()
    wad = WadFile({
        "single": synth.single_room_wad,
        "two": synth.two_room_wad,
        "demo": synth.demo_wad,
    }[args.level]())
    mt = MapTables.load(wad, "E1M1")
    assets = LevelAssets.load(wad, mt, info.sprite_names)
    level = DeviceLevel.build(mt, assets, info)
    spec = SpecRenderer(mt, assets, info, cfg)
    rooms, _ = {
        "single": synth.single_room_level,
        "two": synth.two_room_level,
        "demo": synth.demo_level,
    }[args.level]()
    rng = np.random.default_rng(args.seed)
    views = []
    for _ in range(args.views):
        r = rooms[rng.integers(0, len(rooms))]
        if r.floor_h >= r.ceil_h:
            r = rooms[0]
        x = float(rng.uniform(r.x0 + 24, r.x1 - 24))
        y = float(rng.uniform(r.y0 + 24, r.y1 - 24))
        a = float(rng.uniform(0, 2 * math.pi))
        views.append((x, y, a))
    x, y, a = views[args.view]
    print("view:", x, y, a)
    fh = float(mt.sector_floor_h[mt.sector_at(x, y)])
    out = spec.render(Player(x, y, a, fh))
    B = 1
    sl = jnp.asarray(mt.sector_light, jnp.int32)[None]
    idx, rgb, aux = render_walls_planes(
        level, cfg,
        jnp.array([x], jnp.float32), jnp.array([y], jnp.float32),
        jnp.array([a], jnp.float32), jnp.array([fh], jnp.float32),
        sl, jnp.zeros(1, jnp.float32),
    )
    idx = np.asarray(idx[0])
    col = args.col
    bad_rows = np.nonzero(idx[:, col] != out["idx"][:, col])[0]
    print("bad rows:", bad_rows)
    lo = max(0, bad_rows.min() - 2) if len(bad_rows) else 0
    hi = min(cfg.height, (bad_rows.max() + 3) if len(bad_rows) else 8)
    print("spec:", out["idx"][lo:hi, col])
    print("jax :", idx[lo:hi, col])
    pool = np.asarray(aux["pool"][0][0, col])
    gplane = np.asarray(aux["pool"][1][5][0, col])
    cnt = int(np.asarray(aux["cnt"][0, col]))
    for k in range(cnt):
        s = pool[k]
        print(f"slot {k}: kind {(s >> 29) & 3} g {gplane[k]} "
              f"e2b {(s >> 27) & 1} e2t {(s >> 26) & 1} dc {(s >> 28) & 1} "
              f"y0 {((s >> 8) & 255) - 1} y1 {(s & 255) - 1}")
    for vp in spec.visplanes:
        if vp.left <= col <= vp.right:
            print(f"spec vp flat {vp.flat} h {vp.height} top {vp.top[col]} "
                  f"bot {vp.bottom[col]} range {vp.left}-{vp.right}")
    for i, br in enumerate(spec.segs):
        for (cx, ct, cb, by, ty) in br.columns:
            if cx == col:
                print(f"spec seg {i} state {br.state} ct {ct} cb {cb} "
                      f"by {by} ty {ty} tex {br.texture} "
                      f"xr {br.start_x}-{br.end_x}")


if __name__ == "__main__":
    main()
