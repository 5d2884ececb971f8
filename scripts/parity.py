#!/usr/bin/env python
"""Parity harness: JAX renderer vs the NumPy spec oracle.

Usage: python scripts/parity.py [--level demo|two|single] [--views N]
       [--things] [--fast] [--tpu]

Renders matched frames through both pipelines and reports exact-pixel
agreement.  CPU + strict-FP by default (bit-exact target); --fast leaves
FMA contraction on (boundary pixels may differ).
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", default="two")
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--things", action="store_true")
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.fast:
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
    if args.things:
        from doomtpu.render.frame import render_frame
    from doomtpu.render.spec import Player, SpecRenderer
    from doomtpu.wad import synth
    from doomtpu.wad.reader import WadFile

    info = load_default_tables()
    cfg = RenderConfig()
    wad_bytes = {
        "single": synth.single_room_wad,
        "two": synth.two_room_wad,
        "demo": synth.demo_wad,
        "sky": synth.sky_hack_wad,
    }[args.level]()
    wad = WadFile(wad_bytes)
    mt = MapTables.load(wad, "E1M1")
    assets = LevelAssets.load(wad, mt, info.sprite_names)
    level = DeviceLevel.build(mt, assets, info)
    spec = SpecRenderer(mt, assets, info, cfg)

    # sample valid camera poses: room interiors, random angles
    rooms, _ = {
        "single": synth.single_room_level,
        "two": synth.two_room_level,
        "demo": synth.demo_level,
        "sky": synth.sky_hack_level,
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

    mp = ma = ms = None
    if args.things:
        dn = info.mobj_index_by_doomednum()
        pos, ang, st = [], [], []
        for i in range(len(mt.thing_type)):
            tt = int(mt.thing_type[i])
            if 1 <= tt <= 4 or tt == 11:
                continue
            mi = dn[tt]
            pos.append(mt.thing_pos[i])
            ang.append(mt.thing_angle[i])
            st.append(int(info.mobj_spawn[mi]))
        if pos:
            mp = np.array(pos, np.float32)
            ma = np.array(ang, np.float32)
            ms = np.array(st, np.int32)

    B = len(views)
    px = jnp.array([v[0] for v in views], jnp.float32)
    py = jnp.array([v[1] for v in views], jnp.float32)
    pa = jnp.array([v[2] for v in views], jnp.float32)
    fh = jnp.array(
        [float(mt.sector_floor_h[mt.sector_at(v[0], v[1])]) for v in views],
        jnp.float32,
    )
    sl = jnp.asarray(mt.sector_light, jnp.int32)[None].repeat(B, 0)
    ts = jnp.zeros(B, jnp.float32)

    t0 = time.time()
    if args.things and mp is not None:
        mstate = jnp.asarray(ms, jnp.int32)[None].repeat(B, 0)
        idx, rgb, aux = render_frame(
            level, cfg, px, py, pa, fh, sl, mstate, ts
        )
    else:
        idx, rgb, aux = render_walls_planes(level, cfg, px, py, pa, fh, sl, ts)
    from doomtpu.utils.color import unpack_rgb

    idx = np.asarray(idx)
    rgb = unpack_rgb(rgb)
    print(f"jax render (incl. compile): {time.time() - t0:.1f}s")

    worst = 1.0
    for b, (x, y, a) in enumerate(views):
        p = Player(x, y, a, float(fh[b]))
        out = spec.render(
            p, mobj_pos=mp, mobj_angle=ma,
            mobj_state=ms if args.things else None,
        )
        m_idx = (idx[b] == out["idx"]).mean()
        m_rgb = (rgb[b] == out["rgb"]).all(-1).mean()
        worst = min(worst, m_idx)
        print(f"view {b} ({x:7.1f},{y:7.1f},{a:5.2f}) "
              f"idx {m_idx:.5f} rgb {m_rgb:.5f}")
        if m_idx < 1.0:
            bad = np.argwhere(idx[b] != out["idx"])
            print(f"   mismatches: {len(bad)} first: {bad[:4].tolist()}")
    print(f"worst idx agreement: {worst:.5f}")
    return 0 if worst == 1.0 else 1


if __name__ == "__main__":
    sys.exit(main())
