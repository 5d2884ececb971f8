#!/usr/bin/env python
"""Generate committed golden frames (VERDICT r1 item 8).

Renders pinned views with the scalar spec oracle (doomtpu/render/spec.py,
a line-accurate transcription of the reference renderer — the pose-pinning
hook mirrors the reference's `--player-position` reproducibility,
src/game.rs:376-384) and stores the palette-index framebuffers plus rgb
hashes in tests/golden/frames.npz.

tests/test_golden.py asserts BOTH pipelines (spec oracle and the JAX
renderer) against this committed artifact, so a regression that moves
both in lockstep can no longer pass silently.

Run only when golden output is intentionally changed:
    python scripts/gen_golden.py
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from doomtpu.config import RenderConfig
from doomtpu.render.spec import Player, SpecRenderer


# (fixture, map, views [(x, y, angle)], timestamp, span_capacity)
GOLDEN_SETS = [
    ("demo", [(384.0, 256.0, 0.0), (900.0, 256.0, 2.5), (300.0, 700.0, 4.6)],
     0.4, 32),
    ("e1m1_scale", [(290.0, 300.0, 0.7), (1400.0, 900.0, 3.9)], 0.0, 48),
]


def build_fixture(name, info):
    from doomtpu.assets.bundle import LevelAssets
    from doomtpu.level.tables import MapTables
    from doomtpu.wad import synth
    from doomtpu.wad.reader import WadFile

    level_fn = {"demo": synth.demo_level, "e1m1_scale": synth.e1m1_scale_level}[
        name
    ]
    wad = WadFile(synth.build_wad(*level_fn()))
    mt = MapTables.load(wad, "E1M1")
    assets = LevelAssets.load(wad, mt, info.sprite_names)
    return mt, assets


def spawn_mobjs(mt, info):
    dn = info.mobj_index_by_doomednum()
    pos, ang, st = [], [], []
    for i in range(len(mt.thing_type)):
        tt = int(mt.thing_type[i])
        if 1 <= tt <= 4 or tt == 11:
            continue
        pos.append(mt.thing_pos[i])
        ang.append(mt.thing_angle[i])
        st.append(int(info.mobj_spawn[dn[tt]]))
    return (
        np.asarray(pos, np.float32),
        np.asarray(ang, np.float32),
        np.asarray(st, np.int32),
    )


def main():
    from doomtpu.info import load_default_tables

    info = load_default_tables()
    out = {}
    for name, views, ts, span_cap in GOLDEN_SETS:
        mt, assets = build_fixture(name, info)
        cfg = RenderConfig(span_capacity=span_cap)
        spec = SpecRenderer(mt, assets, info, cfg)
        mp, ma, ms = spawn_mobjs(mt, info)
        for vi, (x, y, a) in enumerate(views):
            sec = mt.sector_at(x, y)
            player = Player(x, y, a, float(mt.sector_floor_h[sec]))
            res = spec.render(
                player, mobj_pos=mp, mobj_angle=ma, mobj_state=ms,
                timestamp=ts,
            )
            key = f"{name}_{vi}"
            out[f"{key}_idx"] = res["idx"].astype(np.int16)
            out[f"{key}_rgb_sha256"] = np.frombuffer(
                hashlib.sha256(res["rgb"].tobytes()).digest(), np.uint8
            )
            out[f"{key}_view"] = np.asarray([x, y, a, ts], np.float64)
        out[f"{name}_span_capacity"] = np.asarray(span_cap, np.int32)
        out[f"{name}_n_views"] = np.asarray(len(views), np.int32)
        print(f"{name}: {len(views)} views rendered")

    path = os.path.join(
        os.path.dirname(__file__), "..", "tests", "golden", "frames.npz"
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
