"""Random-grid map stress parity: many sectors, portals, specials."""

import jax
import jax.numpy as jnp
import numpy as np

from doomtpu.assets.bundle import LevelAssets
from doomtpu.config import RenderConfig
from doomtpu.level.tables import MapTables
from doomtpu.render.device import DeviceLevel
from doomtpu.render.frame import render_frame
from doomtpu.render.spec import Player, SpecRenderer
from doomtpu.wad import synth
from doomtpu.wad.reader import WadFile


def test_grid_map_bit_exact(info, config):
    rng = np.random.default_rng(7)
    rooms, things = [], [synth.ThingSpec(96, 96, 0, 1)]
    for gy in range(3):
        for gx in range(4):
            x0, y0 = gx * 192, gy * 192
            rooms.append(synth.RoomSpec(
                x0, y0, x0 + 192, y0 + 192,
                floor_h=int(rng.integers(-16, 40)),
                ceil_h=int(rng.integers(120, 200)),
                light=int(rng.integers(96, 255)),
                floor_flat=["FLOOR1", "FLOOR2", "NUKAGE1"][
                    int(rng.integers(0, 3))
                ],
                ceil_flat=["CEIL1", "CEIL2", "F_SKY1"][int(rng.integers(0, 3))],
                special=[0, 1, 2, 8, 17][int(rng.integers(0, 5))],
                mid_tex=["-", "-", "GRATE"][int(rng.integers(0, 3))],
                peg_flags=[0, synth.DONTPEGBOTTOM, synth.DONTPEGTOP][
                    int(rng.integers(0, 3))
                ],
            ))
            if rng.random() < 0.5:
                things.append(synth.ThingSpec(
                    x0 + int(rng.integers(40, 150)),
                    y0 + int(rng.integers(40, 150)),
                    int(rng.integers(0, 360)),
                    [2035, 2014, 2028, 34][int(rng.integers(0, 4))],
                ))

    wad = WadFile(synth.build_wad(rooms, things))
    mt = MapTables.load(wad, "E1M1")
    assets = LevelAssets.load(wad, mt, info.sprite_names)
    level = DeviceLevel.build(mt, assets, info)
    spec = SpecRenderer(mt, assets, info, config)

    dn = info.mobj_index_by_doomednum()
    mp, ma, ms = [], [], []
    for i in range(len(mt.thing_type)):
        tt = int(mt.thing_type[i])
        if 1 <= tt <= 4 or tt == 11:
            continue
        mi = dn[tt]
        mp.append(mt.thing_pos[i])
        ma.append(mt.thing_angle[i])
        ms.append(int(info.mobj_spawn[mi]))
    mp = np.asarray(mp, np.float32)
    ma = np.asarray(ma, np.float32)
    ms = np.asarray(ms, np.int32)

    views = [(300.0, 300.0, 0.8), (500.0, 450.0, 3.9)]
    B = len(views)
    px = jnp.asarray([v[0] for v in views], jnp.float32)
    py = jnp.asarray([v[1] for v in views], jnp.float32)
    pa = jnp.asarray([v[2] for v in views], jnp.float32)
    fh = jnp.asarray(
        [float(mt.sector_floor_h[mt.sector_at(v[0], v[1])]) for v in views],
        jnp.float32,
    )
    sl = jnp.asarray(mt.sector_light, jnp.int32)[None].repeat(B, 0)
    mstate = jnp.asarray(ms)[None].repeat(B, 0)
    idx, rgb, aux = render_frame(
        level, config, px, py, pa, fh, sl, mstate, jnp.zeros(B, jnp.float32)
    )
    assert int(np.asarray(aux["overflow"]).max()) == 0
    for b, v in enumerate(views):
        sec = mt.sector_at(v[0], v[1])
        out = spec.render(
            Player(v[0], v[1], v[2], float(mt.sector_floor_h[sec])),
            mobj_pos=mp, mobj_angle=ma, mobj_state=ms,
        )
        np.testing.assert_array_equal(np.asarray(idx[b]), out["idx"])
