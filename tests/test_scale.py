"""Real-map-scale parity: the e1m1-scale fixture and a >2047-seg map.

doom1.wad e1m1 is 475 linedefs / 747 segs / 85 sectors (reference
src/map/mod.rs:48-78); no WAD ships with this environment, so
synth.e1m1_scale_level() builds a deterministic synthetic map at that
scale (736 segs / 130 sectors / 215 things, all eight light-special
types).  The big_level() map (3338 segs) proves the span packing has no
seg cap, like the reference (src/map/segs.rs:17-42).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from doomtpu.assets.bundle import LevelAssets
from doomtpu.config import RenderConfig
from doomtpu.level.tables import MapTables
from doomtpu.render.device import DeviceLevel
from doomtpu.render.frame import render_frame
from doomtpu.render.spec import Player, SpecRenderer
from doomtpu.wad import synth
from doomtpu.wad.reader import WadFile


def _load(level_fn, info):
    wad = WadFile(synth.build_wad(*level_fn()))
    mt = MapTables.load(wad, "E1M1")
    assets = LevelAssets.load(wad, mt, info.sprite_names)
    return mt, assets, DeviceLevel.build(mt, assets, info)


def _mobjs(mt, info):
    dn = info.mobj_index_by_doomednum()
    mp, ma, ms = [], [], []
    for i in range(len(mt.thing_type)):
        tt = int(mt.thing_type[i])
        if 1 <= tt <= 4 or tt == 11:
            continue
        mp.append(mt.thing_pos[i])
        ma.append(mt.thing_angle[i])
        ms.append(int(info.mobj_spawn[dn[tt]]))
    return (
        np.asarray(mp, np.float32),
        np.asarray(ma, np.float32),
        np.asarray(ms, np.int32),
    )


def _assert_views_bit_exact(mt, assets, level, info, cfg, views):
    spec = SpecRenderer(mt, assets, info, cfg)
    mp, ma, ms = _mobjs(mt, info)
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
        level, cfg, px, py, pa, fh, sl, mstate, jnp.zeros(B, jnp.float32)
    )
    assert int(np.asarray(aux["overflow"]).max()) == 0
    idx = np.asarray(idx)
    rgb = np.asarray(rgb)
    for b, v in enumerate(views):
        sec = mt.sector_at(v[0], v[1])
        out = spec.render(
            Player(v[0], v[1], v[2], float(mt.sector_floor_h[sec])),
            mobj_pos=mp, mobj_angle=ma, mobj_state=ms,
        )
        np.testing.assert_array_equal(idx[b], out["idx"])
        srgb = (
            (out["rgb"][..., 0].astype(np.int32) << 16)
            | (out["rgb"][..., 1].astype(np.int32) << 8)
            | out["rgb"][..., 2].astype(np.int32)
        )
        np.testing.assert_array_equal(rgb[b], srgb)


def test_e1m1_scale_counts():
    wad = WadFile(synth.build_wad(*synth.e1m1_scale_level()))
    mt = MapTables.load(wad, "E1M1")
    assert len(mt.seg_line) >= 700          # e1m1: 747
    assert len(mt.sector_floor_h) >= 80     # e1m1: 85
    assert len(mt.thing_type) >= 100
    assert set(np.unique(mt.sector_special)) >= {1, 2, 3, 4, 8, 12, 13, 17}


def test_e1m1_scale_bit_exact(info):
    cfg = RenderConfig(span_capacity=48)
    mt, assets, level = _load(synth.e1m1_scale_level, info)
    # view 1 places floor visplanes on the exact horizon row (vy == 0):
    # the inverse projection hits inf and the saturating as_i16/as_u8
    # cast chain (visplanes.rs:113-114 + bitmap_render.rs:204-207) must
    # match the reference bit-for-bit, including in the rgb output
    views = [(290.0, 300.0, 0.7), (1400.0, 900.0, 3.9)]
    _assert_views_bit_exact(mt, assets, level, info, cfg, views)


def test_doom1_asset_scale_counts():
    """The doom1-ASSET-scale fixture (VERDICT r4 #6): ~50 flats (all
    nine reference animation cycles, flats.rs:30-75), a TEXTURE2 lump
    (textures.rs:141-148), 256-wide composites, deeper BSP."""
    wad = WadFile(synth.doom1_scale_wad())
    mt = MapTables.load(wad, "E1M1")
    assert wad.has("TEXTURE2")
    assert len(mt.seg_line) >= 900
    assert len(mt.sector_floor_h) >= 150


def test_doom1_asset_scale_bit_exact(info):
    """Full-pipeline parity at real-IWAD asset scale: the per-frame
    flat-animation remap, TEXTURE2 composition and wide-texture path
    all run with ~48 loaded flats, and every pixel still matches the
    scalar oracle."""
    # deeper sightlines than the e1m1-scale grid: span peak > 48
    cfg = RenderConfig(span_capacity=72)
    wad = WadFile(synth.doom1_scale_wad())
    mt = MapTables.load(wad, "E1M1")
    assets = LevelAssets.load(wad, mt, info.sprite_names)
    assert assets.flat_pixels.shape[0] >= 40
    level = DeviceLevel.build(mt, assets, info)
    assert level.paint_ok and level.items_ok
    views = [(290.0, 290.0, 0.8), (1600.0, 1100.0, 4.1)]
    _assert_views_bit_exact(mt, assets, level, info, cfg, views)


def test_big_map_over_2047_segs(info):
    mt, assets, level = _load(synth.big_level, info)
    assert level.num_segs > 2047
    # long sightlines across the 22x26 grid stack up to 94 spans/column
    cfg = RenderConfig(width=160, height=100, span_capacity=96)
    views = [(300.0, 300.0, 0.8)]
    _assert_views_bit_exact(mt, assets, level, info, cfg, views)


def test_deep_bsp_over_31_levels_bit_exact(info):
    """BSP depth > 31 renders bit-exact through the two-word traversal
    rank (camera.traversal_rank).  The reference's recursion has no
    depth limit (src/map/nodes.rs:45-83); ours now reaches depth 62."""
    wad = WadFile(synth.build_wad(*synth.deep_level(), unbalanced_bsp=True))
    mt = MapTables.load(wad, "E1M1")
    assets = LevelAssets.load(wad, mt, info.sprite_names)
    level = DeviceLevel.build(mt, assets, info)
    assert mt.sub_path_nodes.shape[1] >= 40
    cfg = RenderConfig(width=160, height=100, span_capacity=96)
    # down-the-corridor sightline (deep rank path) + a sideways view
    views = [(96.0, 96.0, 0.0), (4300.0, 96.0, 2.6)]
    _assert_views_bit_exact(mt, assets, level, info, cfg, views)
    # two-word traversal_positions is seg_order's exact inverse
    from doomtpu.render import camera as cam

    px = jnp.asarray([v[0] for v in views], jnp.float32)
    py = jnp.asarray([v[1] for v in views], jnp.float32)
    rank = cam.traversal_rank(level, px, py)
    assert isinstance(rank, tuple)
    order = np.asarray(cam.seg_order(level, rank))
    pos = np.asarray(cam.traversal_positions(level, rank))
    for b in range(len(views)):
        np.testing.assert_array_equal(
            order[b][pos[b]], np.arange(order.shape[1])
        )


def test_max_visible_cap_bit_exact(info):
    """A max_visible_mobjs cap ABOVE every camera's valid-item count
    changes nothing: the nearest-N selection keeps all items, so frames
    are bit-identical and items_dropped == 0.  bench.py relies on this
    (DOOMTPU_BENCH_MAXN; the e1m1-scale fixture peaks at 284 valid
    items per camera over the bench poses)."""
    mt, assets, level = _load(synth.e1m1_scale_level, info)
    views = [(290.0, 300.0, 0.7), (1400.0, 900.0, 3.9)]
    B = len(views)
    px = jnp.asarray([v[0] for v in views], jnp.float32)
    py = jnp.asarray([v[1] for v in views], jnp.float32)
    pa = jnp.asarray([v[2] for v in views], jnp.float32)
    fh = jnp.asarray(
        [float(mt.sector_floor_h[mt.sector_at(v[0], v[1])]) for v in views],
        jnp.float32,
    )
    sl = jnp.asarray(mt.sector_light, jnp.int32)[None].repeat(B, 0)
    mp, ma, ms = _mobjs(mt, info)
    mstate = jnp.asarray(ms)[None].repeat(B, 0)
    ts = jnp.zeros(B, jnp.float32)
    outs = {}
    for maxn in (0, 320):
        cfg = RenderConfig(span_capacity=48, max_visible_mobjs=maxn)
        idx, rgb, aux = render_frame(
            level, cfg, px, py, pa, fh, sl, mstate, ts
        )
        assert int(np.asarray(aux["items_dropped"]).max()) == 0
        outs[maxn] = (np.asarray(idx), np.asarray(rgb))
    np.testing.assert_array_equal(outs[0][0], outs[320][0])
    np.testing.assert_array_equal(outs[0][1], outs[320][1])


def test_huge_map_paint_capped_bit_exact(info):
    """An ~8k-seg map (synth.huge_level, above paint_max_segs) through
    the CAPPED paint kernel == the scan+resolve pipeline, bit for bit,
    with live_dropped == 0: a paint_live_capacity makes the per-(tile,
    block) packs cap-rows — independent of map size — so the paint path
    serves ANY map (frame.paint_available).  The reference renders all
    sizes through one path (src/renderer/segs.rs:353-590)."""
    import jax.numpy as jnp

    from doomtpu.ops.pallas_paint import render_paint
    from doomtpu.render import camera as cam, resolve as res, walls

    mt, assets, level = _load(synth.huge_level, info)
    assert level.num_segs > 8000
    assert level.paint_ok
    # per-camera live peak over these views: 1268 of 8490 segs (long
    # sky-ceiling sightlines keep segs live pre-occlusion) — the packs
    # are still 6.5x smaller than the uncapped Gp, and G-independent
    cfg = RenderConfig(
        width=128, height=48, span_capacity=224, clip_capacity=160,
        mid_capacity=24, paint_live_capacity=1312,
        paint_percam_compact=True,
    )
    assert level.num_segs > cfg.paint_max_segs

    rng = np.random.default_rng(11)
    views = []
    while len(views) < 4:
        x = float(rng.uniform(64, 40 * 192 - 64))
        y = float(rng.uniform(64, 36 * 192 - 64))
        s = mt.sector_at(x, y)
        if s >= 0 and mt.sector_floor_h[s] < mt.sector_ceil_h[s]:
            views.append((x, y, float(rng.uniform(0, 2 * np.pi))))
    B = len(views)
    px = jnp.asarray([v[0] for v in views], jnp.float32)
    py = jnp.asarray([v[1] for v in views], jnp.float32)
    pa = jnp.asarray([v[2] for v in views], jnp.float32)
    fh = jnp.asarray(
        [float(mt.sector_floor_h[mt.sector_at(v[0], v[1])]) for v in views],
        jnp.float32,
    )
    sl = jnp.asarray(mt.sector_light, jnp.int32)[None].repeat(B, 0)
    ts = jnp.zeros(B, jnp.float32)

    frame = cam.build_seg_frame(level, cfg, px, py, pa, fh, sl, ts)
    order = cam.seg_order(level, cam.traversal_rank(level, px, py))
    pool, cnt, povf = walls.wall_scan(level, cfg, frame, order)
    assert int(np.asarray(povf).max()) == 0
    idx_r, light_r, dist_r, sky_r = res.resolve_frame(
        level, cfg, frame, pool, cnt, px, py, pa, fh
    )
    rgb_r = res.shade(level, idx_r, light_r, dist_r, sky_r, onehot=False)

    out = render_paint(
        level, cfg, frame, order, pa, px, py, fh, interpret=True,
        unroll=1, gsub=2,
    )
    assert int(np.asarray(out["live_dropped"])) == 0
    assert int(np.asarray(out["overflow"]).max()) == 0
    np.testing.assert_array_equal(np.asarray(out["idx"]), np.asarray(idx_r))
    np.testing.assert_array_equal(np.asarray(out["rgb"]), np.asarray(rgb_r))
