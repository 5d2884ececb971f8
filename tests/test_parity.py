"""JAX renderer vs the NumPy spec oracle: bit-exact frame parity.

Runs in strict-FP mode (conftest) so XLA's FMA contraction and excess
precision are neutralized; agreement is required to be exact.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doomtpu.render.device import DeviceLevel
from doomtpu.render.frame import render_frame, render_walls_planes
from doomtpu.render.spec import Player, Player as SpecPlayer, SpecRenderer


VIEWS = [
    (384.0, 256.0, 0.0),
    (900.0, 256.0, 2.5),
    (300.0, 700.0, 4.6),
]


@pytest.fixture(scope="module")
def setup(demo_level, config):
    level = DeviceLevel.build(
        demo_level.tables, demo_level.assets, demo_level.info
    )
    spec = SpecRenderer(
        demo_level.tables, demo_level.assets, demo_level.info, config
    )
    return level, spec


def _player(demo_level, x, y, a):
    sec = demo_level.tables.sector_at(x, y)
    return Player(x, y, a, float(demo_level.tables.sector_floor_h[sec]))


def test_full_frame_bit_exact(setup, demo_level, config):
    level, spec = setup
    B = len(VIEWS)
    px = jnp.asarray([v[0] for v in VIEWS], jnp.float32)
    py = jnp.asarray([v[1] for v in VIEWS], jnp.float32)
    pa = jnp.asarray([v[2] for v in VIEWS], jnp.float32)
    fh = jnp.asarray(
        [_player(demo_level, *v).floor_height for v in VIEWS], jnp.float32
    )
    sl = jnp.asarray(demo_level.tables.sector_light, jnp.int32)[None].repeat(B, 0)
    mp, ma, ms = demo_level.spawn_mobjs()
    mstate = jnp.asarray(ms, jnp.int32)[None].repeat(B, 0)
    ts = jnp.full(B, 0.4, jnp.float32)  # mid-cycle animated flats

    from doomtpu.utils.color import unpack_rgb

    idx, rgb, aux = render_frame(
        level, config, px, py, pa, fh, sl, mstate, ts
    )
    rgb = unpack_rgb(rgb)
    assert int(np.asarray(aux["overflow"]).max()) == 0

    for b, v in enumerate(VIEWS):
        out = spec.render(
            _player(demo_level, *v),
            mobj_pos=mp, mobj_angle=ma, mobj_state=ms, timestamp=0.4,
        )
        np.testing.assert_array_equal(np.asarray(idx[b]), out["idx"])
        np.testing.assert_array_equal(rgb[b], out["rgb"])


def test_sky_hack_level_bit_exact(info, config):
    """Adjacent sky-ceiling sectors (sky hack, segs.rs:459-477) and
    DONTPEGTOP texturing render bit-exactly."""
    from doomtpu.assets.bundle import LevelAssets
    from doomtpu.level.tables import MapTables
    from doomtpu.utils.color import unpack_rgb
    from doomtpu.wad import synth
    from doomtpu.wad.reader import WadFile

    wad = WadFile(synth.sky_hack_wad())
    mt = MapTables.load(wad, "E1M1")
    assets = LevelAssets.load(wad, mt, info.sprite_names)
    level = DeviceLevel.build(mt, assets, info)
    spec = SpecRenderer(mt, assets, info, config)

    views = [(256.0, 256.0, 0.0), (900.0, 256.0, 3.3), (256.0, -200.0, 1.57)]
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
    idx, rgb, aux = render_walls_planes(level, config, px, py, pa, fh, sl, ts)
    for b, v in enumerate(views):
        sec = mt.sector_at(v[0], v[1])
        out = spec.render(
            SpecPlayer(v[0], v[1], v[2], float(mt.sector_floor_h[sec]))
        )
        np.testing.assert_array_equal(np.asarray(idx[b]), out["idx"])
        np.testing.assert_array_equal(unpack_rgb(rgb[b]), out["rgb"])


def test_batch_equals_single(setup, demo_level, config):
    """Rendering B views at once matches rendering them one at a time."""
    level, _ = setup
    B = len(VIEWS)
    args = lambda sel: (
        jnp.asarray([VIEWS[i][0] for i in sel], jnp.float32),
        jnp.asarray([VIEWS[i][1] for i in sel], jnp.float32),
        jnp.asarray([VIEWS[i][2] for i in sel], jnp.float32),
        jnp.asarray(
            [_player(demo_level, *VIEWS[i]).floor_height for i in sel],
            jnp.float32,
        ),
        jnp.asarray(demo_level.tables.sector_light, jnp.int32)[None].repeat(
            len(sel), 0
        ),
        jnp.zeros(len(sel), jnp.float32),
    )
    full_idx, _, _ = render_walls_planes(level, config, *args(range(B)))
    one_idx, _, _ = render_walls_planes(level, config, *args([1]))
    np.testing.assert_array_equal(np.asarray(full_idx[1]), np.asarray(one_idx[0]))


def test_player_position_round_trip(demo_level, config):
    """--player-position JSON round-trips through the engine
    (main.rs:52-53, game.rs:34-38, 376-384)."""
    import json

    from doomtpu.engine import DoomEngine
    from doomtpu.wad import synth

    eng = DoomEngine.from_wad_bytes(synth.demo_wad(), "e1m1", config=config)
    state = eng.new_game(1)
    blob = eng.player_position_json(state)
    op = json.loads(blob)
    state2 = eng.new_game(
        1,
        pos=np.asarray([[op["position"]["x"], op["position"]["y"]]]),
        angle=np.asarray([op["angle"]], np.float32),
    )
    np.testing.assert_allclose(np.asarray(state2.pos), np.asarray(state.pos))
    assert float(state2.floor_height[0]) == float(state.floor_height[0])


def test_wall_tex_opacity_invariant(info, config):
    """The resolve winner-fold is exact iff no solid/lower/upper wall
    piece uses a texture with transparent texels (resolve.py docstring;
    reference per-texel skip: bitmap_render.rs:265).  All standard
    fixtures satisfy the invariant; violating it warns at load time."""
    import warnings

    from doomtpu.assets.bundle import LevelAssets
    from doomtpu.level.tables import MapTables
    from doomtpu.wad import synth
    from doomtpu.wad.reader import WadFile

    def build(level_fn, **room_kw):
        rooms, things = level_fn()
        for r in rooms:
            for k, v in room_kw.items():
                setattr(r, k, v)
        wad = WadFile(synth.build_wad(rooms, things))
        mt = MapTables.load(wad, "E1M1")
        assets = LevelAssets.load(wad, mt, info.sprite_names)
        return DeviceLevel.build(mt, assets, info)

    # every standard fixture is inside the exactness domain
    for fn in (synth.demo_level, synth.e1m1_scale_level,
               synth.sky_hack_level):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            level = build(fn)
        assert level.wall_tex_all_opaque

    # a masked texture on SOLID walls leaves the domain and warns
    with pytest.warns(UserWarning, match="transparent texels"):
        level = build(synth.single_room_level, wall_tex="GRATE")
    assert not level.wall_tex_all_opaque

    # ... but the same masked texture on two-sided MIDS is fine (exact
    # deferred path)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        level = build(synth.two_room_level, mid_tex="GRATE")
    assert level.wall_tex_all_opaque


def test_traversal_positions_inverse_of_order(setup, demo_level, config):
    """traversal_positions is exactly the inverse permutation of
    seg_order (the sort-free construction must match the stable
    argsort, ties included)."""
    from doomtpu.render import camera as cam

    level, _ = setup
    B = 16
    rng = np.random.default_rng(3)
    t = demo_level.tables
    left, right, top, bottom = [float(v) for v in t.bbox]
    px = jnp.asarray(rng.uniform(left, right, B), jnp.float32)
    py = jnp.asarray(rng.uniform(top, bottom, B), jnp.float32)
    rank = cam.traversal_rank(level, px, py)
    order = np.asarray(cam.seg_order(level, rank))
    pos = np.asarray(cam.traversal_positions(level, rank))
    G = order.shape[1]
    for b in range(B):
        assert (order[b, pos[b]] == np.arange(G)).all()


def test_counting_order_matches_stable_argsort(setup, demo_level,
                                               monkeypatch):
    """The counting-sort seg order (subsector-rank decomposition +
    scatter inversion, the default) is bit-identical to the stable
    [B, G] rank argsort, ties included (VERDICT r3 #4)."""
    from doomtpu.render import camera as cam

    level, _ = setup
    B = 16
    rng = np.random.default_rng(7)
    t = demo_level.tables
    left, right, top, bottom = [float(v) for v in t.bbox]
    px = jnp.asarray(rng.uniform(left, right, B), jnp.float32)
    py = jnp.asarray(rng.uniform(top, bottom, B), jnp.float32)
    rank = cam.traversal_rank(level, px, py)
    monkeypatch.setattr(cam, "COUNTING_ORDER", False)
    o_ref = np.asarray(cam.seg_order(level, rank))
    p_ref = np.asarray(cam.traversal_positions(level, rank))
    monkeypatch.setattr(cam, "COUNTING_ORDER", True)
    np.testing.assert_array_equal(
        np.asarray(cam.seg_order(level, rank)), o_ref
    )
    np.testing.assert_array_equal(
        np.asarray(cam.traversal_positions(level, rank)), p_ref
    )
