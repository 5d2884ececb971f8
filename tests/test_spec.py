"""Spec (oracle) renderer behavior tests.

These pin down geometric invariants computed independently of the
renderer's own code paths, so the oracle itself is trustworthy before the
JAX renderer is diffed against it.
"""

import math

import numpy as np
import pytest

from doomtpu.config import (
    ASPECT_RATIO_CORRECTION, PLAYER_EYE_HEIGHT, RenderConfig,
)
from doomtpu.render.spec import Player, SpecRenderer, clip_to_viewport


@pytest.fixture(scope="module")
def spec_single(single_level, config):
    return SpecRenderer(
        single_level.tables, single_level.assets, single_level.info, config
    )


@pytest.fixture(scope="module")
def spec_demo(demo_level, config):
    return SpecRenderer(
        demo_level.tables, demo_level.assets, demo_level.info, config
    )


def render(spec, level, x, y, angle, with_things=False, timestamp=0.0):
    sec = level.tables.sector_at(x, y)
    p = Player(x, y, angle, float(level.tables.sector_floor_h[sec]))
    kwargs = {}
    if with_things:
        mp, ma, ms = level.spawn_mobjs()
        kwargs = dict(mobj_pos=mp, mobj_angle=ma, mobj_state=ms)
    return spec.render(p, timestamp=timestamp, **kwargs)


def test_full_coverage_enclosed(spec_single, single_level, config):
    """Every pixel is written when standing inside a closed room."""
    out = render(spec_single, single_level, 256.0, 256.0, 0.7)
    assert (out["idx"] >= 0).all()


def test_wall_edge_positions(spec_single, single_level, config):
    """Center-column wall top/bottom match an independent projection.

    Player at (256, 256) facing east (+x) in a room with floor 0 /
    ceiling 128; the east wall is 256 units away.  Screen y of a height h:
        y = trunc(H/2 - GAME_FOCUS * (h - eye) / dist)
    """
    out = render(spec_single, single_level, 256.0, 256.0, 0.0)
    W, H = config.width, config.height
    eye = PLAYER_EYE_HEIGHT
    gf = config.game_camera_focus_x
    dist = 256.0
    y_top = int(H / 2 - gf * (128 - eye) / dist)    # ceiling edge
    y_bot = int(H / 2 - gf * (0 - eye) / dist)      # floor edge
    col = out["idx"][:, W // 2]
    # the wall's palette indices come from WALL1 whose atlas values differ
    # from floor/ceiling flats; check edge rows by value transitions
    # ceiling above y_top, wall between, floor below y_bot
    wall_rows = out["idx"][y_top + 2 : y_bot - 2, W // 2]
    ceil_rows = out["idx"][: y_top - 2, W // 2]
    floor_rows = out["idx"][y_bot + 3 :, W // 2]
    tex = spec_single.a.tex_pixels[0]
    flat_c = spec_single.a.flat_pixels[
        spec_single.a.sector_ceil_flat[0]
    ]
    assert np.isin(wall_rows, tex).all()
    assert np.isin(ceil_rows, flat_c).all()
    assert len(floor_rows) > 0


def test_light_diminishing_monotone(spec_single, single_level, config):
    """The same wall gets darker with distance (diminish_color)."""
    near = render(spec_single, single_level, 400.0, 256.0, 0.0)
    far = render(spec_single, single_level, 100.0, 256.0, 0.0)
    H, W = config.height, config.width
    # compare average brightness of the east wall region at screen center
    n = near["rgb"][H // 2 - 5 : H // 2 + 5, W // 2 - 5 : W // 2 + 5].mean()
    f = far["rgb"][H // 2 - 5 : H // 2 + 5, W // 2 - 5 : W // 2 + 5].mean()
    assert f < n


def test_determinism(spec_demo, demo_level):
    a = render(spec_demo, demo_level, 384.0, 256.0, 0.5, with_things=True)
    b = render(spec_demo, demo_level, 384.0, 256.0, 0.5, with_things=True)
    np.testing.assert_array_equal(a["rgb"], b["rgb"])
    np.testing.assert_array_equal(a["idx"], b["idx"])


def test_animated_flat_changes_frame(spec_demo, demo_level, config):
    """NUKAGE cycles 3x/sec: frames at t=0 and t=0.4 differ on the pit."""
    x, y, ang = 384.0, 420.0, math.pi / 2  # facing the nukage pit
    a = render(spec_demo, demo_level, x, y, ang, timestamp=0.0)
    b = render(spec_demo, demo_level, x, y, ang, timestamp=0.4)
    assert (a["idx"] != b["idx"]).any()


def test_things_drawn(spec_demo, demo_level):
    without = render(spec_demo, demo_level, 900.0, 256.0, 0.0)
    withs = render(spec_demo, demo_level, 900.0, 256.0, 0.0, with_things=True)
    diff = (without["idx"] != withs["idx"]).sum()
    assert diff > 20  # barrels visible ahead


def test_masked_grate_partial(spec_demo, demo_level):
    """Looking through the GRATE masked mid texture shows both the grate
    and the room behind it."""
    out = render(spec_demo, demo_level, 384.0, 100.0, -math.pi / 2)
    grate_ix = spec_demo.a.tex_names.index("GRATE")
    grate_vals = np.unique(
        spec_demo.a.tex_pixels[grate_ix][spec_demo.a.tex_mask[grate_ix]]
    )
    hits = np.isin(out["idx"], grate_vals).sum()
    assert hits > 50


def test_sky_no_diminish(spec_demo, demo_level, config):
    """Sky pixels use raw palette colors (visplanes.rs:42-80)."""
    # stand far west in the courtyard looking east at the sky ceiling
    out = render(spec_demo, demo_level, 1300.0, 256.0, 0.0)
    pal = spec_demo.a.palette
    idx, rgb = out["idx"], out["rgb"]
    # undiminished pixels = rgb exactly equals the raw palette entry
    raw = (rgb == pal[np.clip(idx, 0, 255)]).all(-1) & (idx >= 0)
    # the frame's top rows are dominated by sky (ceiling height 256)
    assert raw[:3].mean() > 0.5
    # walls/floors below the horizon are diminished at this distance
    assert raw[150:].mean() < 0.1


def test_zero_height_door_blocks_view(spec_demo, demo_level):
    """Sector 7 (floor == ceiling) occludes the room behind it."""
    out = render(spec_demo, demo_level, 1700.0, 256.0, 0.0)
    # room 8's distinct light level (160) with sector 8 floor at 64 would
    # produce different pixels; the closed door must fully occlude
    assert (out["idx"] >= 0).all()


def test_clip_to_viewport_cases():
    # fully inside
    r = clip_to_viewport(1.0, 0.0, 2.0, 0.5)
    assert r is not None and r[4] == 0.0
    # fully behind
    assert clip_to_viewport(-1.0, 0.0, -2.0, 0.5) is None
    # crossing the left frustum edge: start_offset > 0 when start clipped
    r = clip_to_viewport(1.0, 5.0, 1.0, -5.0)
    assert r is not None
    sx, sy, ex, ey, off = r
    assert off > 0.0
    assert abs(sx - sy) < 1e-3  # clipped onto y = x
    # entirely outside one side
    assert clip_to_viewport(1.0, 5.0, 2.0, 8.0) is None
