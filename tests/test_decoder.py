"""Real-WAD decoder shapes: negative-origin multi-patch textures and
8-rotation sprites with mirrored pairs (VERDICT round-1 missing #4).

doom1.wad composites patches at negative origins with overlap
(textures.rs:74-103) and stores sprite rotations as split mirrored
pairs like POSSA2A8 (sprites.rs:35-57); the synthetic fixtures now emit
those shapes (wad/synth.py standard_assets + decoder_level) so the
decode paths run in CI, and a full-frame parity test proves the
renderer + oracle agree on them bit-exactly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from doomtpu.assets.bundle import LevelAssets
from doomtpu.level.tables import MapTables
from doomtpu.render.device import DeviceLevel
from doomtpu.render.frame import render_frame
from doomtpu.render.spec import Player, SpecRenderer
from doomtpu.wad import synth
from doomtpu.wad.reader import WadFile


@pytest.fixture(scope="module")
def dlv(info):
    wad = WadFile(synth.decoder_wad())
    tables = MapTables.load(wad, "E1M1")
    assets = LevelAssets.load(wad, tables, info.sprite_names)
    return tables, assets


def test_wall3_negative_origin_composition(dlv):
    """WALL3 = pwall@(-16,-24) + pwall@(32,0) + pstep@(0,96): compose
    independently with numpy and compare texel-for-texel (clip semantics
    of textures.rs:74-103)."""
    _, a = dlv
    ti = list(a.tex_names).index("WALL3")
    w, h = int(a.tex_w[ti]), int(a.tex_h[ti])
    assert (w, h) == (64, 128)

    pwall = synth.make_wall_patch(11, 64, 128, 33)
    pstep = synth.make_wall_patch(12, 64, 64, 75)
    expect = np.zeros((h, w), np.uint8)
    covered = np.zeros((h, w), bool)
    for img, (ox, oy) in ((pwall, (-16, -24)), (pwall, (32, 0)),
                          (pstep, (0, 96))):
        ph, pw = img.shape
        for y in range(max(0, oy), min(h, oy + ph)):
            x0 = max(0, ox)
            x1 = min(w, ox + pw)
            expect[y, x0:x1] = img[y - oy, x0 - ox:x1 - ox]
            covered[y, x0:x1] = True
    assert covered.all(), "WALL3 must be fully covered (wall-opaque)"
    np.testing.assert_array_equal(np.asarray(a.tex_pixels[ti][:h, :w]),
                                  expect)
    assert np.asarray(a.tex_mask[ti][:h, :w]).all()


def test_poss_rotations_and_mirrors(dlv, info):
    """POSS frames A/B resolve all 8 rotations; 6-8 are pixel mirrors of
    4-2 (sprites.rs:48-56)."""
    _, a = dlv
    si = info.sprite_names.index("POSS")
    for f in range(2):
        pics = a.spr_table[si, f]                      # [8] picture ids
        assert (pics >= 0).all(), "all 8 rotations must resolve"
        assert len({int(p) for p in pics}) == 8, "rotations distinct"
        for r, rm in ((2, 8), (3, 7), (4, 6)):
            p_r = int(pics[r - 1])
            p_m = int(pics[rm - 1])
            w, h = int(a.spr_w[p_r]), int(a.spr_h[p_r])
            assert (int(a.spr_w[p_m]), int(a.spr_h[p_m])) == (w, h)
            np.testing.assert_array_equal(
                np.asarray(a.spr_pixels[p_m][:h, :w]),
                np.asarray(a.spr_pixels[p_r][:h, :w])[:, ::-1],
            )
            np.testing.assert_array_equal(
                np.asarray(a.spr_mask[p_m][:h, :w]),
                np.asarray(a.spr_mask[p_r][:h, :w])[:, ::-1],
            )


VIEWS = [
    (384.0, 384.0, 0.0),     # ring center, facing east
    (384.0, 384.0, 1.57),    # north
    (384.0, 384.0, 3.14),    # west
    (384.0, 384.0, 4.71),    # south
    (150.0, 150.0, 0.8),     # off-center: varied rotation indices
]


def _spawn(t, info):
    dn = info.mobj_index_by_doomednum()
    pos, ang, st = [], [], []
    for i in range(len(t.thing_type)):
        tt = int(t.thing_type[i])
        if 1 <= tt <= 4 or tt == 11:
            continue
        pos.append(t.thing_pos[i])
        ang.append(t.thing_angle[i])
        st.append(int(info.mobj_spawn[dn[tt]]))
    return (np.array(pos, np.float32), np.array(ang, np.float32),
            np.array(st, np.int32))


def test_decoder_level_full_frame_parity(dlv, info, config):
    """Bit-exact JAX-vs-oracle frames with WALL3 walls and POSS
    rotations on screen."""
    t, assets = dlv
    level = DeviceLevel.build(t, assets, info)
    assert level.paint_ok  # WALL3 is fully covered -> wall-opaque
    spec = SpecRenderer(t, assets, info, config)

    B = len(VIEWS)
    px = jnp.asarray([v[0] for v in VIEWS], jnp.float32)
    py = jnp.asarray([v[1] for v in VIEWS], jnp.float32)
    pa = jnp.asarray([v[2] for v in VIEWS], jnp.float32)
    fh = jnp.asarray(
        [float(t.sector_floor_h[t.sector_at(v[0], v[1])]) for v in VIEWS],
        jnp.float32,
    )
    sl = jnp.asarray(t.sector_light, jnp.int32)[None].repeat(B, 0)
    mp, ma, ms = _spawn(t, info)
    assert len(ms) == 8
    mstate = jnp.asarray(ms, jnp.int32)[None].repeat(B, 0)
    ts = jnp.zeros(B, jnp.float32)

    idx, rgb, aux = render_frame(
        level, config, px, py, pa, fh, sl, mstate, ts
    )
    idx = np.asarray(idx)
    for b, v in enumerate(VIEWS):
        sec = t.sector_at(v[0], v[1])
        out = spec.render(
            Player(v[0], v[1], v[2], float(t.sector_floor_h[sec])),
            mobj_pos=mp, mobj_angle=ma, mobj_state=ms, timestamp=0.0,
        )
        np.testing.assert_array_equal(idx[b], out["idx"])

    # sanity: the fixture really exercises several rotation indices
    # (renderer/map_objects.rs:53-67)
    from doomtpu.render.things import sprite_rotation

    rots = np.asarray(sprite_rotation(pa[:, None], jnp.asarray(ma)[None]))
    assert len(set(rots.ravel().tolist())) >= 6
