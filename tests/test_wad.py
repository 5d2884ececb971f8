"""WAD container, builder, and asset decode tests (layers L0/L2)."""

import numpy as np
import pytest

from doomtpu.assets.pictures import decode_picture
from doomtpu.assets.textures import TextureStore
from doomtpu.assets.flats import FlatStore, ANIMATED_FLAT_GROUPS
from doomtpu.ops import native
from doomtpu.wad.builder import (
    WadBuilder, default_palette, encode_picture, encode_playpal,
)
from doomtpu.wad.reader import MapLump, WadFile
from doomtpu.wad import synth


def test_header_and_directory():
    b = WadBuilder("IWAD").add("FOO", b"hello").add("BAR", b"").add("BAZ", b"xy")
    wad = WadFile(b.build())
    assert wad.magic == "IWAD"
    assert wad.lump_count == 3
    assert bytes(wad.lump("FOO")) == b"hello"
    assert wad.entry("BAR").size == 0
    assert wad.entry("baz").name == "BAZ"  # case-insensitive (wad.rs:167-173)


def test_non_wad_rejected():
    with pytest.raises(ValueError):
        WadFile(b"JUNK" + b"\0" * 100)


def test_pwad_rejected_when_iwad_required():
    data = WadBuilder("PWAD").add("X", b"1").build()
    WadFile(data)  # lenient by default
    with pytest.raises(ValueError):
        WadFile(data, require_iwad=True)  # reference behavior (wad.rs:90-92)


def test_map_lump_fixed_offsets():
    wad = WadFile(synth.demo_wad())
    # map lumps found at marker + fixed offset (wad.rs:175-183)
    e = wad.map_lump_entry("e1m1", MapLump.THINGS)
    assert e.name == "THINGS"
    assert wad.map_lump_entry("E1M1", MapLump.BLOCKMAP).name == "BLOCKMAP"


def test_sprite_range():
    wad = WadFile(synth.demo_wad())
    names = [e.name for e in wad.sprite_entries()]
    assert "BAR1A0" in names and "BON1C0" in names
    assert "WALL1" not in names


def test_picture_roundtrip():
    rng = np.random.default_rng(7)
    pix = rng.integers(0, 256, (37, 21)).astype(np.uint8)
    mask = rng.random((37, 21)) > 0.4
    pix[~mask] = 0
    raw = np.frombuffer(
        encode_picture(pix, mask, left_offset=5, top_offset=11), dtype=np.uint8
    )
    pic = decode_picture(raw, "TEST")
    assert pic.width == 21 and pic.height == 37
    assert pic.left_offset == 5 and pic.top_offset == 11
    np.testing.assert_array_equal(pic.mask, mask)
    np.testing.assert_array_equal(pic.pixels[mask], pix[mask])


def test_picture_tall_posts():
    """Columns with runs > 127 split into multiple posts."""
    pix = np.arange(200, dtype=np.uint8).reshape(200, 1) * 0 + 9
    mask = np.ones((200, 1), bool)
    raw = np.frombuffer(encode_picture(pix, mask), dtype=np.uint8)
    pic = decode_picture(raw, "TALL")
    np.testing.assert_array_equal(pic.mask, mask)


def test_native_decoder_matches_numpy():
    if not native.available():
        pytest.skip("native decoder not built")
    rng = np.random.default_rng(3)
    pix = rng.integers(0, 256, (64, 48)).astype(np.uint8)
    mask = rng.random((64, 48)) > 0.5
    pix[~mask] = 0
    raw = np.frombuffer(encode_picture(pix, mask), dtype=np.uint8)
    out = native.decode_picture(raw, 48, 64)
    assert out is not None
    np.testing.assert_array_equal(out[0], pix)
    np.testing.assert_array_equal(out[1], mask)


def test_texture_compose_two_patches():
    wad = WadFile(synth.demo_wad())
    store = TextureStore(wad)
    pix, mask = store.compose("WALL2")  # two side-by-side copies of PWALL
    assert pix.shape == (128, 128)
    assert mask.all()
    np.testing.assert_array_equal(pix[:, :64], pix[:, 64:])


def test_texture_masked():
    wad = WadFile(synth.demo_wad())
    store = TextureStore(wad)
    pix, mask = store.compose("GRATE")
    assert mask.any() and not mask.all()  # partially transparent


def test_flats_animation_metadata():
    wad = WadFile(synth.demo_wad())
    fs = FlatStore(wad, {"NUKAGE1", "FLOOR1"})
    i1 = fs.id_of("NUKAGE1")
    # group members contiguous, base/len shared (flats.rs:30-75)
    assert fs.anim_len[i1] == 3
    base = fs.anim_base[i1]
    assert fs.names[base : base + 3] == ["NUKAGE1", "NUKAGE2", "NUKAGE3"]
    # cycle 3/sec (flats.rs:103-111)
    assert fs.animated_id(i1, 0.0) == base
    assert fs.animated_id(i1, 0.4) == base + 1
    assert fs.animated_id(i1, 1.0) == base
    f1 = fs.id_of("FLOOR1")
    assert fs.anim_len[f1] == 1 and fs.animated_id(f1, 5.0) == f1


def test_playpal():
    pal = default_palette()
    raw = encode_playpal(pal)
    assert len(raw) == 768 * 14
    np.testing.assert_array_equal(
        np.frombuffer(raw[:768], np.uint8).reshape(256, 3), pal
    )


def test_select_sky_name():
    """Sky-by-map-name rules (reference game.rs:199-227): doom1 episode
    digit picks SKY{e} (unknown episode falls back to SKY1); doom2 two-
    digit map number buckets <12 / <21 / rest; anything else SKY1."""
    from doomtpu.assets.bundle import select_sky_name

    assert select_sky_name("e1m1") == "SKY1"
    assert select_sky_name("E2M7") == "SKY2"
    assert select_sky_name("e3m9") == "SKY3"
    assert select_sky_name("e4m1") == "SKY1"     # "should not happen" arm
    assert select_sky_name("map01") == "SKY1"
    assert select_sky_name("map11") == "SKY1"
    assert select_sky_name("map12") == "SKY2"
    assert select_sky_name("map20") == "SKY2"
    assert select_sky_name("map21") == "SKY3"
    assert select_sky_name("map30") == "SKY3"
    assert select_sky_name("weird") == "SKY1"
