"""Synthetic level + asset generation: rooms in, valid IWAD bytes out.

The test suite and bench need real WAD content but no game WAD ships with
the environment, so this module builds complete IWADs from a declarative
room list:

- axis-aligned rectangular rooms; shared edge fragments become two-sided
  portal linedefs (upper/lower walls, masked mids), the rest one-sided
  solid walls
- a guillotine BSP over the rooms emits SEGS/SSECTORS/NODES exactly as a
  node builder would (bottom-up node order, bit-15 subsector children —
  reference map/nodes.rs:6,42-83)
- procedural PLAYPAL/COLORMAP, flats, patches, TEXTURE1/PNAMES textures
  and sprites (with S_START/S_END markers) round out the IWAD

Linedef orientation convention: vertices are ordered so the FRONT sidedef
is on the right of the direction vector, i.e. room boundaries are walked
clockwise (interior on the right), matching Doom's convention and the
reference's facing test (renderer/segs.rs:358-362, 446-448).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import struct

from doomtpu.config import FLAT_SIZE
from doomtpu.wad.builder import (
    WadBuilder,
    default_palette,
    encode_colormap,
    encode_flat,
    encode_picture,
    encode_playpal,
    encode_pnames,
    encode_texture1,
)

# linedef flags (reference map/linedefs.rs:9-19)
TWOSIDED = 4
DONTPEGTOP = 8
DONTPEGBOTTOM = 16


@dataclass
class RoomSpec:
    x0: int
    y0: int
    x1: int
    y1: int
    floor_h: int = 0
    ceil_h: int = 128
    light: int = 192
    floor_flat: str = "FLOOR1"
    ceil_flat: str = "CEIL1"
    special: int = 0
    tag: int = 0
    wall_tex: str = "WALL1"
    lower_tex: str = "WALL1"
    upper_tex: str = "WALL1"
    mid_tex: str = "-"  # portal middle texture ("-" = none, e.g. "GRATE")
    peg_flags: int = 0  # DONTPEGTOP / DONTPEGBOTTOM applied to this room's lines


@dataclass
class ThingSpec:
    x: int
    y: int
    angle: int  # degrees
    type: int
    flags: int = 7


@dataclass
class _Line:
    v1: int
    v2: int
    flags: int
    front_side: int
    back_side: int


@dataclass
class _Side:
    x_off: int
    y_off: int
    upper: str
    lower: str
    middle: str
    sector: int


@dataclass
class _Seg:
    v1: int
    v2: int
    linedef: int
    direction: int
    offset: int


class LevelBuilder:
    """Turns RoomSpecs into the eight map lumps."""

    def __init__(self, rooms: list[RoomSpec], things: list[ThingSpec]):
        self.rooms = rooms
        self.things = things
        self.verts: list[tuple[int, int]] = []
        self._vert_ix: dict[tuple[int, int], int] = {}
        self.lines: list[_Line] = []
        self.sides: list[_Side] = []
        self.segs: list[_Seg] = []
        self.room_segs: list[list[int]] = [[] for _ in rooms]
        self.subsectors: list[tuple[int, int]] = []  # (count, first)
        self.nodes: list[tuple] = []

    # -- geometry helpers ---------------------------------------------------
    def _v(self, x: int, y: int) -> int:
        key = (int(x), int(y))
        if key not in self._vert_ix:
            self._vert_ix[key] = len(self.verts)
            self.verts.append(key)
        return self._vert_ix[key]

    def _add_side(self, room: int, upper="-", lower="-", middle="-") -> int:
        self.sides.append(_Side(0, 0, upper, lower, middle, room))
        return len(self.sides) - 1

    def _edge_intervals(self, r: RoomSpec, edge: str) -> tuple[int, int]:
        if edge in ("n", "s"):
            return (r.x0, r.x1)
        return (r.y0, r.y1)

    def build_walls(self) -> None:
        """Create linedefs, sidedefs and per-room segs (CW order)."""
        n = len(self.rooms)
        # shared fragments per (room, edge): list of (lo, hi, other_room)
        shared: dict[tuple[int, str], list[tuple[int, int, int]]] = {}

        def note(a, ea, b, eb, lo, hi):
            shared.setdefault((a, ea), []).append((lo, hi, b))
            shared.setdefault((b, eb), []).append((lo, hi, a))

        portal_line: dict[tuple[int, int, int, int], int] = {}

        def make_portal(a, b, v1, v2):
            """Two-sided linedef with room `a` on the right (front)."""
            ra, rb = self.rooms[a], self.rooms[b]
            fs = self._add_side(
                a, upper=ra.upper_tex, lower=ra.lower_tex, middle=ra.mid_tex
            )
            bs = self._add_side(
                b, upper=rb.upper_tex, lower=rb.lower_tex, middle=rb.mid_tex
            )
            li = len(self.lines)
            self.lines.append(
                _Line(self._v(*v1), self._v(*v2), TWOSIDED | ra.peg_flags, fs, bs)
            )
            return li

        for a in range(n):
            ra = self.rooms[a]
            for b in range(n):
                if a == b:
                    continue
                rb = self.rooms[b]
                # a's east edge touching b's west edge (each pair seen once)
                if ra.x1 == rb.x0:
                    lo, hi = max(ra.y0, rb.y0), min(ra.y1, rb.y1)
                    if lo < hi:
                        note(a, "e", b, "w", lo, hi)
                        # linedef direction -y so A (west) is on the right
                        li = make_portal(a, b, (ra.x1, hi), (ra.x1, lo))
                        portal_line[(a, b, lo, hi)] = li
                        portal_line[(b, a, lo, hi)] = li
                # a's north edge touching b's south edge
                if ra.y1 == rb.y0:
                    lo, hi = max(ra.x0, rb.x0), min(ra.x1, rb.x1)
                    if lo < hi:
                        note(a, "n", b, "s", lo, hi)
                        # direction +x so A (south) is on the right
                        li = make_portal(a, b, (lo, ra.y1), (hi, ra.y1))
                        portal_line[(a, b, lo, hi)] = li
                        portal_line[(b, a, lo, hi)] = li

        # walk each room clockwise, fragmenting edges by the shared pieces
        for i, r in enumerate(self.rooms):
            for edge in ("n", "e", "s", "w"):
                lo_all, hi_all = self._edge_intervals(r, edge)
                pieces = sorted(shared.get((i, edge), []))
                cw = edge in ("n", "w")  # CW walk goes +coord on n/w edges
                frags: list[tuple[int, int, int | None]] = []
                cursor = lo_all
                for lo, hi, other in pieces:
                    if lo > cursor:
                        frags.append((cursor, lo, None))
                    frags.append((lo, hi, other))
                    cursor = hi
                if cursor < hi_all:
                    frags.append((cursor, hi_all, None))
                if not cw:
                    frags = frags[::-1]
                for lo, hi, other in frags:
                    self._emit_edge(i, r, edge, lo, hi, other, portal_line)

    def _emit_edge(self, i, r, edge, lo, hi, other, portal_line) -> None:
        """Emit the seg (and linedef for solid pieces) for one edge fragment."""
        # CW endpoints of the fragment, interior on the right
        if edge == "n":
            a, b = (lo, r.y1), (hi, r.y1)
        elif edge == "e":
            a, b = (r.x1, hi), (r.x1, lo)
        elif edge == "s":
            a, b = (hi, r.y0), (lo, r.y0)
        else:  # w
            a, b = (r.x0, lo), (r.x0, hi)
        va, vb = self._v(*a), self._v(*b)

        if other is None:
            side = self._add_side(i, middle=r.wall_tex)
            li = len(self.lines)
            self.lines.append(_Line(va, vb, r.peg_flags, side, -1))
            direction = 0
        else:
            li = portal_line[(i, other, lo, hi)]
            line = self.lines[li]
            direction = 0 if (line.v1 == va and line.v2 == vb) else 1

        seg = _Seg(va, vb, li, direction, 0)
        self.room_segs[i].append(len(self.segs))
        self.segs.append(seg)

    # -- BSP ------------------------------------------------------------------
    def build_bsp(self, unbalanced: bool = False) -> None:
        """Guillotine splits over rooms; each room is one convex subsector.

        ``unbalanced=True`` picks the MOST lopsided valid split instead of
        the most balanced one, producing a path-shaped tree of depth
        len(rooms)-1 for a corridor of rooms — the deep-BSP fixture for
        camera.traversal_rank's two-word (depth > 31) path.
        """
        # re-pack segs so each subsector's segs are contiguous
        new_segs: list[_Seg] = []
        for i in range(len(self.rooms)):
            first = len(new_segs)
            for s in self.room_segs[i]:
                new_segs.append(self.segs[s])
            self.subsectors.append((len(new_segs) - first, first))
        self.segs = new_segs

        def bbox(ixs):
            xs0 = min(self.rooms[i].x0 for i in ixs)
            ys0 = min(self.rooms[i].y0 for i in ixs)
            xs1 = max(self.rooms[i].x1 for i in ixs)
            ys1 = max(self.rooms[i].y1 for i in ixs)
            return xs0, ys0, xs1, ys1

        NODE_IS_SUBSECTOR = 1 << 15

        def recurse(ixs: list[int]) -> int:
            if len(ixs) == 1:
                return ixs[0] | NODE_IS_SUBSECTOR
            x0, y0, x1, y1 = bbox(ixs)
            best = None
            for c in sorted({v for i in ixs for v in (self.rooms[i].x0, self.rooms[i].x1)}):
                if not (x0 < c < x1):
                    continue
                if any(self.rooms[i].x0 < c < self.rooms[i].x1 for i in ixs):
                    continue
                west = [i for i in ixs if self.rooms[i].x1 <= c]
                east = [i for i in ixs if self.rooms[i].x0 >= c]
                if west and east:
                    score = abs(len(west) - len(east))
                    if unbalanced:
                        score = -score
                    if best is None or score < best[0]:
                        best = (score, "x", c, west, east)
            for c in sorted({v for i in ixs for v in (self.rooms[i].y0, self.rooms[i].y1)}):
                if not (y0 < c < y1):
                    continue
                if any(self.rooms[i].y0 < c < self.rooms[i].y1 for i in ixs):
                    continue
                south = [i for i in ixs if self.rooms[i].y1 <= c]
                north = [i for i in ixs if self.rooms[i].y0 >= c]
                if south and north:
                    score = abs(len(south) - len(north))
                    if unbalanced:
                        score = -score
                    if best is None or score < best[0]:
                        best = (score, "y", c, north, south)
            if best is None:
                raise ValueError("room layout is not guillotine-partitionable")
            _, axis, c, left_set, right_set = best
            # vertical split x=c, partition dir +y: left=west, right=east
            # horizontal split y=c, partition dir +x: left=north, right=south
            left = recurse(left_set)
            right = recurse(right_set)

            def child_box(ixs_or_child, ixs_set):
                bx0, by0, bx1, by1 = bbox(ixs_set)
                return (by1, by0, bx0, bx1)  # top, bottom, left, right

            if axis == "x":
                part = (c, y0, 0, y1 - y0)
            else:
                part = (x0, c, x1 - x0, 0)
            self.nodes.append(
                (part, child_box(right, right_set), child_box(left, left_set),
                 right, left)
            )
            return len(self.nodes) - 1

        recurse(list(range(len(self.rooms))))

    # -- lump serialization ----------------------------------------------------
    def lumps(self) -> dict[str, bytes]:
        th = b"".join(
            struct.pack("<5h", t.x, t.y, t.angle, t.type, t.flags)
            for t in self.things
        )
        ld = b"".join(
            struct.pack(
                "<7h", l.v1, l.v2, l.flags, 0, 0, l.front_side, l.back_side
            )
            for l in self.lines
        )
        sd = b""
        for s in self.sides:
            sd += struct.pack("<2h", s.x_off, s.y_off)
            for tex in (s.upper, s.lower, s.middle):
                sd += tex.upper().encode().ljust(8, b"\0")
            sd += struct.pack("<h", s.sector)
        vx = b"".join(struct.pack("<2h", x, y) for x, y in self.verts)

        def bam(dx, dy):
            return int(math.atan2(dy, dx) / (2 * math.pi) * 65536) & 0xFFFF

        sg = b""
        for s in self.segs:
            (x1, y1), (x2, y2) = self.verts[s.v1], self.verts[s.v2]
            a = bam(x2 - x1, y2 - y1)
            sg += struct.pack(
                "<2hHh2h", s.v1, s.v2, a, s.linedef, s.direction, s.offset
            )
        ss = b"".join(struct.pack("<2h", c, f) for c, f in self.subsectors)
        nd = b""
        for part, rbox, lbox, rchild, lchild in self.nodes:
            nd += struct.pack("<4h", *part)
            nd += struct.pack("<4h", *rbox)
            nd += struct.pack("<4h", *lbox)
            nd += struct.pack("<2h", _as_i16(rchild), _as_i16(lchild))
        sc = b""
        for r in self.rooms:
            sc += struct.pack("<2h", r.floor_h, r.ceil_h)
            sc += r.floor_flat.upper().encode().ljust(8, b"\0")
            sc += r.ceil_flat.upper().encode().ljust(8, b"\0")
            sc += struct.pack("<3h", r.light, r.special, r.tag)
        return {
            "THINGS": th, "LINEDEFS": ld, "SIDEDEFS": sd, "VERTEXES": vx,
            "SEGS": sg, "SSECTORS": ss, "NODES": nd, "SECTORS": sc,
            "REJECT": b"", "BLOCKMAP": b"",
        }


def _as_i16(v: int) -> int:
    return v - 65536 if v >= 32768 else v


# ---------------------------------------------------------------------------
# Procedural assets
# ---------------------------------------------------------------------------

def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def make_flat(seed: int, base: int, spread: int = 24) -> np.ndarray:
    """A deterministic 64x64 flat with visible structure."""
    yy, xx = np.mgrid[0:FLAT_SIZE, 0:FLAT_SIZE]
    checker = ((xx // 8) + (yy // 8)) % 2
    noise = _rng(seed).integers(0, spread // 2, (FLAT_SIZE, FLAT_SIZE))
    return ((base + checker * (spread // 2) + noise) % 256).astype(np.uint8)


def make_wall_patch(seed: int, w: int, h: int, base: int) -> np.ndarray:
    """An opaque brick-like patch."""
    yy, xx = np.mgrid[0:h, 0:w]
    brick = ((yy // 16) * 3 + ((xx + (yy // 16) * 8) // 32)) % 5
    noise = _rng(seed).integers(0, 6, (h, w))
    return ((base + brick * 7 + noise) % 256).astype(np.uint8)


def make_grate(w: int = 64, h: int = 64) -> tuple[np.ndarray, np.ndarray]:
    """A masked (partially transparent) patch for two-sided mid textures."""
    yy, xx = np.mgrid[0:h, 0:w]
    mask = ((xx % 8) < 3) | ((yy % 8) < 3)
    pix = np.full((h, w), 40, dtype=np.uint8) + (xx % 8).astype(np.uint8)
    return pix, mask


def make_sky_patch(w: int = 256, h: int = 128) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return ((200 + (yy // 8) + ((xx // 16) % 4)) % 256).astype(np.uint8)


def make_sprite(seed: int, w: int, h: int, base: int) -> tuple[np.ndarray, np.ndarray]:
    """A blobby sprite with transparent corners."""
    yy, xx = np.mgrid[0:h, 0:w]
    cx, cy = (w - 1) / 2, (h - 1) / 2
    r = ((xx - cx) / (w / 2)) ** 2 + ((yy - cy) / (h / 2)) ** 2
    mask = r <= 1.0
    pix = ((base + (r * 20).astype(np.int64)) % 256).astype(np.uint8)
    return pix, mask


SPRITE_SHAPES = {
    # name -> (frames, w, h, base color)
    "BAR1": (2, 23, 32, 100),
    "BEXP": (5, 40, 40, 160),
    "BON1": (4, 14, 18, 60),
    "COLU": (1, 17, 48, 80),
    "CAND": (1, 8, 14, 220),
    "POL5": (1, 28, 10, 130),  # pile of skulls / gibs: static decoration
}


# the doom1-asset-scale flat roster (VERDICT r4 #6): every hardcoded
# animation cycle from the reference (flats.rs:30-75) plus static
# fillers — ~51 flats total, matching real doom1's ~50+ so the paint
# kernel's flat windows / per-tile flat strategy is exercised at the
# asset scale a real IWAD brings (the e1m1-scale fixture has only 8
# non-sky flats, where a static all-flats loop is nearly free).
RICH_ANIM_FLATS = [
    "FWATER1", "FWATER2", "FWATER3", "FWATER4",
    "SWATER1", "SWATER2", "SWATER3", "SWATER4",
    "LAVA1", "LAVA2", "LAVA3", "LAVA4",
    "BLOOD1", "BLOOD2", "BLOOD3",
    "RROCK05", "RROCK06", "RROCK07", "RROCK08",
    "SLIME01", "SLIME02", "SLIME03", "SLIME04",
    "SLIME05", "SLIME06", "SLIME07", "SLIME08",
    "SLIME09", "SLIME10", "SLIME11", "SLIME12",
]
RICH_STATIC_FLATS = [f"MFLR8_{i}" for i in range(1, 12)]


def standard_assets(builder: WadBuilder, rich: bool = False) -> None:
    """Add palette, flats, textures and sprites shared by all synthetic
    WADs.  rich=True adds the doom1-asset-scale roster: ~51 flats (all
    9 reference animation cycles + static fillers) and a TEXTURE2 lump
    (textures.rs:141-148 reads it when present)."""
    pal = default_palette()
    builder.add("PLAYPAL", encode_playpal(pal))
    builder.add("COLORMAP", encode_colormap(pal))

    # flats (looked up by plain name, reference flats.rs:117)
    flats = {
        "FLOOR1": make_flat(1, 16), "FLOOR2": make_flat(2, 48),
        "CEIL1": make_flat(3, 90), "CEIL2": make_flat(4, 120),
        "NUKAGE1": make_flat(5, 140), "NUKAGE2": make_flat(6, 150),
        "NUKAGE3": make_flat(7, 160),
        "F_SKY1": make_flat(8, 0),
        "STEP1": make_flat(9, 70),
    }
    if rich:
        for i, name in enumerate(RICH_ANIM_FLATS):
            flats[name] = make_flat(100 + i, 20 + (i * 5) % 200)
        for i, name in enumerate(RICH_STATIC_FLATS):
            flats[name] = make_flat(200 + i, 30 + (i * 17) % 190)
    for name, pix in flats.items():
        builder.add(name, encode_flat(pix))

    # patches + textures
    pwall = make_wall_patch(11, 64, 128, 33)
    pstep = make_wall_patch(12, 64, 64, 75)
    pgrate, grate_mask = make_grate()
    psky = make_sky_patch()
    pwide = make_wall_patch(13, 64, 128, 110)
    opaque = lambda a: np.ones_like(a, dtype=bool)
    builder.add("PWALL", encode_picture(pwall, opaque(pwall)))
    builder.add("PSTEP", encode_picture(pstep, opaque(pstep)))
    builder.add("PGRATE", encode_picture(pgrate, grate_mask))
    builder.add("PSKY", encode_picture(psky, opaque(psky)))
    builder.add("PWIDE", encode_picture(pwide, opaque(pwide)))
    pnames = ["PWALL", "PSTEP", "PGRATE", "PSKY", "PWIDE"]
    builder.add("PNAMES", encode_pnames(pnames))
    builder.add(
        "TEXTURE1",
        encode_texture1([
            {"name": "WALL1", "width": 64, "height": 128,
             "patches": [(0, 0, 0)]},
            # a two-patch composite texture to exercise patch composition
            {"name": "WALL2", "width": 128, "height": 128,
             "patches": [(0, 0, 0), (64, 0, 0)]},
            {"name": "STEP1", "width": 64, "height": 64,
             "patches": [(0, 0, 1)]},
            {"name": "GRATE", "width": 64, "height": 64,
             "patches": [(0, 0, 2)]},
            {"name": "SKY1", "width": 256, "height": 128,
             "patches": [(0, 0, 3)]},
            # negative patch origins + overlap + clipping, like real
            # doom1.wad composites (textures.rs:74-103): p0 hangs off the
            # top-left, p1 overlaps it, p2 fills the bottom band — every
            # texel is covered, so the texture stays wall-opaque
            {"name": "WALL3", "width": 64, "height": 128,
             "patches": [(-16, -24, 0), (32, 0, 0), (0, 96, 1)]},
            # a 256-wide wall texture (stock doom1/doom2 have these);
            # levels using it on wall pieces exercise the paint kernel's
            # wide-texture two-half select (DeviceLevel.texq_wide).  The
            # halves differ (PWALL|PWIDE vs PWIDE|PWALL) so fetching the
            # wrong half shows up in parity.
            {"name": "WIDE1", "width": 256, "height": 128,
             "patches": [(0, 0, 0), (64, 0, 4), (128, 0, 4), (192, 0, 0)]},
        ]),
    )
    if rich:
        # TEXTURE2 definitions compose from the same PNAMES space
        # exactly like TEXTURE1 (textures.rs:141-148, 208-255);
        # T2WIDE differs from WIDE1's half layout so fetching the wrong
        # list (or skipping TEXTURE2) shows up in parity
        builder.add(
            "TEXTURE2",
            encode_texture1([
                {"name": "T2WALL", "width": 64, "height": 128,
                 "patches": [(0, 0, 4)]},
                # negative-origin overlap like WALL3, but every texel
                # covered (PWALL spans the right half full-height) so
                # the texture stays wall-opaque and paint-eligible
                {"name": "T2COMP", "width": 128, "height": 128,
                 "patches": [(0, 0, 4), (48, -16, 0), (64, 0, 0),
                             (96, 64, 1)]},
                {"name": "T2WIDE", "width": 256, "height": 128,
                 "patches": [(0, 0, 4), (64, 0, 0), (128, 0, 0),
                             (192, 0, 4)]},
            ]),
        )

    # sprites live between S_START and S_END (reference wad.rs:105-106)
    builder.add("S_START")
    for name, (frames, w, h, base) in SPRITE_SHAPES.items():
        for f in range(frames):
            pix, mask = make_sprite(hash(name) % 1000 + f, w, h, base + 10 * f)
            builder.add(
                f"{name}{chr(ord('A') + f)}0",
                encode_picture(pix, mask, left_offset=w // 2, top_offset=h),
            )
    # an 8-rotation monster sprite stored doom1-style as split mirrored
    # pairs (POSSA1, POSSA2A8, POSSA3A7, POSSA4A6, POSSA5 — rotations
    # 6-8 come from mirroring 4-2, sprites.rs:35-57).  Frames A and B
    # because S_POSS_STND alternates them.  Pictures are asymmetric so a
    # wrong/missing mirror is visible in parity.
    for f in range(2):
        fl = chr(ord("A") + f)
        w, h = 30, 44

        def poss_pic(rot, f=f, w=w, h=h):
            pix, mask = make_sprite(900 + f * 16 + rot, w, h, 40 + 6 * rot)
            pix = pix.copy()
            pix[:, : w // 3] = (
                pix[:, : w // 3].astype(np.int64) + 37 + rot
            ).astype(np.uint8)
            return pix, mask

        kw = dict(left_offset=w // 2, top_offset=h)
        builder.add(f"POSS{fl}1", encode_picture(*poss_pic(1), **kw))
        for r, rm in ((2, 8), (3, 7), (4, 6)):
            builder.add(
                f"POSS{fl}{r}{fl}{rm}", encode_picture(*poss_pic(r), **kw)
            )
        builder.add(f"POSS{fl}5", encode_picture(*poss_pic(5), **kw))
    builder.add("S_END")


# ---------------------------------------------------------------------------
# Canned levels
# ---------------------------------------------------------------------------

def single_room_level() -> tuple[list[RoomSpec], list[ThingSpec]]:
    """Visually a single room: two sectors with identical attributes.

    (A WAD needs at least one BSP node, hence two subsectors.)
    """
    rooms = [
        RoomSpec(0, 0, 256, 512, floor_h=0, ceil_h=128, light=200),
        RoomSpec(256, 0, 512, 512, floor_h=0, ceil_h=128, light=200),
    ]
    things = [ThingSpec(256, 128, 90, 1)]
    return rooms, things


def two_room_level() -> tuple[list[RoomSpec], list[ThingSpec]]:
    rooms = [
        RoomSpec(0, 0, 512, 512, floor_h=0, ceil_h=160, light=200),
        RoomSpec(512, 128, 1024, 384, floor_h=32, ceil_h=128, light=144,
                 floor_flat="FLOOR2", ceil_flat="CEIL2"),
    ]
    things = [ThingSpec(256, 256, 0, 1), ThingSpec(768, 256, 180, 2035)]
    return rooms, things


def demo_level() -> tuple[list[RoomSpec], list[ThingSpec]]:
    """The flagship synthetic map: portals, sky, heights, specials, things.

    Exercises every renderer feature: solid walls, upper/lower portal
    pieces, visplanes at many heights, a sky-ceiling courtyard (sky hack on
    its portals), a masked GRATE mid texture, an animated NUKAGE floor,
    light specials (flicker/strobe/glow/fire), a zero-height closed door
    sector, and unpegged texturing.
    """
    rooms = [
        # 0: start hall
        RoomSpec(0, 0, 768, 512, floor_h=0, ceil_h=160, light=208),
        # 1: east hall, lower ceiling + raised floor -> upper+lower walls
        RoomSpec(768, 128, 1280, 384, floor_h=32, ceil_h=128, light=160,
                 floor_flat="FLOOR2"),
        # 2: far east room with sky ceiling (courtyard)
        RoomSpec(1280, 0, 1792, 512, floor_h=48, ceil_h=256, light=224,
                 ceil_flat="F_SKY1"),
        # 3: north nukage pit off the start hall (animated flat, fire flicker)
        RoomSpec(128, 512, 640, 896, floor_h=-32, ceil_h=160, light=144,
                 floor_flat="NUKAGE1", special=17),
        # 4: north annex, glowing light
        RoomSpec(128, 896, 640, 1152, floor_h=0, ceil_h=128, light=192,
                 special=8, peg_flags=DONTPEGBOTTOM),
        # 5: south corridor with masked grate portal, strobe light
        RoomSpec(256, -384, 512, 0, floor_h=0, ceil_h=96, light=176,
                 special=2, mid_tex="GRATE"),
        # 6: south chamber, flickering light
        RoomSpec(0, -768, 768, -384, floor_h=-16, ceil_h=112, light=128,
                 special=1, floor_flat="FLOOR2", ceil_flat="CEIL2"),
        # 7: zero-height closed door sector east of courtyard approach
        RoomSpec(1792, 192, 1824, 320, floor_h=64, ceil_h=64, light=96),
        # 8: sealed room behind the door
        RoomSpec(1824, 192, 2080, 320, floor_h=64, ceil_h=192, light=160),
    ]
    things = [
        ThingSpec(384, 256, 0, 1),        # player 1 start
        ThingSpec(960, 256, 180, 2035),   # barrel
        ThingSpec(1100, 300, 180, 2035),  # barrel
        ThingSpec(1500, 256, 270, 2028),  # floor lamp (COLU)
        ThingSpec(1400, 120, 90, 2014),   # health bonus (animated BON1)
        ThingSpec(1650, 400, 90, 2014),
        ThingSpec(300, 700, 0, 34),       # candle in the nukage pit
        ThingSpec(400, -500, 90, 2035),   # barrel behind the grate
    ]
    return rooms, things


def wide_tex_level() -> tuple[list[RoomSpec], list[ThingSpec]]:
    """Two rooms whose walls use the 256-wide WIDE1 texture: exercises
    the paint kernel's texq_wide two-half texel fetch on solid, lower
    and upper pieces (x offsets walk u across both halves)."""
    rooms = [
        RoomSpec(0, 0, 640, 512, floor_h=0, ceil_h=160, light=208,
                 wall_tex="WIDE1", lower_tex="WIDE1", upper_tex="WIDE1"),
        RoomSpec(640, 128, 1280, 384, floor_h=32, ceil_h=128, light=160,
                 wall_tex="WIDE1", lower_tex="WIDE1", upper_tex="WIDE1",
                 floor_flat="FLOOR2"),
    ]
    things = [ThingSpec(256, 256, 0, 1), ThingSpec(900, 256, 180, 2035)]
    return rooms, things


def sky_hack_level() -> tuple[list[RoomSpec], list[ThingSpec]]:
    """Two adjacent sky-ceiling courtyards with different ceiling heights
    (exercises the sky hack, segs.rs:459-477) plus a DONTPEGTOP portal."""
    rooms = [
        RoomSpec(0, 0, 512, 512, floor_h=0, ceil_h=256, light=208,
                 ceil_flat="F_SKY1"),
        RoomSpec(512, 64, 1024, 448, floor_h=24, ceil_h=192, light=176,
                 ceil_flat="F_SKY1", floor_flat="FLOOR2",
                 peg_flags=DONTPEGTOP),
        # indoor room south of the first courtyard (normal ceiling, so its
        # shared edge draws an upper wall against the sky sector)
        RoomSpec(128, -384, 384, 0, floor_h=-16, ceil_h=120, light=144,
                 ceil_flat="CEIL2", peg_flags=DONTPEGTOP | DONTPEGBOTTOM),
    ]
    things = [ThingSpec(256, 256, 0, 1), ThingSpec(700, 256, 180, 2035)]
    return rooms, things


def grid_level(
    n_rows: int,
    n_cols: int,
    seed: int = 0,
    cell: int = 192,
    brick: bool = True,
    things_per_room: float = 1.0,
    floor_flats: list[str] | None = None,
    ceil_flats: list[str] | None = None,
    wall_texes: list[str] | None = None,
) -> tuple[list[RoomSpec], list[ThingSpec]]:
    """A deterministic rows x cols room grid at configurable scale.

    Odd rows are brick-offset by half a cell so every north/south edge
    fragments against two neighbors — this pushes the seg count per room
    toward real-map density (e1m1: 475 linedefs / 747 segs / 85 sectors,
    reference src/map/mod.rs:48-78).  Exercises every sector feature:
    portals with upper+lower walls, sky ceilings (incl. adjacent-sky
    hack), animated nukage floors, masked GRATE mids, zero-height closed
    sectors, unpegged texturing and all eight light-special types
    (thinkers.rs:14-80).
    """
    rng = np.random.default_rng(seed)
    specials = [0, 0, 0, 1, 2, 3, 4, 8, 12, 13, 17]
    floor_flats = floor_flats or ["FLOOR1", "FLOOR2", "STEP1", "NUKAGE1"]
    ceil_flats = ceil_flats or ["CEIL1", "CEIL2", "CEIL1",
                                "F_SKY1", "F_SKY1"]
    wall_texes = wall_texes or ["WALL1", "WALL2", "STEP1"]
    rooms: list[RoomSpec] = []
    things: list[ThingSpec] = [
        ThingSpec(cell // 2, cell // 2, 0, 1)          # player 1 start
    ]
    deco = [2035, 2014, 2028, 34]  # barrel / bonus / lamp / candle
    for gy in range(n_rows):
        if brick and gy % 2 == 1:
            xs = [0] + [
                c * cell + cell // 2 for c in range(1, n_cols)
            ] + [n_cols * cell]
        else:
            xs = [c * cell for c in range(n_cols + 1)]
        y0, y1 = gy * cell, (gy + 1) * cell
        for c in range(len(xs) - 1):
            x0, x1 = xs[c], xs[c + 1]
            ri = len(rooms)
            # a sprinkle of zero-height closed "door" sectors (never
            # containing things or the start), segs.rs:222-225
            closed = ri % 37 == 19
            floor_h = int(rng.integers(-4, 7)) * 8
            ceil_h = floor_h if closed else int(rng.integers(13, 33)) * 8
            rooms.append(RoomSpec(
                x0, y0, x1, y1,
                floor_h=floor_h, ceil_h=ceil_h,
                light=int(rng.integers(96, 256)),
                floor_flat=floor_flats[
                    int(rng.integers(0, len(floor_flats)))
                ],
                ceil_flat=ceil_flats[int(rng.integers(0, len(ceil_flats)))],
                special=specials[int(rng.integers(0, len(specials)))],
                wall_tex=wall_texes[int(rng.integers(0, len(wall_texes)))],
                mid_tex=["-", "-", "-", "GRATE"][int(rng.integers(0, 4))],
                peg_flags=[0, DONTPEGBOTTOM, DONTPEGTOP,
                           DONTPEGBOTTOM | DONTPEGTOP][int(rng.integers(0, 4))],
            ))
            if not closed:
                n_things = int(rng.random() < things_per_room) + int(
                    rng.random() < things_per_room - 0.5
                )
                for _ in range(n_things):
                    things.append(ThingSpec(
                        x0 + int(rng.integers(36, max(37, x1 - x0 - 36))),
                        y0 + int(rng.integers(36, cell - 36)),
                        int(rng.integers(0, 360)),
                        deco[int(rng.integers(0, len(deco)))],
                    ))
    return rooms, things


def e1m1_scale_level() -> tuple[list[RoomSpec], list[ThingSpec]]:
    """The benchmark/parity fixture at real-map scale.

    Matches or exceeds doom1.wad e1m1's structural counts (85 sectors /
    747 segs / ~140 things, reference src/map/mod.rs:48-78) so bench and
    parity numbers are measured at the scale the north-star metric names.
    """
    return grid_level(10, 13, seed=101, things_per_room=1.2)


def doom1_scale_level() -> tuple[list[RoomSpec], list[ThingSpec]]:
    """The doom1-ASSET-scale fixture (VERDICT r4 #6): e1m1-class
    geometry (12x14 grid, deeper BSP than the 10x13 e1m1_scale grid)
    whose rooms draw from the FULL rich-asset roster — ~50 flats (all
    9 reference animation cycles, flats.rs:30-75), TEXTURE2 walls and
    256-wide composites — so calibrate/paint/parity run at real-IWAD
    asset scale, where per-(tile, block) distinct-flat counts exceed
    the census's KF<=6 and the TEXTURE2 path actually executes."""
    return grid_level(
        12, 14, seed=404, things_per_room=1.0,
        floor_flats=(["FLOOR1", "FLOOR2", "STEP1"] + RICH_ANIM_FLATS
                     + RICH_STATIC_FLATS),
        ceil_flats=(["CEIL1", "CEIL2", "F_SKY1", "F_SKY1"]
                    + RICH_STATIC_FLATS[:6]),
        wall_texes=["WALL1", "WALL2", "STEP1", "WALL3", "WIDE1",
                    "T2WALL", "T2COMP", "T2WIDE"],
    )


def big_level() -> tuple[list[RoomSpec], list[ThingSpec]]:
    """A >2047-seg map proving the span packing has no seg cap."""
    return grid_level(22, 26, seed=202, things_per_room=0.05)


def huge_level() -> tuple[list[RoomSpec], list[ThingSpec]]:
    """An ~8k-seg map (2.4x big_level): proves the paint kernel serves
    maps far beyond paint_max_segs when a live capacity bounds the
    per-(tile, block) packs (frame.paint_available), with live counts
    still small — the per-column wall is scene depth, not map size.
    The reference renders any size through one path
    (src/renderer/segs.rs:353-590)."""
    return grid_level(36, 40, seed=303, things_per_room=0.02)


def deep_level() -> tuple[list[RoomSpec], list[ThingSpec]]:
    """A 1x45 corridor; built with unbalanced_bsp=True its BSP is a
    depth-44 path, exercising camera.traversal_rank's two-word
    (depth > 31) key.  The reference has no depth limit
    (src/map/nodes.rs:45-83)."""
    return grid_level(1, 45, seed=7, brick=False, things_per_room=0.2)


def deep_wad() -> bytes:
    return build_wad(*deep_level(), unbalanced_bsp=True)


def build_wad(
    rooms, things, map_name: str = "E1M1", unbalanced_bsp: bool = False,
    rich: bool = False,
) -> bytes:
    b = WadBuilder("IWAD")
    standard_assets(b, rich=rich)
    lb = LevelBuilder(rooms, things)
    lb.build_walls()
    lb.build_bsp(unbalanced=unbalanced_bsp)
    lumps = lb.lumps()
    b.add(map_name)
    for lump_name in ("THINGS", "LINEDEFS", "SIDEDEFS", "VERTEXES", "SEGS",
                      "SSECTORS", "NODES", "SECTORS", "REJECT", "BLOCKMAP"):
        b.add(lump_name, lumps[lump_name])
    return b.build()


def single_room_wad() -> bytes:
    return build_wad(*single_room_level())


def two_room_wad() -> bytes:
    return build_wad(*two_room_level())


def demo_wad() -> bytes:
    return build_wad(*demo_level())


def wide_tex_wad() -> bytes:
    return build_wad(*wide_tex_level())


def sky_hack_wad() -> bytes:
    return build_wad(*sky_hack_level())


def decoder_level() -> tuple[list[RoomSpec], list[ThingSpec]]:
    """Exercises the real-WAD decoder shapes: WALL3 (negative-origin
    overlapping multi-patch composite) on every wall and a ring of
    8-rotation POSS monsters (doomednum 3004) around the player, so
    every rotation (incl. the mirrored 6-8) renders."""
    rooms = [
        RoomSpec(0, 0, 768, 768, floor_h=0, ceil_h=160, light=208,
                 wall_tex="WALL3", lower_tex="WALL3", upper_tex="WALL3"),
        RoomSpec(768, 192, 1024, 576, floor_h=32, ceil_h=128, light=160,
                 wall_tex="WALL3", lower_tex="WALL3", upper_tex="WALL3"),
    ]
    cx, cy, r = 384, 384, 230
    things = [ThingSpec(cx, cy, 0, 1)]
    for i in range(8):
        a = i * 45
        x = cx + int(r * math.cos(math.radians(a)))
        y = cy + int(r * math.sin(math.radians(a)))
        # face the ring outward at varied angles so the player sees all
        # eight rotation indices (renderer/map_objects.rs:53-67)
        things.append(ThingSpec(x, y, (a * 3 + 45) % 360, 3004))
    return rooms, things


def decoder_wad() -> bytes:
    return build_wad(*decoder_level())


def e1m1_scale_wad() -> bytes:
    return build_wad(*e1m1_scale_level())


def doom1_scale_wad() -> bytes:
    return build_wad(*doom1_scale_level(), rich=True)


def big_wad() -> bytes:
    return build_wad(*big_level())
