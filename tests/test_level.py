"""Map tables + BSP derivation tests (layer L1)."""

import numpy as np

from doomtpu.level.tables import NODE_IS_SUBSECTOR
from doomtpu.wad import synth
from doomtpu.wad.reader import WadFile
from doomtpu.level.tables import MapTables


def test_counts_consistent(demo_level):
    t = demo_level.tables
    c = t.counts
    assert c["sectors"] == 9 and c["subsectors"] == 9
    assert c["nodes"] == 8  # n rooms - 1 guillotine splits
    assert (t.sub_nseg > 0).all()
    # seg ranges tile the seg list
    assert (t.sub_first + t.sub_nseg).max() == c["segs"]


def test_player_start(demo_level):
    pos, ang = demo_level.tables.player_start()
    assert tuple(pos) == (384.0, 256.0)
    assert ang == 0.0


def test_point_location_matches_room_rects(demo_level):
    """sector_at agrees with brute-force rectangle containment."""
    t = demo_level.tables
    rooms, _ = synth.demo_level()
    rng = np.random.default_rng(0)
    for _ in range(200):
        ri = rng.integers(0, len(rooms))
        r = rooms[ri]
        x = rng.uniform(r.x0 + 1, r.x1 - 1)
        y = rng.uniform(r.y0 + 1, r.y1 - 1)
        assert t.sector_at(x, y) == ri


def test_paths_reach_every_subsector(demo_level):
    t = demo_level.tables
    assert (t.sub_depth >= 1).all()
    # walking each recorded path reaches the recorded subsector
    for s in range(len(t.sub_nseg)):
        node = t.root_node
        for d in range(t.sub_depth[s]):
            assert t.sub_path_nodes[s, d] == node
            side = int(t.sub_path_left[s, d])
            node = int(t.node_child[node, side]) & 0xFFFF
        assert node & NODE_IS_SUBSECTOR
        assert (node & (NODE_IS_SUBSECTOR - 1)) == s


def test_sub_sector_facing(demo_level):
    """Each subsector's sector comes from its first facing sidedef
    (renderer/bsp.rs:26-40)."""
    t = demo_level.tables
    assert (t.sub_sector >= 0).all()
    for s in range(len(t.sub_nseg)):
        g = int(t.sub_first[s])
        side = t.line_sides[t.seg_line[g], t.seg_dir[g]]
        assert t.side_sector[side] == t.sub_sector[s]


def test_portal_heights(two_level):
    t = two_level.tables
    # the two-room map has exactly one two-sided linedef
    two_sided = (t.line_sides[:, 1] >= 0).sum()
    assert two_sided == 1


def test_bbox(demo_level):
    t = demo_level.tables
    left, right, top, bottom = t.bbox
    assert left == 0.0 and right == 2080.0
    assert top == -768.0 and bottom == 1152.0
