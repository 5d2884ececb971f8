"""Paint-kernel parity on CPU (interpret mode).

ops/pallas_paint.py is the TPU fast path: walls/planes/sky painted (and
shaded) inside the occlusion-scan kernel, mid/clip pools for the
deferred pass.  The tests run in strict-FP mode (conftest default): the
kernel routes every parity-critical product through jmath.smul, so in
interpret mode each output is bit-identical to the XLA pipeline
(wall_scan + resolve + shade) BY CONSTRUCTION — not by hoping XLA:CPU
makes the same FMA-contraction choice in both lowerings (it does not:
a plain-f32 run flips `as i16` truncations at span boundaries, e.g. the
rx = -280.99998697 ceiling texel found during bring-up).  On TPU
(strict off) the only permitted deviation is FMA contraction (header).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doomtpu.config import RenderConfig
from doomtpu.render import camera as cam, jmath, resolve as res, things, walls
from doomtpu.render.device import DeviceLevel
from doomtpu.wad import synth

VIEWS = [
    (384.0, 256.0, 0.0),
    (900.0, 256.0, 2.5),
    (300.0, 700.0, 4.6),
    (384.0, 256.0, 3.1),
]


@pytest.fixture(scope="module")
def setup(demo_level):
    level = DeviceLevel.build(
        demo_level.tables, demo_level.assets, demo_level.info
    )
    assert level.paint_ok
    return level


def _state(demo_level, views, B=None):
    t = demo_level.tables
    B = len(views)
    px = jnp.asarray([v[0] for v in views], jnp.float32)
    py = jnp.asarray([v[1] for v in views], jnp.float32)
    pa = jnp.asarray([v[2] for v in views], jnp.float32)
    fh = jnp.asarray(
        [float(t.sector_floor_h[t.sector_at(v[0], v[1])]) for v in views],
        jnp.float32,
    )
    sl = jnp.asarray(t.sector_light, jnp.int32)[None].repeat(B, 0)
    ts = jnp.full(B, 0.4, jnp.float32)
    return px, py, pa, fh, sl, ts


@pytest.mark.parametrize("nviews", [4, 8])
def test_paint_walls_planes_bit_exact(setup, demo_level, config, nviews):
    """nviews=4 exercises the TB=4 camera tile, nviews=8 the TB=8 one."""
    from doomtpu.ops.pallas_paint import LD_SKY, render_paint

    level = setup
    views = (VIEWS * 2)[:nviews]
    px, py, pa, fh, sl, ts = _state(demo_level, views)
    frame = cam.build_seg_frame(level, config, px, py, pa, fh, sl, ts)
    order = cam.seg_order(level, cam.traversal_rank(level, px, py))

    pool, cnt, _ = walls.wall_scan(level, config, frame, order)
    idx_r, light_r, dist_r, sky_r = res.resolve_frame(
        level, config, frame, pool, cnt, px, py, pa, fh
    )
    rgb_r = res.shade(level, idx_r, light_r, dist_r, sky_r, onehot=False)

    # unroll=1/gsub=2: identical outputs for any unroll; the XLA:CPU
    # compile of the interpret program scales with the unrolled body
    # (production U=4/GSUB=8 costs minutes per variant — covered once in
    # test_paint_full_frame_bit_exact)
    out = render_paint(
        level, config, frame, order, pa, px, py, fh, interpret=True,
        unroll=1, gsub=2,
    )
    ld = np.asarray(out["ld"])
    idx_r = np.asarray(idx_r)
    wr = idx_r >= 0
    np.testing.assert_array_equal(np.asarray(out["idx"]), idx_r)
    np.testing.assert_array_equal(
        ((ld >> 16) & 0xFF)[wr], np.asarray(light_r)[wr]
    )
    np.testing.assert_array_equal(
        (ld & 0xFFFF)[wr], (np.asarray(dist_r) & 0xFFFF)[wr]
    )
    np.testing.assert_array_equal((ld & LD_SKY) != 0, np.asarray(sky_r))
    np.testing.assert_array_equal(np.asarray(out["rgb"]), np.asarray(rgb_r))
    assert int(np.asarray(out["overflow"]).max()) == 0


def test_paint_stream_bit_exact(setup, demo_level, config, monkeypatch):
    """Streaming seg-pack mode (DOOMTPU_PAINT_STREAM: grid drops its
    seg dimension; the kernel double-buffer DMAs U*GSUB-seg chunks from
    HBM) == the grid-blocked kernel, bit for bit.  unroll=1/gsub=2
    keeps the interpret compile fast while still exercising multiple
    chunks per (tile, block) and the partial last chunk."""
    from doomtpu.ops import pallas_paint as pp

    level = setup
    px, py, pa, fh, sl, ts = _state(demo_level, VIEWS)
    frame = cam.build_seg_frame(level, config, px, py, pa, fh, sl, ts)
    order = cam.seg_order(level, cam.traversal_rank(level, px, py))

    ref = pp.render_paint(
        level, config, frame, order, pa, px, py, fh, interpret=True,
        unroll=1, gsub=2,
    )
    monkeypatch.setattr(pp, "PAINT_STREAM", True)
    out = pp.render_paint(
        level, config, frame, order, pa, px, py, fh, interpret=True,
        unroll=1, gsub=2,
    )
    for k in ("idx", "ld", "rgb", "cnt_mid", "cnt_clip", "overflow"):
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(ref[k]))
    for a, b in zip(out["midpool"], ref["midpool"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(out["clippool"], ref["clippool"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_paint_pcyb_bit_exact(setup, demo_level, config, monkeypatch):
    """Per-camera y-bounds mode (DOOMTPU_PAINT_PCYB: lane-reduced
    per-camera [lo, hi] + per-camera pl.when skips of out-of-range
    y-blocks) == the union-bounds kernel, bit for bit: every rowwork
    store is cover-masked, so a skipped y-block only ever re-stored
    unchanged values."""
    from doomtpu.ops import pallas_paint as pp

    level = setup
    px, py, pa, fh, sl, ts = _state(demo_level, VIEWS)
    frame = cam.build_seg_frame(level, config, px, py, pa, fh, sl, ts)
    order = cam.seg_order(level, cam.traversal_rank(level, px, py))

    monkeypatch.setattr(pp, "PAINT_PCYB", False)
    ref = pp.render_paint(
        level, config, frame, order, pa, px, py, fh, interpret=True,
    )
    monkeypatch.setattr(pp, "PAINT_PCYB", True)
    out = pp.render_paint(
        level, config, frame, order, pa, px, py, fh, interpret=True,
    )
    for k in ("idx", "ld", "rgb", "cnt_mid", "cnt_clip", "overflow"):
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(ref[k]))
    for a, b in zip(out["midpool"], ref["midpool"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(out["clippool"], ref["clippool"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_paint_percam_topk_bit_exact(setup, demo_level, config, monkeypatch):
    """DOOMTPU_PAINT_TOPK: the top_k partial sort must produce the
    EXACT compacted lists of the full argsort (live ascending, then
    dead ascending; distinct keys => deterministic), so every output
    is bit-identical."""
    import dataclasses
    import os

    from doomtpu.ops.pallas_paint import render_paint

    level = setup
    cfg = dataclasses.replace(
        config, paint_percam_compact=True, paint_live_capacity=16,
    )
    px, py, pa, fh, sl, ts = _state(demo_level, VIEWS)
    frame = cam.build_seg_frame(level, cfg, px, py, pa, fh, sl, ts)
    order = cam.seg_order(level, cam.traversal_rank(level, px, py))

    monkeypatch.setenv("DOOMTPU_PAINT_TOPK", "0")
    ref = render_paint(
        level, cfg, frame, order, pa, px, py, fh, interpret=True,
        unroll=1, gsub=2,
    )
    monkeypatch.setenv("DOOMTPU_PAINT_TOPK", "1")
    out = render_paint(
        level, cfg, frame, order, pa, px, py, fh, interpret=True,
        unroll=1, gsub=2,
    )
    for k in ("idx", "ld", "rgb", "cnt_mid", "cnt_clip", "overflow",
              "live_dropped"):
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(ref[k]))


def test_paint_live_reuse_bit_exact(setup, demo_level, config):
    """Cross-tick live-list reuse (render_paint reuse/want_reuse,
    PERF.md structural alt #3): rendering the SAME pose with reused
    metadata is bit-identical with live_stale == 0, and rendering a
    DIFFERENT pose against stale metadata trips the counter."""
    import dataclasses

    from doomtpu.ops.pallas_paint import render_paint

    level = setup
    cfg = dataclasses.replace(config, paint_percam_compact=True)
    px, py, pa, fh, sl, ts = _state(demo_level, VIEWS)
    frame = cam.build_seg_frame(level, cfg, px, py, pa, fh, sl, ts)
    order = cam.seg_order(level, cam.traversal_rank(level, px, py))

    ref = render_paint(
        level, cfg, frame, order, pa, px, py, fh, interpret=True,
        want_reuse=True,
    )
    out = render_paint(
        level, cfg, frame, order, pa, px, py, fh, interpret=True,
        reuse=ref["reuse"],
    )
    assert int(np.asarray(out["live_stale"])) == 0
    for k in ("idx", "ld", "rgb", "cnt_mid", "cnt_clip", "overflow"):
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(ref[k]))

    # a far-away pose set against the stale metadata: new live segs are
    # counted, never silently dropped
    views2 = [(900.0, 256.0, 2.5), (300.0, 700.0, 4.6),
              (384.0, 256.0, 3.1), (290.0, 290.0, 0.8)]
    px2, py2, pa2, fh2, sl2, ts2 = _state(demo_level, views2)
    frame2 = cam.build_seg_frame(level, cfg, px2, py2, pa2, fh2, sl2, ts2)
    out2 = render_paint(
        level, cfg, frame2, order, pa2, px2, py2, fh2, interpret=True,
        reuse=ref["reuse"],
    )
    assert int(np.asarray(out2["live_stale"])) > 0

    # an undersized cap at the REFRESH tick: the dropped segs are
    # absent from the reused lists, so even a same-pose reuse tick must
    # count them stale (reuse["live"] is the KEPT set, not the raw
    # predicate — the capped refresh would otherwise silently violate
    # the "stale==0 proves bit-identical" guarantee)
    cfg_cap = dataclasses.replace(cfg, paint_live_capacity=2)
    ref_cap = render_paint(
        level, cfg_cap, frame, order, pa, px, py, fh, interpret=True,
        unroll=1, gsub=2, want_reuse=True,
    )
    n_dropped = int(np.asarray(ref_cap["live_dropped"]))
    assert n_dropped > 0, "cap 2 must force drops on the demo views"
    out_cap = render_paint(
        level, cfg_cap, frame, order, pa, px, py, fh, interpret=True,
        unroll=1, gsub=2, reuse=ref_cap["reuse"],
    )
    assert int(np.asarray(out_cap["live_stale"])) >= n_dropped


def test_order_matches_rank(setup, demo_level):
    """cam.order_matches_rank is the exact validity predicate of a
    reused traversal order: always True for the order derived from the
    same rank, False somewhere when the pose moved across partitions."""
    level = setup
    px, py, pa, fh, sl, ts = _state(demo_level, VIEWS)
    rank = cam.traversal_rank(level, px, py)
    order = cam.seg_order(level, rank)
    ok = np.asarray(cam.order_matches_rank(level, rank, order))
    assert ok.all()

    views2 = [(900.0, 256.0, 2.5), (300.0, 700.0, 4.6),
              (384.0, 256.0, 3.1), (290.0, 290.0, 0.8)]
    px2, py2, *_ = _state(demo_level, views2)
    rank2 = cam.traversal_rank(level, px2, py2)
    ok2 = np.asarray(cam.order_matches_rank(level, rank2, order))
    assert not ok2.all()


def test_paint_planes_defer_bit_exact(setup, demo_level, config, monkeypatch):
    """Deferred plane records (DOOMTPU_PAINT_PDEFER: emissions store
    only (flat word, light|height record); _finish resolves the
    inverse projection + flat/sky texel + dist once per final pixel)
    == the immediate plane paint, bit for bit — the record fully
    determines the texel arithmetic (visplanes.rs:42-152) given the
    camera scalars, and the finish replays the exact op sequence."""
    from doomtpu.ops import pallas_paint as pp

    level = setup
    px, py, pa, fh, sl, ts = _state(demo_level, VIEWS)
    frame = cam.build_seg_frame(level, config, px, py, pa, fh, sl, ts)
    order = cam.seg_order(level, cam.traversal_rank(level, px, py))

    ref = pp.render_paint(
        level, config, frame, order, pa, px, py, fh, interpret=True,
        unroll=1, gsub=2,
    )
    monkeypatch.setattr(pp, "PAINT_PDEFER", True)
    out = pp.render_paint(
        level, config, frame, order, pa, px, py, fh, interpret=True,
        unroll=1, gsub=2,
    )
    for k in ("idx", "ld", "rgb", "cnt_mid", "cnt_clip", "overflow"):
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(ref[k]))
    for a, b in zip(out["midpool"], ref["midpool"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(out["clippool"], ref["clippool"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_paint_wide_texture_bit_exact(config, info):
    """256-wide wall textures (DeviceLevel.texq_wide two-half texel
    fetch) == the XLA pipeline, bit for bit, on a level whose wall/
    lower/upper pieces all use WIDE1 with distinct halves."""
    from doomtpu.ops.pallas_paint import render_paint
    from doomtpu.render.frame import render_frame
    from tests.conftest import Level

    lv = Level(synth.wide_tex_wad(), info)
    level = DeviceLevel.build(lv.tables, lv.assets, lv.info)
    assert level.texq_wide and level.paint_ok
    views = [
        (256.0, 256.0, 0.0), (900.0, 256.0, 3.1),
        (500.0, 300.0, 1.2), (320.0, 400.0, 5.0),
    ]
    px, py, pa, fh, sl, ts = _state(lv, views)
    mp, ma, ms = lv.spawn_mobjs()
    mstate = jnp.asarray(ms, jnp.int32)[None].repeat(len(views), 0)

    idx_r, rgb_r, _ = render_frame(
        level, config, px, py, pa, fh, sl, mstate, ts
    )
    frame = cam.build_seg_frame(level, config, px, py, pa, fh, sl, ts)
    order = cam.seg_order(level, cam.traversal_rank(level, px, py))
    out = render_paint(
        level, config, frame, order, pa, px, py, fh, interpret=True,
        unroll=1, gsub=2,
    )
    ld = out["ld"]
    from doomtpu.ops.pallas_paint import LD_SKY

    pools = things.pools_from_paint(out)
    idx_p, _, _, _, daux = things.deferred_pass(
        level, config, frame, pools, order, px, py, pa, fh, sl, mstate,
        out["idx"], (ld >> 16) & 0xFF, ((ld & 0xFFFF) << 16) >> 16,
        (ld & LD_SKY) != 0, rgb=out["rgb"],
    )
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_r))
    np.testing.assert_array_equal(np.asarray(daux["rgb"]), np.asarray(rgb_r))


def test_paint_item_kernel_large_capacity(setup, demo_level):
    """item_capacity > 8 disables the in-kernel sprite clip (one vreg
    holds only 8 slots) and falls back to the XLA clip reductions +
    clipless composite kernel — still bit-exact vs the XLA pipeline."""
    import dataclasses

    from doomtpu.render.frame import render_frame
    from doomtpu.ops.pallas_paint import LD_SKY, render_paint

    level = setup
    cfg = dataclasses.replace(RenderConfig(), item_capacity=16)
    px, py, pa, fh, sl, ts = _state(demo_level, VIEWS)
    mp, ma, ms = demo_level.spawn_mobjs()
    mstate = jnp.asarray(ms, jnp.int32)[None].repeat(len(VIEWS), 0)

    idx_r, rgb_r, _ = render_frame(level, cfg, px, py, pa, fh, sl, mstate, ts)
    frame = cam.build_seg_frame(level, cfg, px, py, pa, fh, sl, ts)
    order = cam.seg_order(level, cam.traversal_rank(level, px, py))
    out = render_paint(
        level, cfg, frame, order, pa, px, py, fh, interpret=True,
        unroll=1, gsub=2,
    )
    ld = out["ld"]
    pools = things.pools_from_paint(out)
    idx_k, _, _, _, daux_k = things.deferred_pass(
        level, cfg, frame, pools, order, px, py, pa, fh, sl, mstate,
        out["idx"], (ld >> 16) & 0xFF, ((ld & 0xFFFF) << 16) >> 16,
        (ld & LD_SKY) != 0, rgb=out["rgb"],
        item_kernel=True, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(idx_k), np.asarray(idx_r))
    np.testing.assert_array_equal(
        np.asarray(daux_k["rgb"]), np.asarray(rgb_r)
    )


def test_paint_gather_compaction_bit_exact(setup, demo_level, config):
    """The large-map slice-gather input compaction == the one-hot MXU
    path, bit for bit (paint_onehot_max_segs=0 forces the gather)."""
    from doomtpu.ops.pallas_paint import render_paint

    level = setup
    views = VIEWS[:4]
    px, py, pa, fh, sl, ts = _state(demo_level, views)
    frame = cam.build_seg_frame(level, config, px, py, pa, fh, sl, ts)
    order = cam.seg_order(level, cam.traversal_rank(level, px, py))

    import dataclasses

    cfg_g = dataclasses.replace(config, paint_onehot_max_segs=0)
    out_oh = render_paint(
        level, config, frame, order, pa, px, py, fh, interpret=True,
        unroll=1, gsub=2,
    )
    out_ga = render_paint(
        level, cfg_g, frame, order, pa, px, py, fh, interpret=True,
        unroll=1, gsub=2,
    )
    for k in ("idx", "ld", "rgb", "cnt_mid", "cnt_clip"):
        np.testing.assert_array_equal(
            np.asarray(out_oh[k]), np.asarray(out_ga[k])
        )


def test_paint_full_frame_bit_exact(setup, demo_level, config):
    """Full pipeline: paint kernel + split-pool deferred pass (sprites +
    masked mids, shaded rgb merge) == XLA render_frame."""
    from doomtpu.render.frame import render_frame
    from doomtpu.ops.pallas_paint import LD_SKY, render_paint

    level = setup
    px, py, pa, fh, sl, ts = _state(demo_level, VIEWS)
    mp, ma, ms = demo_level.spawn_mobjs()
    B = len(VIEWS)
    mstate = jnp.asarray(ms, jnp.int32)[None].repeat(B, 0)

    idx_r, rgb_r, aux_r = render_frame(
        level, config, px, py, pa, fh, sl, mstate, ts
    )

    frame = cam.build_seg_frame(level, config, px, py, pa, fh, sl, ts)
    order = cam.seg_order(level, cam.traversal_rank(level, px, py))
    out = render_paint(
        level, config, frame, order, pa, px, py, fh, interpret=True
    )
    ld = out["ld"]
    light = (ld >> 16) & 0xFF
    dist = ((ld & 0xFFFF) << 16) >> 16
    is_sky = (ld & LD_SKY) != 0
    pools = things.pools_from_paint(out)
    idx_p, _, _, _, daux = things.deferred_pass(
        level, config, frame, pools, order,
        px, py, pa, fh, sl, mstate,
        out["idx"], light, dist, is_sky, rgb=out["rgb"],
    )
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_r))
    np.testing.assert_array_equal(
        np.asarray(daux["rgb"]), np.asarray(rgb_r)
    )

def test_deferred_midpres_midfill_bit_exact(setup, demo_level, config,
                                            monkeypatch):
    """The DEFER_MIDPRES / DEFER_MIDFILL restructures (round-5 perf
    A/Bs for the presence/cumsum and mid-fill walls) are pure
    reorganizations: per-item mid presence has the same truth table as
    the dseg-expanded join, and the KMID-outer fill applies the same
    ascending-k last-match-wins overwrite — outputs must be
    bit-identical to the default paths."""
    from doomtpu.ops.pallas_paint import LD_SKY, render_paint

    level = setup
    px, py, pa, fh, sl, ts = _state(demo_level, VIEWS)
    mp, ma, ms = demo_level.spawn_mobjs()
    B = len(VIEWS)
    mstate = jnp.asarray(ms, jnp.int32)[None].repeat(B, 0)

    frame = cam.build_seg_frame(level, config, px, py, pa, fh, sl, ts)
    order = cam.seg_order(level, cam.traversal_rank(level, px, py))
    out = render_paint(
        level, config, frame, order, pa, px, py, fh, interpret=True
    )
    ld = out["ld"]
    light = (ld >> 16) & 0xFF
    dist = ((ld & 0xFFFF) << 16) >> 16
    is_sky = (ld & LD_SKY) != 0
    pools = things.pools_from_paint(out)

    def run():
        return things.deferred_pass(
            level, config, frame, pools, order,
            px, py, pa, fh, sl, mstate,
            out["idx"], light, dist, is_sky, rgb=out["rgb"],
        )

    monkeypatch.setattr(things, "DEFER_MIDPRES", False)
    monkeypatch.setattr(things, "DEFER_MIDFILL", False)
    ref = run()
    for pres, fill in ((True, False), (False, True), (True, True)):
        monkeypatch.setattr(things, "DEFER_MIDPRES", pres)
        monkeypatch.setattr(things, "DEFER_MIDFILL", fill)
        got = run()
        for r, g in zip(ref[:4], got[:4]):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
        np.testing.assert_array_equal(
            np.asarray(ref[4]["rgb"]), np.asarray(got[4]["rgb"])
        )


@pytest.mark.parametrize("nviews", [4, 8])
def test_item_pass_kernel_bit_exact(setup, demo_level, config, nviews):
    """Standalone item-pass kernel (ops/pallas_itempass.py: billboard
    math + sprite seg clip + mid-pool match + painter fold in VMEM over
    the paint kernel's raw pools) == the XLA pipeline's full frame, bit
    for bit; nviews exercises both camera tiles."""
    from doomtpu.render.frame import render_frame
    from doomtpu.ops.pallas_itempass import item_pass
    from doomtpu.ops.pallas_paint import render_paint

    level = setup
    assert level.itempaint_ok
    views = (VIEWS * 2)[:nviews]
    px, py, pa, fh, sl, ts = _state(demo_level, views)
    mp, ma, ms = demo_level.spawn_mobjs()
    B = len(views)
    mstate = jnp.asarray(ms, jnp.int32)[None].repeat(B, 0)

    idx_r, rgb_r, aux_r = render_frame(
        level, config, px, py, pa, fh, sl, mstate, ts
    )

    frame = cam.build_seg_frame(level, config, px, py, pa, fh, sl, ts)
    order = cam.seg_order(level, cam.traversal_rank(level, px, py))
    out = render_paint(
        level, config, frame, order, pa, px, py, fh,
        interpret=True, unroll=1, gsub=2,
    )
    ipack, iaux = things.item_pack(
        level, config, frame, order, px, py, pa, fh, sl, mstate
    )
    idx_k, ld_k, rgb_k = item_pass(
        level, config, ipack, out["raw"], interpret=True
    )
    np.testing.assert_array_equal(np.asarray(idx_k), np.asarray(idx_r))
    np.testing.assert_array_equal(np.asarray(rgb_k), np.asarray(rgb_r))


def test_paint_live_capacity(setup, demo_level, config):
    """paint_live_capacity: a cap >= every (tile, block) live count is
    bit-exact vs the uncapped kernel with live_dropped == 0; a cap
    below it reports the dropped count (the only permitted deviation)."""
    import dataclasses

    from doomtpu.ops.pallas_paint import render_paint

    level = setup
    views = (VIEWS * 2)[:8]
    px, py, pa, fh, sl, ts = _state(demo_level, views)
    frame = cam.build_seg_frame(level, config, px, py, pa, fh, sl, ts)
    order = cam.seg_order(level, cam.traversal_rank(level, px, py))

    out_ref = render_paint(
        level, config, frame, order, pa, px, py, fh, interpret=True,
        unroll=1, gsub=2,
    )
    assert int(np.asarray(out_ref["live_dropped"])) == 0

    # cap just above the actual max live count (recomputed here with
    # the same census math as scripts/probe_visits.py): exact
    G = level.num_segs
    NBW = (config.width + 127) // 128
    o = np.asarray(order)
    pact = np.take_along_axis(
        np.asarray(frame["active"]).any(-1), o, axis=1
    )
    x0 = np.take_along_axis(np.asarray(jmath.as_i16(frame["x0"])), o, 1)
    x1 = np.take_along_axis(np.asarray(jmath.as_i16(frame["x1"])), o, 1)
    wlo = np.arange(NBW)[None, None] * 128
    live = pact[..., None] & (x0[..., None] < wlo + 128) & (
        x1[..., None] >= wlo
    )
    scnt = live.reshape(len(views) // 8, 8, G, NBW).any(1).sum(1)
    cfg_cap = dataclasses.replace(
        config, paint_live_capacity=int(scnt.max()) + 1
    )
    out_cap = render_paint(
        level, cfg_cap, frame, order, pa, px, py, fh, interpret=True,
        unroll=1, gsub=2,
    )
    assert int(np.asarray(out_cap["live_dropped"])) == 0
    for k in ("idx", "ld", "rgb", "cnt_mid", "cnt_clip"):
        np.testing.assert_array_equal(
            np.asarray(out_cap[k]), np.asarray(out_ref[k]), err_msg=k
        )

    # cap of 2 certainly drops segs somewhere: the counter must say so
    cfg_tiny = dataclasses.replace(config, paint_live_capacity=2)
    out_tiny = render_paint(
        level, cfg_tiny, frame, order, pa, px, py, fh, interpret=True,
        unroll=1, gsub=2,
    )
    assert int(np.asarray(out_tiny["live_dropped"])) > 0


def test_paint_percam_compact_bit_exact(setup, demo_level, config):
    """Per-camera live-list compaction (paint_percam_compact): every
    output bit-identical to the union-list kernel — each camera still
    processes exactly its own live segs in traversal order — with a
    capacity at the PER-CAMERA peak (below the union peak) still exact
    and live_dropped == 0; a cap of 2 must report drops."""
    import dataclasses

    from doomtpu.ops.pallas_paint import render_paint

    level = setup
    views = (VIEWS * 2)[:8]
    px, py, pa, fh, sl, ts = _state(demo_level, views)
    frame = cam.build_seg_frame(level, config, px, py, pa, fh, sl, ts)
    order = cam.seg_order(level, cam.traversal_rank(level, px, py))

    out_ref = render_paint(
        level, config, frame, order, pa, px, py, fh, interpret=True,
        unroll=1, gsub=2,
    )

    cfg_pc = dataclasses.replace(config, paint_percam_compact=True)
    out_pc = render_paint(
        level, cfg_pc, frame, order, pa, px, py, fh, interpret=True,
        unroll=1, gsub=2,
    )
    assert int(np.asarray(out_pc["live_dropped"])) == 0
    for k in ("idx", "ld", "rgb", "cnt_mid", "cnt_clip", "overflow"):
        np.testing.assert_array_equal(
            np.asarray(out_pc[k]), np.asarray(out_ref[k]), err_msg=k
        )
    for a, b in zip(out_pc["midpool"], out_ref["midpool"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(out_pc["clippool"], out_ref["clippool"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # per-CAMERA peak live count (census math, but per camera instead
    # of any() over the tile): a cap there is exact in percam mode
    G = level.num_segs
    NBW = (config.width + 127) // 128
    o = np.asarray(order)
    pact = np.take_along_axis(
        np.asarray(frame["active"]).any(-1), o, axis=1
    )
    x0 = np.take_along_axis(np.asarray(jmath.as_i16(frame["x0"])), o, 1)
    x1 = np.take_along_axis(np.asarray(jmath.as_i16(frame["x1"])), o, 1)
    wlo = np.arange(NBW)[None, None] * 128
    live = pact[..., None] & (x0[..., None] < wlo + 128) & (
        x1[..., None] >= wlo
    )
    cnt_b = live.sum(1)                                   # [B, NBW]
    cfg_cap = dataclasses.replace(
        config, paint_percam_compact=True,
        paint_live_capacity=int(cnt_b.max()) + 1,
    )
    out_cap = render_paint(
        level, cfg_cap, frame, order, pa, px, py, fh, interpret=True,
        unroll=1, gsub=2,
    )
    assert int(np.asarray(out_cap["live_dropped"])) == 0
    for k in ("idx", "ld", "rgb", "cnt_mid", "cnt_clip"):
        np.testing.assert_array_equal(
            np.asarray(out_cap[k]), np.asarray(out_ref[k]), err_msg=k
        )

    cfg_tiny = dataclasses.replace(
        config, paint_percam_compact=True, paint_live_capacity=2
    )
    out_tiny = render_paint(
        level, cfg_tiny, frame, order, pa, px, py, fh, interpret=True,
        unroll=1, gsub=2,
    )
    assert int(np.asarray(out_tiny["live_dropped"])) > 0


def test_paint_full_frame_item_kernel(setup, demo_level, config):
    """Item-composite kernel (ops/pallas_items.py) vs the XLA fold."""
    from doomtpu.render.frame import render_frame
    from doomtpu.ops.pallas_paint import LD_SKY, render_paint

    level = setup
    assert level.items_ok
    px, py, pa, fh, sl, ts = _state(demo_level, VIEWS)
    mp, ma, ms = demo_level.spawn_mobjs()
    B = len(VIEWS)
    mstate = jnp.asarray(ms, jnp.int32)[None].repeat(B, 0)

    idx_r, rgb_r, aux_r = render_frame(
        level, config, px, py, pa, fh, sl, mstate, ts
    )

    frame = cam.build_seg_frame(level, config, px, py, pa, fh, sl, ts)
    order = cam.seg_order(level, cam.traversal_rank(level, px, py))
    out = render_paint(
        level, config, frame, order, pa, px, py, fh, interpret=True,
        unroll=1, gsub=2,
    )
    ld = out["ld"]
    light = (ld >> 16) & 0xFF
    dist = ((ld & 0xFFFF) << 16) >> 16
    is_sky = (ld & LD_SKY) != 0
    pools = things.pools_from_paint(out)
    idx_k, _, _, _, daux_k = things.deferred_pass(
        level, config, frame, pools, order,
        px, py, pa, fh, sl, mstate,
        out["idx"], light, dist, is_sky, rgb=out["rgb"],
        item_kernel=True, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(idx_k), np.asarray(idx_r))
    np.testing.assert_array_equal(
        np.asarray(daux_k["rgb"]), np.asarray(rgb_r)
    )
