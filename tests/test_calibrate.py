"""Auto-capacity calibration (doomtpu/calibrate.py).

The census must (a) make renders of the censused states drop-free with
zero hand constants, and (b) agree with the deferred pass's own
uncapped item-pool occupancy (the _DEFER_ONLY == 6 probe cut).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doomtpu.config import RenderConfig
from doomtpu.engine import DoomEngine
from doomtpu.wad import synth


@pytest.fixture(scope="module")
def engine():
    cfg = RenderConfig(width=320, height=200, span_capacity=32)
    return DoomEngine.from_wad_bytes(synth.demo_wad(), "e1m1", config=cfg)


def _states(engine, B=4, n=3):
    state = engine.new_game(B, key=jax.random.PRNGKey(0))
    states = [state]
    controls = jnp.zeros(B, jnp.int32)
    for i in range(n - 1):
        states.append(
            engine.tick(states[-1], controls, jax.random.PRNGKey(i))
        )
    return states


def test_calibrated_render_is_drop_free(engine):
    states = _states(engine)
    cal = engine.calibrate(states)
    c = cal.config
    # quantized measured peaks, not fixture magic: sane bounds for the
    # small demo level
    assert c.span_capacity % 8 == 0 and c.span_capacity <= 32
    assert c.clip_capacity % 8 == 0 and c.mid_capacity % 8 == 0
    assert c.item_capacity % 8 == 0
    assert c.max_visible_mobjs % 32 == 0
    assert c.paint_live_capacity % 32 == 0
    for st in states:
        counters = cal.render_counters(st)
        assert all(v == 0 for v in counters.values()), counters


def test_item_census_matches_deferred_occupancy(engine):
    """things.item_census == the deferred pass's uncapped rc[:, 0, :]
    peak (the quantity item_capacity must cover)."""
    from dataclasses import replace

    from doomtpu.render import camera as cam
    from doomtpu.render import things, walls

    state = _states(engine, n=2)[-1]
    cfg = replace(engine.config, max_visible_mobjs=0)
    level = engine.level
    px, py = state.pos[:, 0], state.pos[:, 1]
    frame = cam.build_seg_frame(
        level, cfg, px, py, state.angle, state.floor_height,
        state.sector_light, state.timestamp,
    )
    order = cam.seg_order(level, cam.traversal_rank(level, px, py))
    pool, cnt, _ = walls.wall_scan(level, cfg, frame, order)
    pools = things.pools_from_unified(pool, cnt)

    census = things.item_census(
        level, cfg, frame, pools, px, py, state.angle,
        state.floor_height, state.sector_light, state.mobj_state,
    )

    idx0 = jnp.zeros((px.shape[0], cfg.height, cfg.width), jnp.int32)
    z = jnp.zeros_like(idx0)
    old = things._DEFER_ONLY
    try:
        things._DEFER_ONLY = 6
        r, *_ = things.deferred_pass(
            level, cfg, frame, pools, order, px, py, state.angle,
            state.floor_height, state.sector_light, state.mobj_state,
            idx0, z, z, jnp.zeros_like(idx0, bool),
        )
    finally:
        things._DEFER_ONLY = old
    probe_peak = int(np.asarray((r - idx0).max()))
    assert probe_peak > 0      # the demo spawn sees items
    assert int(np.asarray(census["presence"].max())) == probe_peak
    assert int(np.asarray(census["n_valid"].max())) > 0


def test_block_emission_matches_dense(engine):
    """Block-local item emission (cfg.item_block_capacity > 0) is
    bit-identical to the dense [B, N, W] path while its drop counter is
    0, and the counter fires when a (tile, block) exceeds the cap."""
    from dataclasses import replace

    state = _states(engine, n=2)[-1]
    # the block path measured a v5e LOSS (sweep #10) so calibrate keeps
    # it opt-in: a nonzero placeholder asks for the censused capacity
    opt_in = replace(
        engine, config=replace(engine.config, item_block_capacity=1)
    )
    cal = opt_in.calibrate(state)
    assert cal.config.item_block_capacity > 0
    dense = replace(cal, config=replace(cal.config, item_block_capacity=0))
    i0, r0 = dense.render(state)
    i1, r1 = cal.render(state)
    assert cal.render_counters(state)["item_block_dropped"] == 0
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))

    tiny = replace(cal, config=replace(cal.config, item_block_capacity=1))
    assert tiny.render_counters(state)["item_block_dropped"] > 0
