"""Simulation-layer tests: thinkers, mobj state machine, movement,
point location — semantics pinned against the reference's scalar rules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doomtpu.render.device import DeviceLevel
from doomtpu.sim import thinkers as tk
from doomtpu.sim.player import (
    KEY_ALT, KEY_DOWN, KEY_LEFT, KEY_RIGHT, KEY_SHIFT, KEY_UP, move_player,
)
from doomtpu.sim.sector_lookup import sector_at
from doomtpu.sim.state import GameState
from doomtpu.sim.step import tick
from doomtpu.sim.thinkers import ThinkerTables
from doomtpu.wad import synth


@pytest.fixture(scope="module")
def demo_env(demo_level):
    level = DeviceLevel.build(
        demo_level.tables, demo_level.assets, demo_level.info
    )
    tkt = ThinkerTables.build(demo_level.tables, demo_level.info)
    return level, tkt


def test_thinker_kinds(demo_env, demo_level):
    _, tkt = demo_env
    kinds = np.asarray(tkt.kind)
    # demo rooms: 3 fire(17), 4 glow(8), 5 strobe(2), 6 flash(1)
    assert kinds[3] == tk.K_FIRE
    assert kinds[4] == tk.K_GLOW
    assert kinds[5] == tk.K_STROBE
    assert kinds[6] == tk.K_FLASH
    assert kinds[0] == tk.K_NONE


def test_min_surrounding_light(demo_level):
    """find_min_surrounding_light scans neighbor sectors (lights.rs:16-42)."""
    t = demo_level.tables
    # room 3 (nukage, light 144) neighbors: room 0 (208) and room 4 (192)
    assert tk.find_min_surrounding_light(t, 3, 144) == 144
    # room 0 (208) neighbors: 1 (160), 3 (144), 5 (176)
    assert tk.find_min_surrounding_light(t, 0, 208) == 144
    # room 2 (courtyard, 224) neighbors include the dark door sector (96)
    assert tk.find_min_surrounding_light(t, 2, 224) == 96


def test_glow_ramps_and_reverses(demo_env):
    level, tkt = demo_env
    B, SEC = 2, level.num_sectors
    light = jnp.broadcast_to(level.sector_light0[None], (B, SEC))
    count = jnp.zeros((B, SEC), jnp.int32)
    up = jnp.zeros((B, SEC), bool)
    seen = []
    key = jax.random.PRNGKey(0)
    for i in range(40):
        light, count, up = tk.step_lights(tkt, light, count, up, key)
        seen.append(int(light[0, 4]))
    mn, mx = int(tkt.min_light[4]), int(tkt.max_light[4])
    assert min(seen) >= mn - tk.GLOW_SPEED
    assert max(seen) <= mx
    # ramps +/-8; at a reversal the overshoot is undone (diff 0),
    # lights.rs:746-760
    diffs = {b - a for a, b in zip(seen, seen[1:])}
    assert diffs <= {-tk.GLOW_SPEED, 0, tk.GLOW_SPEED}
    assert -tk.GLOW_SPEED in diffs and tk.GLOW_SPEED in diffs


def test_strobe_alternates(demo_env):
    level, tkt = demo_env
    B, SEC = 1, level.num_sectors
    light = jnp.broadcast_to(level.sector_light0[None], (B, SEC))
    count = tkt.initial_counts(jax.random.PRNGKey(3), B)
    up = jnp.zeros((B, SEC), bool)
    values = set()
    for i in range(80):
        light, count, up = tk.step_lights(
            tkt, light, count, up, jax.random.PRNGKey(i)
        )
        values.add(int(light[0, 5]))
    # strobe flips between max light and min surrounding light
    assert values == {int(tkt.min_light[5]), int(tkt.max_light[5])}


def test_mobj_cycle(demo_env, info):
    """Barrel animates S_BAR1 <-> S_BAR2 with 6-tic periods."""
    level, _ = demo_env
    s_bar1 = info.state_id("S_BAR1")
    s_bar2 = info.state_id("S_BAR2")
    state = jnp.asarray([[s_bar1]], jnp.int32)
    tics = jnp.asarray([[6]], jnp.int32)
    trace = []
    for _ in range(24):
        state, tics = tk.step_mobjs(level, state, tics)
        trace.append(int(state[0, 0]))
    assert set(trace) == {s_bar1, s_bar2}
    # exactly every 6 ticks
    changes = [i for i in range(1, 24) if trace[i] != trace[i - 1]]
    assert all(b - a == 6 for a, b in zip(changes, changes[1:]))


def test_mobj_frozen(demo_env):
    """tics == -1 freezes the state machine (map_objects.rs:84-86)."""
    level, _ = demo_env
    state = jnp.asarray([[10]], jnp.int32)
    tics = jnp.asarray([[-1]], jnp.int32)
    s2, t2 = tk.step_mobjs(level, state, tics)
    assert int(s2[0, 0]) == 10 and int(t2[0, 0]) == -1


def test_kill_explode_respawn(demo_env, info):
    level, _ = demo_env
    state = level.mobj_spawn_state[None]
    tics = level.state_tics[state]
    ks, kt = tk.kill_mobjs(level, state, tics)
    # barrels (mobj 0) move to S_BEXP; decorations without death stay
    s_bexp = info.state_id("S_BEXP")
    assert int(ks[0, 0]) == s_bexp
    dless = np.nonzero(np.asarray(level.mobj_death_state) == 0)[0]
    if len(dless):
        d = int(dless[0])
        assert int(ks[0, d]) == int(state[0, d])
    rs, _ = tk.respawn_mobjs(level, ks, kt)
    np.testing.assert_array_equal(np.asarray(rs), np.asarray(state))


def test_movement_forward(demo_env):
    level, _ = demo_env
    pos = jnp.asarray([[384.0, 256.0]], jnp.float32)
    angle = jnp.zeros(1, jnp.float32)
    c = jnp.asarray([KEY_UP], jnp.int32)
    p2, a2, fh = move_player(level, pos, angle, c)
    expected = 1000.0 / 35.0 * 0.291
    assert abs(float(p2[0, 0]) - (384.0 + expected)) < 1e-3
    assert float(p2[0, 1]) == 256.0
    # shift doubles (game.rs:325-329)
    p3, _, _ = move_player(level, pos, angle, jnp.asarray([KEY_UP | KEY_SHIFT]))
    assert abs(float(p3[0, 0]) - (384.0 + 2 * expected)) < 1e-3


def test_movement_strafe_and_rotate(demo_env):
    level, _ = demo_env
    pos = jnp.asarray([[384.0, 256.0]], jnp.float32)
    angle = jnp.zeros(1, jnp.float32)
    # alt+left strafes perpendicular without rotating (game.rs:349-353)
    p2, a2, _ = move_player(level, pos, angle, jnp.asarray([KEY_ALT | KEY_LEFT]))
    assert float(a2[0]) == 0.0
    assert abs(float(p2[0, 0]) - 384.0) < 1e-3
    assert float(p2[0, 1]) > 256.0
    # plain left rotates without moving
    p3, a3, _ = move_player(level, pos, angle, jnp.asarray([KEY_LEFT]))
    assert float(a3[0]) > 0.0
    np.testing.assert_allclose(np.asarray(p3), np.asarray(pos))


def test_floor_height_follows_sector(demo_env):
    """Walking into the east hall (floor 32) raises the camera."""
    level, tkt = demo_env
    pos = jnp.asarray([[900.0, 256.0]], jnp.float32)
    sec = sector_at(level, pos[:, 0], pos[:, 1])
    assert int(sec[0]) == 1
    _, _, fh = move_player(level, pos, jnp.zeros(1), jnp.zeros(1, jnp.int32))
    assert float(fh[0]) == 32.0


def test_point_location_matches_host(demo_env, demo_level):
    level, _ = demo_env
    rng = np.random.default_rng(5)
    rooms, _ = synth.demo_level()
    xs, ys, expect = [], [], []
    for _ in range(64):
        r = rooms[rng.integers(0, len(rooms))]
        x = float(rng.uniform(r.x0 + 1, r.x1 - 1))
        y = float(rng.uniform(r.y0 + 1, r.y1 - 1))
        xs.append(x)
        ys.append(y)
        expect.append(demo_level.tables.sector_at(x, y))
    got = sector_at(level, jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32))
    np.testing.assert_array_equal(np.asarray(got), expect)


def test_full_tick_jits(demo_env):
    level, tkt = demo_env
    state = GameState.initial(level, tkt, batch=4, key=jax.random.PRNGKey(0))
    c = jnp.full((4,), KEY_UP, jnp.int32)
    f = jax.jit(lambda s, c, k: tick(level, tkt, s, c, k))
    s2 = f(state, c, jax.random.PRNGKey(1))
    assert int(s2.tick[0]) == 1
    s3 = f(s2, c, jax.random.PRNGKey(2))
    assert float(s3.pos[0, 0]) > float(state.pos[0, 0])


def test_rollout_scan(demo_env):
    """step+render composes under lax.scan (the RL-env workload)."""
    import jax

    from doomtpu.config import RenderConfig
    from doomtpu.sim.step import rollout

    level, tkt = demo_env
    cfg = RenderConfig(width=64, height=48, span_capacity=12)
    state = GameState.initial(level, tkt, batch=2, key=jax.random.PRNGKey(0))
    controls = jnp.full((4, 2), KEY_UP, jnp.int32)
    final, frames = rollout(
        level, tkt, cfg, state, controls, jax.random.PRNGKey(1)
    )
    assert frames.shape == (4, 2, 48, 64)
    assert int(final.tick[0]) == 4
    # frames change over time as the camera walks forward
    assert (np.asarray(frames[0]) != np.asarray(frames[3])).any()
    _, sums = rollout(
        level, tkt, cfg, state, controls, jax.random.PRNGKey(1),
        return_frames=False,
    )
    assert sums.shape == (4, 2)


def test_rollout_chaining_bit_identical(demo_env):
    """engine.rollout's segment chaining == one unchained scan, bit for
    bit (the per-tick keys come from one split)."""
    import jax

    from doomtpu.config import RenderConfig
    from doomtpu.engine import DoomEngine

    level, tkt = demo_env
    cfg = RenderConfig(width=64, height=48, span_capacity=12)
    eng = DoomEngine.__new__(DoomEngine)
    eng.level, eng.thinkers, eng.config = level, tkt, cfg
    state = GameState.initial(level, tkt, batch=2, key=jax.random.PRNGKey(0))
    controls = jnp.full((5, 2), KEY_UP, jnp.int32)
    key = jax.random.PRNGKey(7)
    f1, frames1 = eng.rollout(state, controls, key, max_ticks_per_jit=0)
    f2, frames2 = eng.rollout(state, controls, key, max_ticks_per_jit=2)
    np.testing.assert_array_equal(np.asarray(frames1), np.asarray(frames2))
    np.testing.assert_array_equal(np.asarray(f1.pos), np.asarray(f2.pos))
    np.testing.assert_array_equal(
        np.asarray(f1.sector_light), np.asarray(f2.sector_light)
    )
