"""Viewer smoke test under SDL's dummy video driver.

Covers the pygame shell surface (game.rs:392-534 equivalent): surface
creation from packed-RGB frames, the tick/render loop, and the 2D map
branch — no real display needed.
"""

import os

import numpy as np
import pytest

pygame = pytest.importorskip("pygame")


@pytest.fixture(scope="module")
def engine():
    from doomtpu.config import RenderConfig
    from doomtpu.engine import DoomEngine
    from doomtpu.wad import synth

    cfg = RenderConfig(width=64, height=48)
    return DoomEngine.from_wad_bytes(synth.demo_wad(), "e1m1", config=cfg)


def test_viewer_headless_frames(engine, monkeypatch):
    import jax

    from doomtpu.viewer import run_viewer

    monkeypatch.setenv("SDL_VIDEODRIVER", "dummy")
    state = engine.new_game(1, key=jax.random.PRNGKey(0))
    rc = run_viewer(engine, state, scale=1, max_frames=2)
    assert rc == 0
    pygame.quit()


def test_viewer_missed_tick_evolve(engine, monkeypatch):
    """Simulated frame intervals must yield the reference's tick counts
    (game.rs:469-483): ticks = floor(total_elapsed * 35) — NOT one tick
    per rendered frame."""
    import jax

    from doomtpu.config import CLOCK_HZ
    from doomtpu.viewer import run_viewer

    monkeypatch.setenv("SDL_VIDEODRIVER", "dummy")

    # per-frame wall-clock durations the fake clock feeds the loop:
    # a slow first frame (3 ticks), two fast frames (0 ticks each),
    # then two mid frames
    intervals = [0.1, 0.005, 0.005, 0.05, 0.04]
    calls = {"i": 0, "t": 0.0}

    def fake_time():
        # called twice per frame (start, end): advance only on the end
        # call so elapsed == intervals[frame]
        half = calls["i"] % 2 == 1
        if half:
            calls["t"] += intervals[calls["i"] // 2]
        calls["i"] += 1
        return calls["t"]

    ticks_run = {"n": 0}
    real_tick = engine.tick

    def counting_tick(state, controls, key):
        ticks_run["n"] += 1
        return real_tick(state, controls, key)

    monkeypatch.setattr(engine, "tick", counting_tick)
    state = engine.new_game(1, key=jax.random.PRNGKey(0))
    rc = run_viewer(
        engine, state, scale=1, max_frames=len(intervals),
        time_fn=fake_time,
    )
    assert rc == 0
    # game.rs:73: ticks = floor(timestamp * 35); total 0.2 s -> 7 ticks
    # (3 on the slow frame, 0+0 on the fast ones, then 2 + 2)
    assert ticks_run["n"] == 7
    assert ticks_run["n"] == int(sum(intervals) * CLOCK_HZ)
    pygame.quit()


def test_map_2d_render(engine):
    import jax

    state = engine.new_game(1, key=jax.random.PRNGKey(0))
    img = engine.map_2d(state)
    assert img.ndim == 3 and img.shape[2] == 3
    # linedefs drawn: some non-black pixels
    assert (np.asarray(img) != 0).any()
