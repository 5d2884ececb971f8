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


def test_map_2d_render(engine):
    import jax

    state = engine.new_game(1, key=jax.random.PRNGKey(0))
    img = engine.map_2d(state)
    assert img.ndim == 3 and img.shape[2] == 3
    # linedefs drawn: some non-black pixels
    assert (np.asarray(img) != 0).any()
