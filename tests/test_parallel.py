"""Multi-device sharding tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doomtpu.engine import DoomEngine
from doomtpu.parallel import make_mesh, shard_batch
from doomtpu.sim.player import KEY_UP
from doomtpu.wad import synth


@pytest.fixture(scope="module")
def engine():
    from doomtpu.config import RenderConfig

    # tiny frames keep the compile fast; 8 devices need B % 8 == 0
    cfg = RenderConfig(width=64, height=48, span_capacity=12)
    return DoomEngine.from_wad_bytes(synth.demo_wad(), "e1m1", config=cfg)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_render_matches_single_device(engine):
    state = engine.new_game(batch=8, key=jax.random.PRNGKey(0))
    idx_ref, rgb_ref = engine.render(state)

    mesh = make_mesh()
    sstate = shard_batch(state, mesh)
    idx_sh, rgb_sh = engine.render(sstate)
    assert len(idx_sh.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(idx_sh), np.asarray(idx_ref))
    np.testing.assert_array_equal(np.asarray(rgb_sh), np.asarray(rgb_ref))


def test_sharded_tick_and_render(engine):
    mesh = make_mesh()
    state = shard_batch(
        engine.new_game(batch=16, key=jax.random.PRNGKey(1)), mesh
    )
    controls = shard_batch(jnp.full((16,), KEY_UP, jnp.int32), mesh)
    for i in range(3):
        state = engine.tick(state, controls, jax.random.PRNGKey(i))
    idx, rgb = engine.render(state)
    assert int(state.tick[0]) == 3
    assert float(state.pos[0, 0]) > 384.0
    assert (np.asarray(idx) >= 0).mean() > 0.99


def test_graft_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
