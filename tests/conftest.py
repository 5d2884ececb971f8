"""Test configuration: force CPU JAX with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh
(xla_force_host_platform_device_count), as real multi-chip hardware is not
available in CI.  Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the environment's sitecustomize force-registers the TPU backend; tests
# run on the virtual-device CPU mesh regardless
jax.config.update("jax_platforms", "cpu")
# strict-FP parity mode: block FMA contraction differences vs the oracle
jax.config.update("jax_enable_x64", True)

from doomtpu.render import jmath

jmath.set_strict_fp(True)

# tests must exercise the real census, never a disk-cached result (a
# census regression would otherwise hide behind entries written by an
# earlier bench/test run; "0" disables doomtpu.calibrate's cache)
os.environ["DOOMTPU_CALIB_CACHE"] = "0"

import numpy as np
import pytest

from doomtpu.config import RenderConfig
from doomtpu.info import load_default_tables
from doomtpu.level.tables import MapTables
from doomtpu.assets.bundle import LevelAssets
from doomtpu.wad.reader import WadFile
from doomtpu.wad import synth


@pytest.fixture(scope="session")
def info():
    return load_default_tables()


class Level:
    def __init__(self, wad_bytes: bytes, info, map_name="E1M1"):
        self.wad = WadFile(wad_bytes)
        self.tables = MapTables.load(self.wad, map_name)
        self.assets = LevelAssets.load(self.wad, self.tables, info.sprite_names)
        self.info = info

    def player(self):
        from doomtpu.render.spec import Player

        pos, ang = self.tables.player_start()
        sec = self.tables.sector_at(float(pos[0]), float(pos[1]))
        return Player(
            float(pos[0]), float(pos[1]), float(ang),
            float(self.tables.sector_floor_h[sec]),
        )

    def spawn_mobjs(self):
        """Mirror map_objects.rs:24-50 (skip player/deathmatch starts)."""
        dn = self.info.mobj_index_by_doomednum()
        pos, ang, st = [], [], []
        t = self.tables
        for i in range(len(t.thing_type)):
            tt = int(t.thing_type[i])
            if 1 <= tt <= 4 or tt == 11:
                continue
            mi = dn[tt]
            pos.append(t.thing_pos[i])
            ang.append(t.thing_angle[i])
            st.append(int(self.info.mobj_spawn[mi]))
        if not pos:
            return None, None, None
        return (
            np.array(pos, np.float32),
            np.array(ang, np.float32),
            np.array(st, np.int32),
        )


@pytest.fixture(scope="session")
def single_level(info):
    return Level(synth.single_room_wad(), info)


@pytest.fixture(scope="session")
def two_level(info):
    return Level(synth.two_room_wad(), info)


@pytest.fixture(scope="session")
def demo_level(info):
    return Level(synth.demo_wad(), info)


@pytest.fixture(scope="session")
def config():
    return RenderConfig()
