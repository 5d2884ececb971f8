"""Player movement, batched (game.rs:311-389).

Controls are a bitmask per environment; one call applies one tick's
movement (the reference scales movement per-frame with the same
per-tick constants, game.rs:314-317).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from doomtpu.config import CLOCK_HZ
from doomtpu.render.device import DeviceLevel
from doomtpu.render.jmath import f32, rotate
from doomtpu.sim.sector_lookup import sector_at

# control bitmask
KEY_UP = 1
KEY_DOWN = 2
KEY_LEFT = 4
KEY_RIGHT = 8
KEY_ALT = 16     # strafe modifier
KEY_SHIFT = 32   # run (2x)

_PI = np.float32(np.pi)


def move_player(level: DeviceLevel, pos, angle, controls, turbo=1.0):
    """One tick of movement; returns (pos, angle, floor_height).

    game.rs:314-373: rotation then strafe then forward/back; shift
    doubles both factors; floor height re-queried from the BSP
    (game.rs:376-389).
    """
    duration = np.float32(1000.0 / CLOCK_HZ)
    rotate_factor = np.float32(duration * 0.0025)
    move_factor = np.float32(duration * 0.291)

    alt = (controls & KEY_ALT) != 0
    shift = (controls & KEY_SHIFT) != 0
    up = (controls & KEY_UP) != 0
    down = (controls & KEY_DOWN) != 0
    left = (controls & KEY_LEFT) != 0
    right = (controls & KEY_RIGHT) != 0

    mult = jnp.where(shift, f32(2.0), f32(1.0)) * f32(turbo)
    move_len = f32(move_factor) * mult
    rot = f32(rotate_factor) * mult

    angle = angle + jnp.where(left & ~alt, rot, 0.0)
    angle = angle - jnp.where(right & ~alt, rot, 0.0)

    px, py = pos[:, 0], pos[:, 1]
    # strafe (game.rs:349-359)
    sdx, sdy = rotate(move_len, f32(0.0), angle + _PI / np.float32(2.0))
    px = px + jnp.where(alt & left, sdx, 0.0) - jnp.where(alt & right, sdx, 0.0)
    py = py + jnp.where(alt & left, sdy, 0.0) - jnp.where(alt & right, sdy, 0.0)
    # forward / backward (game.rs:361-372)
    fdx, fdy = rotate(move_len, f32(0.0), angle)
    px = px + jnp.where(up, fdx, 0.0) - jnp.where(down, fdx, 0.0)
    py = py + jnp.where(up, fdy, 0.0) - jnp.where(down, fdy, 0.0)

    pos = jnp.stack([px, py], -1)
    sec = sector_at(level, px, py)
    floor_h = jnp.where(
        sec >= 0,
        level.sector_floor_h[jnp.maximum(sec, 0)].astype(jnp.float32),
        0.0,
    )
    return pos, angle, floor_h
