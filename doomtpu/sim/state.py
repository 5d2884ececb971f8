"""Batched game state: one pytree of arrays, B environments.

Replaces the reference's mutable Rc<RefCell> object graph (game.rs,
map_objects.rs, lights.rs) with pure data; stepping is a jitted function
of (state, controls, key) -> state, so rollouts compose under lax.scan
and checkpointing is a trivial pytree serialization (the reference can
only round-trip the player, game.rs:34-38).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from doomtpu.config import CLOCK_HZ
from doomtpu.render.device import DeviceLevel


@jax.tree_util.register_pytree_node_class
@dataclass
class GameState:
    # player (camera) per environment
    pos: jnp.ndarray            # [B, 2] f32
    angle: jnp.ndarray          # [B] f32
    floor_height: jnp.ndarray   # [B] f32

    # world
    sector_light: jnp.ndarray   # [B, SEC] i32
    light_count: jnp.ndarray    # [B, SEC] i32 (thinker countdown)
    light_up: jnp.ndarray       # [B, SEC] bool (glow direction)
    mobj_state: jnp.ndarray     # [B, MO] i32 (state table index)
    mobj_tics: jnp.ndarray      # [B, MO] i32

    tick: jnp.ndarray           # [B] i32 (35 Hz ticks elapsed)

    def tree_flatten(self):
        from dataclasses import fields

        names = tuple(f.name for f in fields(self))
        return tuple(getattr(self, n) for n in names), names

    @classmethod
    def tree_unflatten(cls, names, values):
        return cls(**dict(zip(names, values)))

    @property
    def timestamp(self):
        """Seconds since start (game.rs:72-74 derives ticks from time;
        here time derives from ticks)."""
        return self.tick.astype(jnp.float32) / jnp.float32(CLOCK_HZ)

    @property
    def batch(self) -> int:
        return self.pos.shape[0]

    # ------------------------------------------------------------------
    @classmethod
    def initial(
        cls, level: DeviceLevel, thinkers, batch: int,
        pos=None, angle=None, key=None,
    ) -> "GameState":
        """Spawn state: player at the Player1Start (or given poses),
        mobjs in their spawn states, thinker counters seeded like the
        reference (lights.rs random initial counts)."""
        B = batch
        if pos is None:
            start = np.asarray(thinkers.player_start_pos, np.float32)
            pos = jnp.broadcast_to(jnp.asarray(start)[None], (B, 2))
            angle = jnp.full(
                (B,), float(thinkers.player_start_angle), jnp.float32
            )
        pos = jnp.asarray(pos, jnp.float32).reshape(B, 2)
        angle = jnp.asarray(angle, jnp.float32).reshape(B)

        from doomtpu.sim.sector_lookup import sector_at

        sec = sector_at(level, pos[:, 0], pos[:, 1])
        floor_h = jnp.where(
            sec >= 0,
            level.sector_floor_h[jnp.maximum(sec, 0)].astype(jnp.float32),
            0.0,
        )

        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        count0 = thinkers.initial_counts(k1, B)

        return cls(
            pos=pos,
            angle=angle,
            floor_height=floor_h,
            sector_light=jnp.broadcast_to(
                level.sector_light0[None], (B, level.num_sectors)
            ),
            light_count=count0,
            light_up=jnp.zeros((B, level.num_sectors), bool),
            mobj_state=jnp.broadcast_to(
                level.mobj_spawn_state[None], (B, level.num_mobjs)
            ),
            mobj_tics=jnp.broadcast_to(
                level.state_tics[level.mobj_spawn_state][None],
                (B, level.num_mobjs),
            ),
            tick=jnp.zeros((B,), jnp.int32),
        )
