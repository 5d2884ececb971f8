"""The thinker framework, vectorized (layers from thinkers.rs + lights.rs
+ map_objects.rs).

Sector light specials become per-sector parameter tables built once on
host (including find_min_surrounding_light, lights.rs:16-42) plus a pure
step over [B, SEC] state; the map-object state machine is a pure step
over [B, MO].  Randomness uses explicit jax.random keys — unlike the
reference's thread_rng (lights.rs), runs are reproducible.

Sector specials handled (thinkers.rs:14-80):
    1 flicker  2 strobe fast  3 strobe slow  4 strobe fast (slime)
    8 glow  12 strobe slow sync  13 strobe fast sync  17 fire flicker
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from doomtpu.info.tables import InfoTables
from doomtpu.level.tables import MapTables
from doomtpu.render.device import DeviceLevel

# lights.rs:9-13
SLOW_DARK = 35
FAST_DARK = 15
STROBE_BRIGHT = 5
GLOW_SPEED = 8

K_NONE, K_FLASH, K_STROBE, K_GLOW, K_FIRE = 0, 1, 2, 3, 4


def find_min_surrounding_light(t: MapTables, sector: int, maximum: int) -> int:
    """Minimum neighbor light level (lights.rs:16-42)."""
    light = maximum
    for li in range(len(t.line_flags)):
        f, b = t.line_sides[li]
        if f >= 0 and t.side_sector[f] == sector and b >= 0:
            light = min(light, int(t.sector_light[t.side_sector[b]]))
        if b >= 0 and t.side_sector[b] == sector and f >= 0:
            light = min(light, int(t.sector_light[t.side_sector[f]]))
    return light


@jax.tree_util.register_pytree_node_class
@dataclass
class ThinkerTables:
    kind: jnp.ndarray         # [SEC] i32
    min_light: jnp.ndarray    # [SEC] i32
    max_light: jnp.ndarray    # [SEC] i32
    dark_time: jnp.ndarray    # [SEC] i32 (strobe)
    bright_time: jnp.ndarray  # [SEC] i32
    min_time: jnp.ndarray     # [SEC] i32 (flash)
    max_time: jnp.ndarray     # [SEC] i32
    sync: jnp.ndarray         # [SEC] bool
    player_start_pos: np.ndarray = None
    player_start_angle: float = 0.0

    def tree_flatten(self):
        arrs = (self.kind, self.min_light, self.max_light, self.dark_time,
                self.bright_time, self.min_time, self.max_time, self.sync)
        aux = (tuple(float(v) for v in self.player_start_pos),
               float(self.player_start_angle))
        return arrs, aux

    @classmethod
    def tree_unflatten(cls, aux, values):
        import numpy as np

        return cls(
            *values,
            player_start_pos=np.asarray(aux[0], np.float32),
            player_start_angle=aux[1],
        )

    # ------------------------------------------------------------------
    @classmethod
    def build(cls, tables: MapTables, info: InfoTables) -> "ThinkerTables":
        n = len(tables.sector_light)
        kind = np.zeros(n, np.int32)
        min_l = np.zeros(n, np.int32)
        max_l = np.asarray(tables.sector_light, np.int32).copy()
        dark = np.zeros(n, np.int32)
        bright = np.full(n, STROBE_BRIGHT, np.int32)
        min_t = np.full(n, 7, np.int32)
        max_t = np.full(n, 64, np.int32)
        sync = np.zeros(n, bool)

        for s in range(n):
            sp = int(tables.sector_special[s])
            lv = int(tables.sector_light[s])
            if sp == 1:
                kind[s] = K_FLASH
                min_l[s] = find_min_surrounding_light(tables, s, lv)
            elif sp in (2, 3, 4, 12, 13):
                kind[s] = K_STROBE
                m = find_min_surrounding_light(tables, s, lv)
                if m == lv:
                    m = 0
                min_l[s] = m
                dark[s] = SLOW_DARK if sp in (3, 12) else FAST_DARK
                sync[s] = sp in (12, 13)
            elif sp == 8:
                kind[s] = K_GLOW
                min_l[s] = find_min_surrounding_light(tables, s, lv)
            elif sp == 17:
                kind[s] = K_FIRE
                min_l[s] = find_min_surrounding_light(tables, s, lv) + 16

        try:
            pos, ang = tables.player_start()
        except ValueError:
            pos, ang = np.zeros(2, np.float32), 0.0

        j = lambda x: jnp.asarray(x)
        return cls(
            kind=j(kind), min_light=j(min_l), max_light=j(max_l),
            dark_time=j(dark), bright_time=j(bright),
            min_time=j(min_t), max_time=j(max_t), sync=j(sync),
            player_start_pos=np.asarray(pos, np.float32),
            player_start_angle=float(ang),
        )

    # ------------------------------------------------------------------
    def initial_counts(self, key, batch: int):
        """Initial countdowns: flash rand(1..=64), strobe rand(1..=8) or
        1 when synchronized, fire 4 (lights.rs:57-99, 104-164, 216-259)."""
        SEC = self.kind.shape[0]
        r = jax.random.randint(key, (batch, SEC), 0, 1 << 30, dtype=jnp.int32)
        flash = 1 + r % self.max_time[None]
        strobe = jnp.where(self.sync[None], 1, 1 + r % 8)
        count = jnp.where(self.kind[None] == K_FLASH, flash, 0)
        count = jnp.where(self.kind[None] == K_STROBE, strobe, count)
        count = jnp.where(self.kind[None] == K_FIRE, 4, count)
        return count.astype(jnp.int32)


def step_lights(tk: ThinkerTables, light, count, going_up, key):
    """One 35 Hz tick for all sector light thinkers, batched [B, SEC]."""
    B, SEC = light.shape
    kind = tk.kind[None]
    r1, r2 = jax.random.split(key)
    rnd = jax.random.randint(r1, (B, SEC), 0, 1 << 30, dtype=jnp.int32)
    rnd2 = jax.random.randint(r2, (B, SEC), 0, 1 << 30, dtype=jnp.int32)

    # countdown thinkers (flash/strobe/fire) tick their counter first
    counting = (kind == K_FLASH) | (kind == K_STROBE) | (kind == K_FIRE)
    count_new = jnp.where(counting, count - 1, count)
    fire_now = counting & (count_new <= 0)

    # LightFlash (lights.rs:79-99)
    at_max = light == tk.max_light[None]
    flash_light = jnp.where(at_max, tk.min_light[None], tk.max_light[None])
    flash_count = jnp.where(
        at_max, 1 + rnd % tk.min_time[None], 1 + rnd % tk.max_time[None]
    )

    # StrobeFlash (lights.rs:144-164)
    strobe_light = jnp.where(at_max, tk.min_light[None], tk.max_light[None])
    strobe_count = jnp.where(at_max, tk.dark_time[None], tk.bright_time[None])

    # FireFlicker (lights.rs:242-258)
    amount = (rnd2 % 4) * 16
    fire_light = jnp.where(
        light - amount < tk.min_light[None],
        tk.min_light[None], tk.max_light[None] - amount,
    )
    fire_count = jnp.full_like(count, 4)

    light1 = light
    count1 = count_new
    m = fire_now & (kind == K_FLASH)
    light1 = jnp.where(m, flash_light, light1)
    count1 = jnp.where(m, flash_count, count1)
    m = fire_now & (kind == K_STROBE)
    light1 = jnp.where(m, strobe_light, light1)
    count1 = jnp.where(m, strobe_count, count1)
    m = fire_now & (kind == K_FIRE)
    light1 = jnp.where(m, fire_light, light1)
    count1 = jnp.where(m, fire_count, count1)

    # GlowingLight (lights.rs:169-211): every tick, ramp +/- 8
    is_glow = kind == K_GLOW
    up = going_up
    glow_up = light + GLOW_SPEED
    overshoot_up = glow_up >= tk.max_light[None]
    glow_up = jnp.where(overshoot_up, glow_up - GLOW_SPEED, glow_up)
    glow_dn = light - GLOW_SPEED
    overshoot_dn = glow_dn <= tk.min_light[None]
    glow_dn = jnp.where(overshoot_dn, glow_dn + GLOW_SPEED, glow_dn)
    glow_light = jnp.where(up, glow_up, glow_dn)
    new_up = jnp.where(
        is_glow, jnp.where(up, ~overshoot_up & up, overshoot_dn), going_up
    )
    light1 = jnp.where(is_glow, glow_light, light1)

    return light1.astype(jnp.int32), count1.astype(jnp.int32), new_up


def step_mobjs(level: DeviceLevel, state, tics):
    """MapObjectThinker::mutate (map_objects.rs:84-97), batched [B, MO]."""
    frozen = tics == -1
    t1 = tics - 1
    advance = ~frozen & (t1 <= 0)
    nxt = level.state_next[state]
    state1 = jnp.where(advance, nxt, state)
    tics1 = jnp.where(advance, level.state_tics[nxt], jnp.where(frozen, tics, t1))
    return state1, tics1


def _move_to(level: DeviceLevel, state, tics, target, cond):
    state1 = jnp.where(cond, target, state)
    tics1 = jnp.where(cond, level.state_tics[target], tics)
    return state1, tics1


def kill_mobjs(level: DeviceLevel, state, tics, mask=True):
    """kill (map_objects.rs:99-104): move to death state if it has one."""
    target = level.mobj_death_state[None]
    return _move_to(level, state, tics, target, mask & (target != 0))


def explode_mobjs(level: DeviceLevel, state, tics, mask=True):
    """explode (map_objects.rs:106-115): xdeath, falling back to death."""
    xd = level.mobj_xdeath_state[None]
    d = level.mobj_death_state[None]
    state1, tics1 = _move_to(level, state, tics, xd, mask & (xd != 0))
    return _move_to(level, state1, tics1, d, mask & (xd == 0) & (d != 0))


def respawn_mobjs(level: DeviceLevel, state, tics, mask=True):
    """respawn (map_objects.rs:117-120)."""
    target = level.mobj_spawn_state[None]
    return _move_to(level, state, tics, target, mask & True)
