"""DoomEngine: the framework's primary user-facing API.

    engine = DoomEngine.from_wad("doom1.wad", "e1m1")
    state = engine.new_game(batch=2048, key=jax.random.PRNGKey(0))
    idx, rgb = engine.render(state)                  # [B, H, W(,3)]
    state = engine.tick(state, controls, key)        # one 35 Hz tick
    state, frames = engine.rollout(state, controls_seq, key)

Everything after construction is jit-compiled, batched and
device-resident; `doomtpu.parallel` shards the batch over a device mesh.
The reference's interactive shell (SDL window, game.rs) maps to
doomtpu.cli / doomtpu.viewer on top of this API.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from doomtpu.assets.bundle import LevelAssets
from doomtpu.config import RenderConfig
from doomtpu.info import load_default_tables
from doomtpu.info.tables import InfoTables
from doomtpu.level.tables import MapTables
from doomtpu.render.camsort import (
    camera_sort_key as _camera_sort_key,
    sort_shards as _sort_shards,
    sort_state as _sort_state,
    unsort_out as _unsort_out,
)
from doomtpu.render.device import DeviceLevel
from doomtpu.render.frame import render_frame, render_walls_planes
from doomtpu.sim import step as step_mod
from doomtpu.sim.state import GameState
from doomtpu.sim.thinkers import ThinkerTables
from doomtpu.wad.reader import WadFile


class Clock:
    """35 Hz tick derivation + 16-sample rolling FPS average
    (game.rs:47-92): `ticks` is the total CLOCK_HZ ticks elapsed since
    start, so the shell's evolve loop can run exactly the missed ticks
    (game.rs:469-483) instead of one tick per rendered frame."""

    def __init__(self, samples: int = 16):
        self.samples = samples
        self.list = [0.0] * samples
        self.index = 0
        self.rolling_sum = 0.0
        self.timestamp = 0.0
        self.ticks = 0

    def add_elapsed_interval(self, interval: float) -> None:
        from doomtpu.config import CLOCK_HZ

        self.timestamp += interval
        self.ticks = int(self.timestamp * CLOCK_HZ)   # game.rs:73
        self.rolling_sum -= self.list[self.index]
        self.rolling_sum += interval
        self.list[self.index] = interval
        self.index = (self.index + 1) % self.samples

    def fps(self) -> float:
        avg = self.rolling_sum / self.samples
        return 1.0 / avg if avg > 0 else 0.0


@dataclass(eq=False)  # hash by identity so jit can treat the engine static
class DoomEngine:
    wad: WadFile
    tables: MapTables
    assets: LevelAssets
    info: InfoTables
    level: DeviceLevel
    thinkers: ThinkerTables
    config: RenderConfig
    turbo: float = 1.0

    # ------------------------------------------------------------------
    @classmethod
    def from_wad_bytes(
        cls, data: bytes, map_name: str = "e1m1",
        config: RenderConfig | None = None, turbo: float = 1.0,
        require_iwad: bool = False,
    ) -> "DoomEngine":
        wad = WadFile(data, require_iwad=require_iwad)
        info = load_default_tables()
        tables = MapTables.load(wad, map_name)
        assets = LevelAssets.load(wad, tables, info.sprite_names)
        level = DeviceLevel.build(tables, assets, info)
        thinkers = ThinkerTables.build(tables, info)
        return cls(
            wad=wad, tables=tables, assets=assets, info=info,
            level=level, thinkers=thinkers,
            config=config or RenderConfig(), turbo=turbo,
        )

    @classmethod
    def from_wad(cls, path: str, map_name: str = "e1m1", **kw) -> "DoomEngine":
        with open(path, "rb") as f:
            return cls.from_wad_bytes(f.read(), map_name, **kw)

    # ------------------------------------------------------------------
    # All device arrays (level/thinkers/state) are passed as jit ARGUMENTS
    # rather than captured in closures: on some PJRT runtimes (the axon
    # relay used here) executables with large embedded array constants
    # permanently degrade the process to synchronous dispatch.

    def new_game(
        self, batch: int = 1, key=None, pos=None, angle=None
    ) -> GameState:
        return GameState.initial(
            self.level, self.thinkers, batch, pos=pos, angle=angle, key=key
        )

    def render(self, state: GameState):
        """Full frame -> (idx [B,H,W], rgb packed 0xRRGGBB [B,H,W]).

        When `state` is sharded over a device mesh, the camera sort
        runs WITHIN shards (communication-free) — the permutation only
        affects kernel tile coherence, never pixel values."""
        return _render_jit(self.level, state, self.config,
                           _sort_shards(state))

    def render_walls(self, state: GameState):
        """Walls/planes/sky only (no things) -> (idx, rgb)."""
        return _render_walls_jit(self.level, state, self.config,
                                 _sort_shards(state))

    def render_counters(self, state: GameState):
        """Summed capacity counters for a full render of `state`:
        {overflow, live_dropped, items_dropped, item_overflow,
        item_block_dropped, live_stale}.

        Every counter at 0 proves the configured capacities (span/clip/
        mid pools, max_visible_mobjs, paint_live_capacity) dropped
        nothing, i.e. the frame is exact — bench.py asserts this at
        warmup so a fast-but-lossy config can never ship silently."""
        return jax.tree_util.tree_map(
            lambda x: int(np.asarray(x)),
            _render_counters_jit(self.level, state, self.config,
                                 _sort_shards(state)),
        )

    def render_walls_counters(self, state: GameState):
        """Capacity counters for a walls/planes-only render (the subset
        render_walls exercises): {overflow, live_dropped}.  Lets callers
        that skip the item pass (e.g. DOOMTPU_BENCH_THINGS=0) still
        assert paint_live_capacity / span pools dropped nothing."""
        return jax.tree_util.tree_map(
            lambda x: int(np.asarray(x)),
            _render_walls_counters_jit(self.level, state, self.config,
                                       _sort_shards(state)),
        )

    def calibrate(self, states) -> "DoomEngine":
        """Return a copy of this engine whose pool capacities are
        measured from an uncapped census of `states` (a GameState or
        list) — see doomtpu/calibrate.py.  Renders of exactly those
        states are then guaranteed drop-free (counters == 0)."""
        from dataclasses import replace

        from doomtpu.calibrate import calibrated_config

        return replace(self, config=calibrated_config(self, states))

    def tick(self, state: GameState, controls, key) -> GameState:
        return _tick_jit(
            self.level, self.thinkers, state, controls, key, self.turbo
        )

    def rollout(self, state: GameState, controls_seq, key,
                return_frames: bool = True, max_ticks_per_jit: int = 32,
                live_reuse: bool = False):
        """T ticks of step+render as lax.scan segments on device.

        Long rollouts are chained as <= max_ticks_per_jit-tick jitted
        scans: the relay-backed TPU runtime kills single executions
        over ~100 s (B=2048 x 32 ticks measures ~53 s), and each
        segment is one compiled dispatch so per-op relay overhead never
        appears.  The per-tick keys come from ONE split of `key`, so
        chained output == one long scan, bit for bit.  Pass
        max_ticks_per_jit=0 to run one unchained scan.

        live_reuse=True (paint pipeline only) reuses each segment's
        first-tick traversal/compaction metadata for the rest of the
        segment (sim/step.rollout) and returns a THIRD element — the
        summed live_stale counter.  0 proves frames are bit-identical
        to live_reuse=False; assert it like the drop counters."""
        T = controls_seq.shape[0]
        keys = jax.random.split(key, T)
        shards = _sort_shards(state)
        S = max_ticks_per_jit
        if not S or T <= S:
            return _rollout_jit(
                self.level, self.thinkers, self.config, state,
                controls_seq, keys, return_frames, shards, live_reuse,
            )
        outs = []
        stale = jnp.zeros((), jnp.int32)
        for s0 in range(0, T, S):
            r = _rollout_jit(
                self.level, self.thinkers, self.config, state,
                controls_seq[s0:s0 + S], keys[s0:s0 + S], return_frames,
                shards, live_reuse,
            )
            if live_reuse:
                state, out, seg_stale = r
                stale = stale + seg_stale
            else:
                state, out = r
            outs.append(out)
        frames = jnp.concatenate(outs, axis=0)
        if live_reuse:
            return state, frames, stale
        return state, frames

    def kill_everything(self, state):
        return step_mod.kill_everything(self.level, state)

    def explode_everything(self, state):
        return step_mod.explode_everything(self.level, state)

    def respawn_everything(self, state):
        return step_mod.respawn_everything(self.level, state)

    # ------------------------------------------------------------------
    def player_position_json(self, state: GameState, env: int = 0) -> str:
        """Re-runnable --player-position JSON (game.rs:376-384)."""
        import json

        return json.dumps({
            "position": {
                "x": float(state.pos[env, 0]), "y": float(state.pos[env, 1]),
            },
            "angle": float(state.angle[env]),
        })

    def save_state(self, state: GameState, path: str) -> None:
        """Checkpoint the FULL simulation state (every thinker counter,
        mobj state and camera) — the reference can only round-trip the
        player pose (game.rs:34-38, 376-384)."""
        from dataclasses import fields

        arrays = {
            f.name: np.asarray(getattr(state, f.name))
            for f in fields(state)
        }
        np.savez(path, **arrays)

    def load_state(self, path: str) -> GameState:
        data = np.load(path)
        return GameState(**{k: jnp.asarray(v) for k, v in data.items()})

    def map_2d(self, state: GameState, env: int = 0) -> np.ndarray:
        from doomtpu.render.map2d import render_map_2d

        return render_map_2d(
            self.tables, self.config,
            float(state.pos[env, 0]), float(state.pos[env, 1]),
            float(state.angle[env]),
        )


# ---------------------------------------------------------------------------
# module-level jitted kernels (level/thinkers as pytree arguments)
# ---------------------------------------------------------------------------

def _chunked(level, state: GameState, cfg: RenderConfig, one_chunk):
    """Run `one_chunk` over the batch in render_chunk-sized pieces.

    Bounds the [chunk, H, W] working set (the resolve stage holds several
    such temporaries) while outputs accumulate at full batch size.
    """
    B = state.pos.shape[0]
    C = cfg.render_chunk
    if B <= C or B % C != 0:
        return one_chunk(state)

    chunks = jax.tree_util.tree_map(
        lambda x: x.reshape((B // C, C) + x.shape[1:]), state
    )
    return jax.lax.map(one_chunk, chunks)


def _unchunk(out, B):
    return jax.tree_util.tree_map(lambda x: x.reshape((B,) + x.shape[2:]), out)


def _camera_sort_perm(state: GameState):
    """Global Morton camera permutation (single-shard path; probes and
    the calibration census use this directly)."""
    return jnp.argsort(_camera_sort_key(state.pos, state.angle)).astype(
        jnp.int32
    )


@partial(jax.jit, static_argnums=(2, 3))
def _render_jit(level: DeviceLevel, state: GameState, cfg: RenderConfig,
                sort_shards: int = 1):
    B = state.pos.shape[0]
    S = max(1, sort_shards)

    loc = None
    if cfg.camera_sort and B // S > 8:
        state, loc = _sort_state(state, B, S)

    def one(st):
        idx, rgb, _ = render_frame(
            level, cfg,
            st.pos[:, 0], st.pos[:, 1], st.angle,
            st.floor_height, st.sector_light, st.mobj_state,
            st.timestamp,
        )
        return idx, rgb

    out = _chunked(level, state, cfg, one)
    if out[0].shape[0] != B:
        out = _unchunk(out, B)
    if loc is not None:
        out = _unsort_out(out, loc, B, S)
    return out


@partial(jax.jit, static_argnums=(2, 3))
def _render_counters_jit(
    level: DeviceLevel, state: GameState, cfg: RenderConfig,
    sort_shards: int = 1,
):
    # same sorted/chunked pipeline as _render_jit (counters depend on
    # tile composition, so the permutation must match), but the fetched
    # outputs are the summed capacity counters (sums are order- and
    # permutation-invariant, so no unsort is needed)
    B = state.pos.shape[0]
    S = max(1, sort_shards)
    if cfg.camera_sort and B // S > 8:
        state, _ = _sort_state(state, B, S)

    def one(st):
        _, _, aux = render_frame(
            level, cfg,
            st.pos[:, 0], st.pos[:, 1], st.angle,
            st.floor_height, st.sector_light, st.mobj_state,
            st.timestamp,
        )
        zero = jnp.zeros((), jnp.int32)
        return {
            k: jnp.asarray(aux.get(k, zero)).sum().astype(jnp.int32)
            for k in (
                "overflow", "live_dropped", "items_dropped",
                "item_overflow", "item_block_dropped", "live_stale",
            )
        }

    out = _chunked(level, state, cfg, one)
    return jax.tree_util.tree_map(lambda x: x.sum(), out)


@partial(jax.jit, static_argnums=(2, 3))
def _render_walls_counters_jit(
    level: DeviceLevel, state: GameState, cfg: RenderConfig,
    sort_shards: int = 1,
):
    B = state.pos.shape[0]
    S = max(1, sort_shards)
    if cfg.camera_sort and B // S > 8:
        state, _ = _sort_state(state, B, S)

    def one(st):
        _, _, aux = render_walls_planes(
            level, cfg,
            st.pos[:, 0], st.pos[:, 1], st.angle,
            st.floor_height, st.sector_light, st.timestamp,
        )
        zero = jnp.zeros((), jnp.int32)
        return {
            k: jnp.asarray(aux.get(k, zero)).sum().astype(jnp.int32)
            for k in ("overflow", "live_dropped")
        }

    out = _chunked(level, state, cfg, one)
    return jax.tree_util.tree_map(lambda x: x.sum(), out)


@partial(jax.jit, static_argnums=(2, 3))
def _render_walls_jit(level: DeviceLevel, state: GameState, cfg: RenderConfig,
                      sort_shards: int = 1):
    B = state.pos.shape[0]
    S = max(1, sort_shards)

    loc = None
    if cfg.camera_sort and B // S > 8:
        state, loc = _sort_state(state, B, S)

    def one(st):
        idx, rgb, _ = render_walls_planes(
            level, cfg,
            st.pos[:, 0], st.pos[:, 1], st.angle,
            st.floor_height, st.sector_light, st.timestamp,
        )
        return idx, rgb

    out = _chunked(level, state, cfg, one)
    if out[0].shape[0] != B:
        out = _unchunk(out, B)
    if loc is not None:
        out = _unsort_out(out, loc, B, S)
    return out


@partial(jax.jit, static_argnums=(2, 6, 7, 8))
def _rollout_jit(level, thinkers, cfg, state, controls_seq, keys,
                 return_frames, sort_shards=1, live_reuse=False):
    # one jit around the whole scan: without it every surrounding op
    # dispatches individually through the relay (~ms each) and a T-step
    # rollout takes minutes instead of milliseconds
    return step_mod.rollout(
        level, thinkers, cfg, state, controls_seq, None,
        return_frames=return_frames, keys=keys, sort_shards=sort_shards,
        live_reuse=live_reuse,
    )


@partial(jax.jit, static_argnums=5)
def _tick_jit(level, thinkers, state, controls, key, turbo):
    return step_mod.tick(level, thinkers, state, controls, key, turbo)
