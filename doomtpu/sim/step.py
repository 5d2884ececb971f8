"""The pure simulation step: one 35 Hz tick for B environments.

tick() mirrors Game::tick (game.rs:463-466): process player controls,
then run every thinker.  step+render composes under lax.scan for
RL-style rollouts (the 2048-camera config of BASELINE.json).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from doomtpu.render.device import DeviceLevel
from doomtpu.sim import player as player_mod
from doomtpu.sim import thinkers as tk_mod
from doomtpu.sim.state import GameState
from doomtpu.sim.thinkers import ThinkerTables


def tick(
    level: DeviceLevel,
    tkt: ThinkerTables,
    state: GameState,
    controls,           # [B] i32 bitmask
    key,                # PRNG key
    turbo: float = 1.0,
) -> GameState:
    pos, angle, floor_h = player_mod.move_player(
        level, state.pos, state.angle, controls, turbo
    )
    light, count, up = tk_mod.step_lights(
        tkt, state.sector_light, state.light_count, state.light_up, key
    )
    mstate, mtics = tk_mod.step_mobjs(level, state.mobj_state, state.mobj_tics)
    return GameState(
        pos=pos, angle=angle, floor_height=floor_h,
        sector_light=light, light_count=count, light_up=up,
        mobj_state=mstate, mobj_tics=mtics,
        tick=state.tick + 1,
    )


def kill_everything(level: DeviceLevel, state: GameState) -> GameState:
    """K key (game.rs:414-419, map_objects.rs:123-127)."""
    s, t = tk_mod.kill_mobjs(level, state.mobj_state, state.mobj_tics)
    return _with_mobjs(state, s, t)


def explode_everything(level: DeviceLevel, state: GameState) -> GameState:
    s, t = tk_mod.explode_mobjs(level, state.mobj_state, state.mobj_tics)
    return _with_mobjs(state, s, t)


def respawn_everything(level: DeviceLevel, state: GameState) -> GameState:
    s, t = tk_mod.respawn_mobjs(level, state.mobj_state, state.mobj_tics)
    return _with_mobjs(state, s, t)


def _with_mobjs(state: GameState, mstate, mtics) -> GameState:
    from dataclasses import replace

    return replace(state, mobj_state=mstate, mobj_tics=mtics)


def rollout(
    level: DeviceLevel,
    tkt: ThinkerTables,
    cfg,
    state: GameState,
    controls_seq,       # [T, B] i32
    key,
    return_frames: bool = True,
    keys=None,          # [T, 2] u32: per-tick keys (overrides key)
    sort_shards: int = 1,
    live_reuse: bool = False,
):
    """lax.scan rollout: T ticks of step+render (the RL-env workload).

    With return_frames=True yields [T, B, H, W] palette-index frames —
    mind HBM (T*B*H*W*4 bytes); with False, a cheap per-step checksum
    [T, B] is emitted instead (frames are still fully rendered).

    `keys` lets a caller pre-split the per-tick keys (engine.rollout's
    segment chaining passes slices of one split so chained == unchained
    bit for bit).

    Each tick's render camera-sorts a VIEW of the state (the carried
    state stays in caller order; frames/checksums are unsorted back) —
    the same tile-coherence win engine.render gets, re-derived per tick
    because the poses move.  `sort_shards` keeps the sort shard-local
    under a device mesh (see render/camsort.py).

    live_reuse (PERF.md structural alt #3): the first tick's render
    additionally returns the pose-derived traversal/compaction
    metadata (and the camera-sort permutation); every later tick of
    the scan reuses it, skipping the seg_order + per-(tile, block)
    compaction argsorts.  Returns a third element — the summed
    `live_stale` counter: 0 proves the reused lists stayed supersets
    of every tick's true live set (frames bit-identical to
    live_reuse=False); callers assert it like the drop counters.
    Callers chaining segments (engine.rollout) refresh per segment.
    """
    from doomtpu.render.camsort import sort_state, unsort_out
    from doomtpu.render.frame import render_frame

    T = controls_seq.shape[0]
    if keys is None:
        keys = jax.random.split(key, T)

    B = state.pos.shape[0]
    C = cfg.render_chunk
    S = max(1, sort_shards)
    chunked = bool(C) and B > C and B % C == 0

    def one_render(st, reuse=None, want_reuse=False):
        idx, _, aux = render_frame(
            level, cfg, st.pos[:, 0], st.pos[:, 1], st.angle,
            st.floor_height, st.sector_light, st.mobj_state, st.timestamp,
            reuse=reuse, want_reuse=want_reuse,
        )
        out = idx if return_frames else idx.sum(axis=(1, 2))
        if want_reuse:
            return out, aux["reuse"]
        if reuse is not None:
            return out, aux["live_stale"]
        return out

    def render_state(st, loc=None, reuse=None, want_reuse=False):
        """Sort, chunk, render, unsort.  Returns (out, extra) where
        extra is the per-chunk reuse metadata (want_reuse), the summed
        live_stale (reuse), or None."""
        if loc is None and getattr(cfg, "camera_sort", False) and B // S > 8:
            st_r, loc = sort_state(st, B, S)
        elif loc is not None:
            st_r, _ = sort_state(st, B, S, loc=loc)
        else:
            st_r = st
        extra = None
        if chunked:
            chunks = jax.tree_util.tree_map(
                lambda x: x.reshape((B // C, C) + x.shape[1:]), st_r
            )
            if want_reuse:
                out, extra = jax.lax.map(
                    lambda c: one_render(c, want_reuse=True), chunks
                )
            elif reuse is not None:
                out, stale = jax.lax.map(
                    lambda a: one_render(a[0], reuse=a[1]),
                    (chunks, reuse),
                )
                extra = stale.sum()
            else:
                out = jax.lax.map(one_render, chunks)
            out = out.reshape((B,) + out.shape[2:])
        else:
            r = one_render(st_r, reuse=reuse, want_reuse=want_reuse)
            if want_reuse or reuse is not None:
                out, extra = r
            else:
                out = r
        if loc is not None:
            out = unsort_out(out, loc, B, S)
        return out, extra, loc

    if not live_reuse or T == 0:
        def body(st, inp):
            controls, k = inp
            st = tick(level, tkt, st, controls, k)
            out, _, _ = render_state(st)
            return st, out

        final, frames = jax.lax.scan(body, state, (controls_seq, keys))
        if live_reuse:        # T == 0: nothing to reuse, nothing stale
            return final, frames, jnp.zeros((), jnp.int32)
        return final, frames

    # ---- live-reuse rollout: tick 1 unrolled (computes metadata +
    # sort perm), ticks 2..T scan with the metadata closed over --------
    st1 = tick(level, tkt, state, controls_seq[0], keys[0])
    out1, reuse_meta, loc = render_state(st1, want_reuse=True)

    def body(st, inp):
        controls, k = inp
        st = tick(level, tkt, st, controls, k)
        out, stale, _ = render_state(st, loc=loc, reuse=reuse_meta)
        return st, (out, stale)

    if T > 1:
        final, (frames_rest, stales) = jax.lax.scan(
            body, st1, (controls_seq[1:], keys[1:])
        )
        frames = jnp.concatenate([out1[None], frames_rest], axis=0)
        stale = stales.sum()
    else:
        final, frames = st1, out1[None]
        stale = jnp.zeros((), jnp.int32)
    return final, frames, stale
