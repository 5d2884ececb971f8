"""Frame orchestration: compose camera -> order -> scan -> resolve -> things.

`render_frame` is the batched, jit-able equivalent of
Renderer::render (renderer/mod.rs:118-136) for B cameras at once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from doomtpu.config import RenderConfig
from doomtpu.render import camera as cam
from doomtpu.render import resolve as res
from doomtpu.render import walls
from doomtpu.render.device import DeviceLevel


def _stages_1_2(level, cfg, px, py, angle, floor_height, sector_light, timestamp):
    frame = cam.build_seg_frame(
        level, cfg, px, py, angle, floor_height, sector_light, timestamp
    )
    # materialize once: the frame fields feed many consumers and XLA
    # otherwise re-fuses (recomputes) the camera stage into each
    frame = jax.lax.optimization_barrier(frame)
    rank = cam.traversal_rank(level, px, py)
    order = cam.seg_order(level, rank)
    B = px.shape[0]
    if cfg.use_pallas_scan and B % 8 == 0 and jax.default_backend() != "cpu":
        from doomtpu.ops.pallas_scan import wall_scan_pallas

        pool, cnt, overflow = wall_scan_pallas(level, cfg, frame, order)
    else:
        pool, cnt, overflow = walls.wall_scan(level, cfg, frame, order)
    idx, light, dist, is_sky = res.resolve_frame(
        level, cfg, frame, pool, cnt, px, py, angle, floor_height
    )
    # materialize: the deferred pass consumes these in several composite
    # steps and XLA otherwise re-fuses (recomputes) the resolve fold into
    # each consumer (see PERF.md)
    idx, light, dist, is_sky = jax.lax.optimization_barrier(
        (idx, light, dist, is_sky)
    )
    aux = {
        "frame": frame, "order": order, "pool": pool, "cnt": cnt,
        "overflow": overflow, "light": light, "dist": dist, "is_sky": is_sky,
    }
    return idx, light, dist, is_sky, aux


def render_walls_planes(
    level: DeviceLevel,
    cfg: RenderConfig,
    px, py, angle, floor_height,           # [B] player state
    sector_light,                          # [B, SEC]
    timestamp,                             # [B]
):
    """Stages 1-2 only: solid walls + visplanes/sky -> (idx, rgb, aux)."""
    idx, light, dist, is_sky, aux = _stages_1_2(
        level, cfg, px, py, angle, floor_height, sector_light, timestamp
    )
    rgb = res.shade(level, idx, light, dist, is_sky)
    return idx, rgb, aux


def render_frame(
    level: DeviceLevel,
    cfg: RenderConfig,
    px, py, angle, floor_height,           # [B] player state
    sector_light,                          # [B, SEC]
    mobj_state,                            # [B, MO]
    timestamp,                             # [B]
):
    """The full frame: walls, planes, sky, sprites, masked mids.

    Batched equivalent of Renderer::render (renderer/mod.rs:118-136).
    Returns (idx [B,H,W] palette indices with -1 = unwritten,
    rgb [B,H,W] packed 0xRRGGBB i32, aux dict).
    """
    from doomtpu.render import things

    idx, light, dist, is_sky, aux = _stages_1_2(
        level, cfg, px, py, angle, floor_height, sector_light, timestamp
    )
    idx2, light2, dist2, is_sky, daux = things.deferred_pass(
        level, cfg, aux["frame"], aux["pool"], aux["cnt"], aux["order"],
        px, py, angle, floor_height, sector_light, mobj_state,
        idx, light, dist, is_sky,
    )
    aux.update(daux)
    rgb = res.shade(level, idx2, light2, dist2, is_sky)
    return idx2, rgb, aux
