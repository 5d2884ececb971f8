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


def render_walls_planes(
    level: DeviceLevel,
    cfg: RenderConfig,
    px, py, angle, floor_height,           # [B] player state
    sector_light,                          # [B, SEC]
    timestamp,                             # [B]
):
    """Stages 1-2: solid walls + visplanes/sky. Returns (idx, rgb, aux)."""
    frame = cam.build_seg_frame(
        level, cfg, px, py, angle, floor_height, sector_light, timestamp
    )
    rank = cam.traversal_rank(level, px, py)
    order = cam.seg_order(level, rank)
    pool, cnt, overflow = walls.wall_scan(level, cfg, frame, order)
    idx, light, dist, is_sky = res.resolve_frame(
        level, cfg, frame, pool, cnt, px, py, angle, floor_height
    )
    rgb = res.shade(level, idx, light, dist, is_sky)
    aux = {
        "frame": frame, "order": order, "pool": pool, "cnt": cnt,
        "overflow": overflow, "light": light, "dist": dist, "is_sky": is_sky,
    }
    return idx, rgb, aux
