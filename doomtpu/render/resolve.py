"""Per-pixel resolve: span pool -> palette indices + RGB.

Walks each column's span pool once to find the last covering wall span
and the last covering plane span (planes draw after walls in the
reference frame sequence, mod.rs:118-122, so planes win per pixel), then
computes texture coordinates with the reference's exact arithmetic:

- walls: perspective-correct u via 1/z interpolation + linear v
  (bitmap_render.rs:213-276)
- floors/ceilings: per-pixel inverse projection into the 64x64 flat
  (visplanes.rs:103-129)
- sky: angle-scrolled, undiminished (visplanes.rs:42-80)
- light diminishing: float RGB scaling (bitmap_render.rs:190-208)

Known deviation (documented): a transparent texel inside a DRAWN solid
wall span falls back to black rather than to the wall behind it; standard
wall textures are opaque, masked textures only appear on deferred
two-sided mids which composite exactly (doomtpu.render.things).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from doomtpu.config import (
    ASPECT_RATIO_CORRECTION,
    FLAT_SIZE,
    PLAYER_EYE_HEIGHT,
    SKY_TEXTURE_HEIGHT,
    SKY_TEXTURE_WIDTH,
    RenderConfig,
)
from doomtpu.render.device import DeviceLevel
from doomtpu.render.jmath import (
    F32, I32, as_i16, div_trunc, f32, rem_trunc, rotate, smul, wrap_tex,
)
from doomtpu.render.walls import KIND_CEIL, KIND_FLOOR, KIND_WALL


def _gather_bg(field, g):
    """field [B, G(...)] indexed by g [B, H, W] -> [B, H, W]."""
    B = field.shape[0]
    flat = field.reshape(B, -1)
    return jnp.take_along_axis(flat, g.reshape(B, -1), axis=1).reshape(g.shape)


def find_winners(pool, cnt, H):
    """Last covering wall slot + last covering plane slot per pixel."""
    B, W, K = pool.shape
    yy = jnp.arange(H, dtype=I32)[None, :, None]       # [1, H, 1]
    wall = jnp.full((B, H, W), -1, I32)
    plane = jnp.full((B, H, W), -1, I32)
    for k in range(K):
        slot = pool[:, :, k]                            # [B, W]
        valid = (k < cnt)
        kind = (slot >> 29) & 3
        y0 = ((slot >> 8) & 255) - 1
        y1 = (slot & 255) - 1

        is_wall = valid & (kind == KIND_WALL)
        cover_w = (yy >= y0[:, None, :]) & (yy <= y1[:, None, :])
        wall = jnp.where(is_wall[:, None, :] & cover_w, slot[:, None, :], wall)

        is_plane = valid & ((kind == KIND_FLOOR) | (kind == KIND_CEIL))
        ty0 = jnp.maximum(0, y0)
        ty1 = jnp.minimum(H - 1, y1)
        cover_p = (yy >= ty0[:, None, :]) & (yy <= ty1[:, None, :])
        plane = jnp.where(
            is_plane[:, None, :] & cover_p, slot[:, None, :], plane
        )
    return wall, plane


def resolve_frame(
    level: DeviceLevel,
    cfg: RenderConfig,
    frame: dict,
    pool, cnt,
    px, py, angle, floor_height,      # player state [B]
):
    """Walls + planes + sky -> (idx [B,H,W] i32, light [B,H,W], dist, sky)."""
    B, W, K = pool.shape
    H = cfg.height
    wall, plane = find_winners(pool, cnt, H)

    yy = jnp.arange(H, dtype=I32)[None, :, None]
    xxw = jnp.arange(W, dtype=I32)[None, None, :]

    # ---------------- wall pixels ----------------------------------------
    has_wall = wall >= 0
    witem = jnp.where(has_wall, (wall >> 16) & 0x1FFF, 0)
    wg = witem >> 2

    # wall texture must exist to be drawn (draws flag baked per piece)
    draws = _gather_bg(frame["draws"].reshape(B, -1), witem)
    has_wall = has_wall & draws

    x0 = _gather_bg(frame["x0"], wg)
    x1 = _gather_bg(frame["x1"], wg)
    uz0 = _gather_bg(frame["lsx"], wg)
    uz1 = _gather_bg(frame["lex"], wg)
    length = _gather_bg(frame["length"], wg)
    start_off = _gather_bg(frame["start_offset"], wg)
    off_x = _gather_bg(frame["offset_x_total"], wg)
    light_w = _gather_bg(frame["light"], wg)
    tex_id = _gather_bg(frame["tex"].reshape(B, -1), witem)
    off_y = _gather_bg(frame["off_y"].reshape(B, -1), witem)
    uy1 = _gather_bg(frame["uy1"].reshape(B, -1), witem)
    yb_s = _gather_bg(frame["yb_s"].reshape(B, -1), witem)
    yb_d = _gather_bg(frame["yb_d"].reshape(B, -1), witem)
    yt_s = _gather_bg(frame["yt_s"].reshape(B, -1), witem)
    yt_d = _gather_bg(frame["yt_d"].reshape(B, -1), witem)

    one = f32(1.0)
    ax = f32(xxw - x0) / f32(x1 - x0)
    inv0 = one / f32(uz0)
    inv1 = one / f32(uz1)
    denom = smul(one - ax, inv0) + smul(ax, inv1)
    u = (
        smul(one - ax, f32(0.0) / f32(uz0)) + smul(ax, length / f32(uz1))
    ) / denom
    tex_safe = jnp.maximum(tex_id, 0)
    tw = level.tex_w[tex_safe]
    th = level.tex_h[tex_safe]
    tx = as_i16(u) + as_i16(start_off) + off_x
    tx = wrap_tex(tx, jnp.maximum(tw, 1))
    zdist = as_i16(((one - ax) + ax) / denom)

    by = as_i16(f32(yb_s) + smul(f32(xxw - x0), yb_d))
    tyl = as_i16(f32(yt_s) + smul(f32(xxw - x0), yt_d))
    ay = f32(yy - tyl) / f32(by - tyl)
    tyv = as_i16(f32(th) + smul(ay, uy1)) + off_y
    tyv = wrap_tex(tyv, jnp.maximum(th, 1))

    TH, TW = level.tex_pixels.shape[1], level.tex_pixels.shape[2]
    flat_ix = tex_safe * (TH * TW) + tyv * TW + tx
    wall_idx = level.tex_pixels.reshape(-1)[flat_ix]
    wall_opaque = level.tex_mask.reshape(-1)[flat_ix]
    has_wall = has_wall & wall_opaque

    # ---------------- plane pixels -----------------------------------------
    has_plane = plane >= 0
    pitem = jnp.where(has_plane, (plane >> 16) & 0x1FFF, 0)
    pg = pitem >> 2
    pkind = (plane >> 29) & 3

    flat_fl = _gather_bg(frame["floor_flat"], pg)
    flat_ce = _gather_bg(frame["ceil_flat"], pg)
    h_fl = _gather_bg(frame["floor_h_i"], pg)
    h_ce = _gather_bg(frame["ceil_h_i"], pg)
    light_p = _gather_bg(frame["light"], pg)
    is_floor = pkind == KIND_FLOOR
    pflat = jnp.where(is_floor, flat_fl, flat_ce)
    pheight = jnp.where(is_floor, h_fl, h_ce)
    is_sky = level.flat_is_sky[pflat] & has_plane

    # inverse projection (visplanes.rs:103-129)
    pxb = f32(px)[:, None, None]
    pyb = f32(py)[:, None, None]
    angb = f32(angle)[:, None, None]
    fhb = f32(floor_height)[:, None, None]
    vx = (f32(cfg.camera_focus_x) - f32(xxw)) / f32(ASPECT_RATIO_CORRECTION)
    vy = f32(cfg.camera_focus_y) - f32(yy)
    wz = f32(pheight) - fhb - f32(PLAYER_EYE_HEIGHT)
    wx = f32(cfg.game_camera_focus_x) * wz / vy
    wy = wz * vx / vy
    rx, ry = rotate(wx, wy, angb)
    ftx = (as_i16(rx) + as_i16(pxb)) & (FLAT_SIZE - 1)
    fty = (as_i16(ry) + as_i16(pyb)) & (FLAT_SIZE - 1)
    plane_idx = level.flat_pixels.reshape(-1)[
        pflat * (FLAT_SIZE * FLAT_SIZE) + fty * FLAT_SIZE + ftx
    ]
    plane_dist = as_i16(wx)

    # sky (visplanes.rs:42-80)
    stw, sth = SKY_TEXTURE_WIDTH, SKY_TEXTURE_HEIGHT
    tx_off = as_i16(
        -f32(stw) * f32(angle)[:, None, None] / f32(math.pi / 2.0)
    ) + stw
    tx_off = jnp.where(
        tx_off < 0, tx_off + stw * (1 - div_trunc(tx_off, stw)), tx_off
    )
    stx = rem_trunc(as_i16(f32(xxw) * f32(stw) / f32(W)) + tx_off, stw)
    sty = as_i16(f32(yy) * f32(sth) * f32(2.0) / f32(H))
    sty = jnp.where(sty < 0, sty + sth, sty)
    sty = rem_trunc(sty, sth)
    TH2, TW2 = level.tex_pixels.shape[1], level.tex_pixels.shape[2]
    sky_flat_ix = level.sky_tex * (TH2 * TW2) + sty * TW2 + stx
    sky_idx = level.tex_pixels.reshape(-1)[sky_flat_ix]
    sky_opaque = level.tex_mask.reshape(-1)[sky_flat_ix]

    # ---------------- combine ------------------------------------------------
    # planes beat walls; transparent sky texels fall through to walls
    use_sky = is_sky & sky_opaque
    use_plane = has_plane & ~is_sky
    use_wall = has_wall & ~use_plane & ~use_sky

    idx = jnp.full((B, H, W), -1, I32)
    idx = jnp.where(use_wall, wall_idx, idx)
    idx = jnp.where(use_plane, plane_idx, idx)
    idx = jnp.where(use_sky, sky_idx, idx)

    light = jnp.where(use_plane, light_p, light_w)
    dist = jnp.where(use_plane, plane_dist, zdist)
    return idx, light, dist, use_sky


def shade(level: DeviceLevel, idx, light, dist, is_sky):
    """Palette lookup + diminish (bitmap_render.rs:190-208) -> RGB u8."""
    factor = f32(light) / f32(255.0) - smul(dist, 1.0 / (16.0 * 256.0))
    factor = jnp.maximum(factor, 0.0)
    factor = jnp.where(is_sky, f32(1.0), factor)
    col = level.palette[jnp.maximum(idx, 0)]            # [B,H,W,3] f32
    rgb = jnp.trunc(col * factor[..., None]).astype(jnp.uint8)
    return jnp.where((idx >= 0)[..., None], rgb, 0)
