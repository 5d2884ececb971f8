"""Per-pixel resolve: span G-buffer -> palette indices (+ light/dist).

The wall scan already computed every slot's draw parameters into the
pool's data planes (see doomtpu.render.walls); resolve only folds the
winning slot per pixel (one unrolled K loop of packed selects — walls
draw during the scan, planes after, so planes beat walls and later slots
beat earlier ones) and finishes with exactly two per-pixel gathers: the
unified wall/flat texel+mask atlas and the sky overlay.

Arithmetic matches the reference exactly:
- walls: perspective-correct u via 1/z interpolation + linear v
  (bitmap_render.rs:213-276) — u computed in the scan, v here
- floors/ceilings: per-pixel inverse projection into the 64x64 flat
  (visplanes.rs:103-129)
- sky: angle-scrolled, undiminished (visplanes.rs:42-80)

Exactness domain (checked at load time): the winner-fold takes the LAST
covering drawn wall span per pixel, matching the reference's paint order
— exactly, as long as every solid/lower/upper wall-piece texture is
fully opaque (`DeviceLevel.wall_tex_all_opaque`, true for all vanilla
asset sets; transparency lives on two-sided mid textures, which take the
exact per-texel deferred path in doomtpu.render.things).  When a level
violates the invariant, DeviceLevel.build warns: at the 1-pixel span-
boundary overlaps a transparent winner texel shows black here, where the
reference's per-texel skip (bitmap_render.rs:265) would keep the earlier
wall's pixel.  tests/test_parity.py::test_wall_tex_opacity_invariant
pins both the invariant and the warning.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax

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
from doomtpu.render.walls import KIND_CEIL, KIND_FLOOR, KIND_MID, KIND_WALL


def unpack16_hi(v):
    return v >> 16  # arithmetic shift keeps the sign


def unpack16_lo(v):
    return (v << 16) >> 16  # sign-extend the low half


def resolve_frame(
    level: DeviceLevel,
    cfg: RenderConfig,
    frame: dict,
    pool, cnt,
    px, py, angle, floor_height,      # player state [B]
):
    """Walls + planes + sky -> (idx, light, dist, is_sky), each [B,H,W]."""
    spans, (d1, d2, d3, d4, d5, d6) = pool
    B, W, K = spans.shape
    H = cfg.height
    TH, TW = level.tex_pixels.shape[1], level.tex_pixels.shape[2]
    T = level.tex_pixels.shape[0]
    yy = jnp.arange(H, dtype=I32)[None, :, None]

    valid_k = jnp.arange(K, dtype=I32)[None, None, :] < cnt[..., None]
    kind = (spans >> 29) & 3
    y0 = ((spans >> 8) & 255) - 1
    y1 = (spans & 255) - 1
    drawable = spans >= 0  # bit 31 marks texture-less wall spans

    wall_ok = valid_k & (kind == KIND_WALL) & drawable
    plane_ok = valid_k & ((kind == KIND_FLOOR) | (kind == KIND_CEIL))
    py0 = jnp.maximum(0, y0)
    py1 = jnp.minimum(H - 1, y1)

    # ---------------- winner fold per pixel --------------------------------
    A1 = jnp.full((B, H, W), -1, I32)
    A2 = jnp.zeros((B, H, W), I32)
    A3 = jnp.zeros((B, H, W), I32)
    A4 = jnp.zeros((B, H, W), I32)
    A5 = jnp.zeros((B, H, W), I32)
    P1 = jnp.full((B, H, W), -1, I32)
    P2 = jnp.zeros((B, H, W), I32)

    for k in range(K):
        sel = lambda a: a[:, :, k][:, None, :]         # [B, 1, W]
        cover_w = (
            wall_ok[:, :, k][:, None, :]
            & (yy >= y0[:, :, k][:, None, :])
            & (yy <= y1[:, :, k][:, None, :])
        )
        A1 = jnp.where(cover_w, sel(d1), A1)
        A2 = jnp.where(cover_w, sel(d2), A2)
        A3 = jnp.where(cover_w, sel(d3), A3)
        A4 = jnp.where(cover_w, sel(d4), A4)
        A5 = jnp.where(cover_w, sel(d5), A5)
        cover_p = (
            plane_ok[:, :, k][:, None, :]
            & (yy >= py0[:, :, k][:, None, :])
            & (yy <= py1[:, :, k][:, None, :])
        )
        P1 = jnp.where(cover_p, sel(d1), P1)
        P2 = jnp.where(cover_p, sel(d2), P2)

    # materialize the folded winners once: without the barrier XLA may
    # re-fuse (recompute) the whole K-loop into each downstream consumer
    A1, A2, A3, A4, A5, P1, P2 = lax.optimization_barrier(
        (A1, A2, A3, A4, A5, P1, P2)
    )
    has_wall = A1 >= 0
    has_plane = P1 >= 0

    # ---------------- wall texel index per pixel ----------------------------
    by_p = unpack16_hi(A2)
    tyl_p = unpack16_lo(A2)
    off_y_p = unpack16_hi(A3)
    th_p = unpack16_lo(A3)
    light_w = unpack16_hi(A4)
    dist_w = unpack16_lo(A4)
    uy1_p = lax.bitcast_convert_type(A5, F32)
    ay = f32(yy - tyl_p) / f32(by_p - tyl_p)
    tyv = as_i16(f32(th_p) + smul(ay, uy1_p)) + off_y_p
    tyv = wrap_tex(tyv, jnp.maximum(th_p, 1), pow2=level.tex_sizes_pow2)
    ROWS = level.atlas_rows
    wall_index = jnp.maximum(A1, 0) * ROWS + tyv

    # ---------------- plane texel index per pixel ---------------------------
    light_p = P1 >> 22
    is_sky = (((P1 >> 21) & 1) != 0) & has_plane
    pflat_p = (P1 >> 8) & 0x1FFF
    pheight_p = unpack16_hi(P2)

    xxw = jnp.arange(W, dtype=I32)[None, None, :]
    vx = (f32(cfg.camera_focus_x) - f32(xxw)) / f32(ASPECT_RATIO_CORRECTION)
    vy = f32(cfg.camera_focus_y) - f32(yy)
    wz = f32(pheight_p) - f32(floor_height)[:, None, None] - f32(
        PLAYER_EYE_HEIGHT
    )
    wx = f32(cfg.game_camera_focus_x) * wz / vy
    wy = wz * vx / vy
    rx, ry = rotate(wx, wy, f32(angle)[:, None, None])
    ftx = (as_i16(rx) + as_i16(f32(px)[:, None, None])) & (FLAT_SIZE - 1)
    fty = (as_i16(ry) + as_i16(f32(py)[:, None, None])) & (FLAT_SIZE - 1)
    flat_index = (
        level.col_flat_off + pflat_p * FLAT_SIZE + ftx
    ) * ROWS + fty
    plane_dist = as_i16(wx)

    # ---------------- sky texel index (visplanes.rs:42-80) -----------------
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
    sky_index = (level.sky_tex * TW + stx) * ROWS + sty

    # ---------------- unified texel fetch -----------------------------------
    use_plane = has_plane & ~is_sky
    clipix = lambda ix: level.atlas_cm[
        jnp.clip(ix, 0, level.atlas_cm.shape[0] - 1)
    ]

    if level.sky_is_opaque:
        # single gather: plane / sky / wall are mutually exclusive sources
        index = jnp.where(
            use_plane, flat_index, jnp.where(is_sky, sky_index, wall_index)
        )
        packed = clipix(index)
        texel = packed & 0xFF
        opaque = (packed & 0x100) != 0
        use_sky = is_sky
        use_wall = has_wall & opaque & ~has_plane
        use_plane_px = use_plane & opaque

        idx = jnp.full((B, H, W), -1, I32)
        idx = jnp.where(use_wall | use_plane_px | use_sky, texel, idx)
        light = jnp.where(use_plane_px | use_sky, light_p, light_w)
        dist = jnp.where(use_plane_px | use_sky, plane_dist, dist_w)
        return idx, light, dist, use_sky

    # exact path for (pathological) masked sky textures: transparent sky
    # texels show the wall drawn earlier
    index = jnp.where(use_plane, flat_index, wall_index)
    packed = clipix(index)
    texel = packed & 0xFF
    opaque = (packed & 0x100) != 0
    sky_packed = clipix(sky_index)
    sky_opaque = (sky_packed & 0x100) != 0

    use_sky = is_sky & sky_opaque
    use_wall = has_wall & opaque & ~has_plane & ~use_sky
    use_plane_px = use_plane & opaque

    idx = jnp.full((B, H, W), -1, I32)
    idx = jnp.where(use_wall, texel, idx)
    under_sky_wall = is_sky & ~sky_opaque & has_wall & opaque
    idx = jnp.where(under_sky_wall, texel, idx)
    idx = jnp.where(use_plane_px, texel, idx)
    idx = jnp.where(use_sky, sky_packed & 0xFF, idx)

    light = jnp.where(use_plane_px | use_sky, light_p, light_w)
    light = jnp.where(under_sky_wall, light_w, light)
    dist = jnp.where(use_plane_px | use_sky, plane_dist, dist_w)
    dist = jnp.where(under_sky_wall, dist_w, dist)
    return idx, light, dist, use_sky


def shade(level: DeviceLevel, idx, light, dist, is_sky, onehot=None):
    """Palette lookup + diminish (bitmap_render.rs:190-208).

    Returns PACKED 0xRRGGBB int32 per pixel (a trailing 3-channel axis
    would be tile-padded to 128 lanes on TPU); unpack with
    doomtpu.utils.color.unpack_rgb.

    The palette lookup runs as a one-hot MXU contraction on TPU: XLA
    per-pixel gathers run at ~0.1 G/s on this chip (~150 ms per
    [256,200,320] batch) while the one-hot matmul takes ~17 ms, and the
    selection is exact — packed 0xRRGGBB values < 2^24 are exactly
    representable in the f32 accumulator, and the one-hot rows are
    exactly 0/1 in bf16.  `onehot=None` picks by backend.
    """
    factor = f32(light) / f32(255.0) - smul(dist, 1.0 / (16.0 * 256.0))
    factor = jnp.maximum(factor, 0.0)
    factor = jnp.where(is_sky, f32(1.0), factor)
    safe = jnp.maximum(idx, 0)
    if onehot is None:
        import jax

        onehot = jax.default_backend() != "cpu"
    if onehot:
        B, H, W = idx.shape
        oh = (
            safe.reshape(B, H * W)[..., None]
            == jnp.arange(256, dtype=I32)[None, None]
        ).astype(jnp.bfloat16)
        # channel values <= 255 are bf16-exact; pad to 8 columns
        pal8 = jnp.pad(level.palette, ((0, 0), (0, 5))).astype(jnp.bfloat16)
        chans3 = lax.dot_general(
            oh, pal8,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(B, H, W, 8)
        chans = [chans3[..., 0], chans3[..., 1], chans3[..., 2]]
    else:
        pal = level.palette_packed[safe]      # one gather for all channels
        chans = [f32((pal >> s) & 0xFF) for s in (16, 8, 0)]
    packed = jnp.zeros_like(idx)
    for shift, chan in zip((16, 8, 0), chans):
        # Rust `as u8`: trunc toward zero, saturate to [0, 255] (factor
        # can exceed 1 when the i16-saturated distance is negative, e.g.
        # on the exact horizon row where the inverse projection hits inf)
        byte = jnp.clip(jnp.trunc(chan * factor), 0.0, 255.0).astype(I32)
        packed = packed | (byte << shift)
    return jnp.where(idx >= 0, packed, 0)
