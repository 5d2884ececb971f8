"""Deferred pass: map-object sprites + masked two-sided mid walls.

Models renderer/map_objects.rs:19-241 without data-dependent control
flow:

- each live mobj becomes a billboard line perpendicular to the view
  (rotation frame chosen from player-vs-object angle), FOV-clipped and
  projected exactly like a wall
- per-column sprite clip bounds accumulate from the span pool: solid
  pieces clip via their extends flags and clipped y values, two-sided
  pieces clip to the portal opening with full (unclipped) edge values
  read straight from the pool's G-buffer, honoring the sky-hack
  draw_ceiling flag (:127-166)
- the painter's interleave ("draw every not-yet-drawn masked seg behind
  the sprite, then the sprite", :216-240) becomes a static sort key:
  sprites sort back-to-front by clipped-start-x, a masked seg draws just
  before the FIRST sprite it is behind (ties in reversed traversal
  order), or after all sprites if behind none

Compositing runs as one fori_loop over the key-sorted item list, each
step masking its pixels into the frame (transparent texels skipped, so
overlapping masked walls/sprites layer exactly as the reference does).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

import numpy as np

from doomtpu.config import PLAYER_EYE_HEIGHT, RenderConfig
from doomtpu.render import camera as cam
from doomtpu.render.device import DeviceLevel
from doomtpu.render.jmath import (
    F32, I32, as_i16, f32, is_left_of, rotate, smul, wrap_tex,
)
from doomtpu.render.resolve import unpack16_hi, unpack16_lo
from doomtpu.render.walls import (
    KIND_MID, KIND_WALL, SPAN_DC, SPAN_E2B, SPAN_E2T,
)

_PI = np.float32(math.pi)


def _fmod(a, b):
    return jnp.fmod(f32(a), f32(b))


def sprite_rotation(player_angle, mobj_angle):
    """0..7 rotation index (:53-67), f32 like the reference."""
    two_pi = f32(2.0) * _PI
    angle = f32(f32(f32(player_angle) - f32(mobj_angle)) - _PI)
    angle = angle + f32(_PI / np.float32(16.0))
    angle = _fmod(angle, two_pi)
    angle = jnp.where(angle < 0.0, angle + two_pi, angle)
    angle = _fmod(angle, two_pi)
    rot = f32(f32(angle * f32(8.0)) / two_pi)
    return jnp.clip(jnp.trunc(rot), 0, 255).astype(I32)


def is_behind_vertex(lsx, lsy, lex, ley, vx, vy):
    """bitmap_render.rs:137-165 (batched, broadcasting args)."""
    min_x = jnp.minimum(lsx, lex)
    max_x = jnp.maximum(lsx, lex)
    return (min_x > vx) | (
        (max_x > vx) & ~is_left_of(vx, vy, lsx, lsy, lex, ley)
    )


def deferred_pass(
    level: DeviceLevel,
    cfg: RenderConfig,
    frame: dict,
    pool, cnt, order,
    px, py, angle, floor_height,        # [B]
    sector_light,                        # [B, SEC]
    mobj_state,                          # [B, MO]
    idx, light, dist, is_sky,            # wall/plane resolve outputs
):
    """Composite sprites + masked mids over the resolved frame."""
    spans, (d1, d2, d3, d4, d5, d6) = pool
    B, W, K = spans.shape
    H = cfg.height
    G = level.num_segs
    MO = level.num_mobjs

    dsegs_j = level.dseg_ix
    D = dsegs_j.shape[0]
    n_items = MO + D
    if n_items == 0:
        return idx, light, dist, is_sky

    yy = jnp.arange(H, dtype=I32)[None, :, None]
    xcol = jnp.arange(W, dtype=I32)[None, :]

    # ---------------- sprite setup [B, MO] --------------------------------
    if MO > 0:
        state = mobj_state                                      # [B, MO]
        alive = state != 0                                      # S_NULL
        sprite_ix = level.state_sprite[state]
        frame_n = level.state_frame[state]
        bright = level.state_full_bright[state]
        rot = sprite_rotation(angle[:, None], level.mobj_angle[None])
        max_frame = level.spr_table.shape[1]
        frame_ok = frame_n < max_frame
        pic = level.spr_table[
            sprite_ix, jnp.minimum(frame_n, max_frame - 1), rot
        ]
        valid = alive & frame_ok & (pic >= 0) & (level.mobj_sector[None] >= 0)
        pic_s = jnp.maximum(pic, 0)

        mx = level.mobj_pos[None, :, 0] - px[:, None]
        my = level.mobj_pos[None, :, 1] - py[:, None]
        vpx, vpy = rotate(mx, my, -angle[:, None])
        w_pic = level.spr_w[pic_s]
        half = f32(w_pic) / f32(2.0)
        ok, lsx, lsy, lex, ley, start_off = cam.clip_to_viewport(
            vpx, vpy + half, vpx, vpy - half
        )
        valid = valid & ok

        sec = jnp.maximum(level.mobj_sector, 0)
        light_m = jnp.where(bright, 255, sector_light[:, sec])
        ph = f32(floor_height)[:, None] + f32(PLAYER_EYE_HEIGHT)
        z_f = f32(level.sector_floor_h[sec])[None]
        pic_h = f32(level.spr_h[pic_s])
        top_off = f32(level.spr_top[pic_s])
        bottom_h = z_f - ph
        top_h = ((z_f + pic_h) - f32(1.0)) - ph
        off_adj = top_off - pic_h
        bottom_h = bottom_h + off_adj
        top_h = top_h + off_adj

        bsx = cam.project_x(cfg, lsx, lsy)
        bex = cam.project_x(cfg, lex, ley)
        yb_s = cam.project_y(cfg, lsx, bottom_h)
        yb_e = cam.project_y(cfg, lex, bottom_h)
        yt_s = cam.project_y(cfg, lsx, top_h)
        yt_e = cam.project_y(cfg, lex, top_h)
        denom_x = f32(bsx - bex)
        yb_d = f32(yb_s - yb_e) / denom_x
        yt_d = f32(yt_s - yt_e) / denom_x

        # ---------------- seg-based clip bounds from the pool -------------
        behind = is_behind_vertex(
            frame["lsx"][:, :, None], frame["lsy"][:, :, None],
            frame["lex"][:, :, None], frame["ley"][:, :, None],
            vpx[:, None, :], vpy[:, None, :],
        )                                                       # [B, G, MO]

        # one MXU one-hot contraction answers, for every pool slot at
        # once: is the slot's seg in front of each sprite — replacing K
        # rounds of per-slot gathers (exact: one-hot selection of 0/1
        # bits).  The one-hot materializes at [B, W, K, G] bf16, so
        # large maps/batches fall back to per-slot gathers (static size
        # check).  Extends/draw-ceiling flags ride in the span word.
        g_all = d6                                               # [B, W, K]
        use_matmul = B * W * K * G * 2 <= 1_000_000_000
        rhs = (~behind).astype(jnp.bfloat16)                     # [B, G, MO]
        if use_matmul:
            onehot_g = (
                g_all[..., None] == jnp.arange(G, dtype=I32)
            ).astype(jnp.bfloat16)                               # [B, W, K, G]
            front_all = lax.dot_general(
                onehot_g.reshape(B, W * K, G), rhs,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).reshape(B, W, K, MO) >= 0.5
        else:
            rhs_bool = rhs >= 0.5                                # [B, G, MO]
            front_all = jnp.take_along_axis(
                rhs_bool, g_all.reshape(B, -1)[:, :, None], axis=1
            ).reshape(B, W, K, MO)

        tsc = jnp.full((B, MO, W), -1, I32)
        bsc = jnp.full((B, MO, W), H, I32)
        for k in range(K):
            slot = spans[:, :, k]                               # [B, W]
            k_ok = k < cnt
            kind = (slot >> 29) & 3
            y0 = ((slot >> 8) & 255) - 1                        # clipped top
            y1 = (slot & 255) - 1                               # clipped bottom

            front = front_all[:, :, k, :] & k_ok[:, :, None]     # [B, W, MO]
            front = jnp.moveaxis(front, 2, 1)                    # [B, MO, W]

            # extends flags recorded in the span word at emission
            e2b_k = (slot & SPAN_E2B) != 0
            e2t_k = (slot & SPAN_E2T) != 0
            bsc = jnp.where(
                front & e2b_k[:, None, :],
                jnp.minimum(bsc, y0[:, None, :]), bsc,
            )
            tsc = jnp.where(
                front & e2t_k[:, None, :],
                jnp.maximum(tsc, y1[:, None, :]), tsc,
            )

            # portals clip with the FULL edges, straight from the G-buffer
            is_mid = kind == KIND_MID
            by_full = unpack16_hi(d2[:, :, k])
            ty_full = unpack16_lo(d2[:, :, k])
            dc_k = ((slot & SPAN_DC) != 0) & is_mid
            tsc = jnp.where(
                front & dc_k[:, None, :],
                jnp.maximum(tsc, ty_full[:, None, :]), tsc,
            )
            bsc = jnp.where(
                front & is_mid[:, None, :],
                jnp.minimum(bsc, by_full[:, None, :]), bsc,
            )

        tsc, bsc = lax.optimization_barrier((tsc, bsc))

        # back-to-front order: stable sort by as_i16(lsx) then reverse
        key_m = as_i16(lsx)
        asc = jnp.argsort(
            key_m * (MO + 1) + jnp.arange(MO, dtype=I32)[None], axis=1,
            stable=True,
        ).astype(I32)
        draw_order = asc[:, ::-1]                                # [B, MO]
        j_of_m = jnp.zeros((B, MO), I32).at[
            jnp.arange(B)[:, None], draw_order
        ].set(jnp.arange(MO, dtype=I32)[None])
    else:
        valid = jnp.zeros((B, 0), bool)
        draw_order = jnp.zeros((B, 0), I32)

    # ---------------- masked mid seg items --------------------------------
    if D > 0:
        if MO > 0:
            midx = f32(f32(lsx + lex) / f32(2.0))
            midy = f32(f32(lsy + ley) / f32(2.0))
            behind_mid = is_behind_vertex(
                frame["lsx"][:, dsegs_j, None], frame["lsy"][:, dsegs_j, None],
                frame["lex"][:, dsegs_j, None], frame["ley"][:, dsegs_j, None],
                midx[:, None, :], midy[:, None, :],
            )                                                   # [B, D, MO]
            b_ord = jnp.take_along_axis(
                behind_mid & valid[:, None, :], draw_order[:, None, :], axis=2
            )
            j_first = jnp.where(
                b_ord.any(-1), jnp.argmax(b_ord, axis=-1).astype(I32), MO
            )
        else:
            j_first = jnp.full((B, D), 0, I32)

        inv_pos = jnp.zeros((B, G), I32).at[
            jnp.arange(B)[:, None], order
        ].set(jnp.arange(G, dtype=I32)[None])
        tie_d = (G - 1) - inv_pos[:, dsegs_j]                    # [B, D]
        dseg_valid = frame["valid"][:, dsegs_j] & frame["active"][:, dsegs_j, 1]
    else:
        j_first = jnp.zeros((B, 0), I32)
        tie_d = jnp.zeros((B, 0), I32)
        dseg_valid = jnp.zeros((B, 0), bool)

    # ---------------- unified item table -----------------------------------
    TIE = G + 1
    if MO > 0:
        key_sprite = (2 * j_of_m + 1) * TIE
    else:
        key_sprite = jnp.zeros((B, 0), I32)
    key_seg = (2 * j_first) * TIE + tie_d
    item_key = jnp.concatenate([key_sprite, key_seg], axis=1)    # [B, I]
    item_valid = jnp.concatenate([valid, dseg_valid], axis=1)
    item_key = jnp.where(item_valid, item_key, jnp.iinfo(jnp.int32).max)
    item_sorted = jnp.argsort(item_key, axis=1, stable=True).astype(I32)

    # ---------------- per-item column data [B, I, W] -------------------------
    PH, PW = level.spr_pixels.shape[1], level.spr_pixels.shape[2]
    TH, TW = level.tex_pixels.shape[1], level.tex_pixels.shape[2]

    if MO > 0:
        # sprite columns: perspective u + depth (bitmap_render.rs:241-251)
        one = f32(1.0)
        ax = f32(xcol[:, None] - bsx[..., None]) / f32((bex - bsx)[..., None])
        inv0 = (one / f32(lsx))[..., None]
        inv1 = (one / f32(lex))[..., None]
        denom = smul(one - ax, inv0) + smul(ax, inv1)
        s_len = jnp.sqrt(
            smul(lsx - lex, lsx - lex) + smul(lsy - ley, lsy - ley)
        )
        u = (
            smul(one - ax, (f32(0.0) / f32(lsx))[..., None])
            + smul(ax, (s_len / f32(lex))[..., None])
        ) / denom
        s_tx = as_i16(u) + as_i16(start_off)[..., None]
        s_tx = wrap_tex(s_tx, jnp.maximum(w_pic, 1)[..., None])
        s_zd = as_i16(((one - ax) + ax) / denom)

        x0i = as_i16(bsx)
        x1i = as_i16(bex)                                        # exclusive
        in_range = (xcol[:, None] >= x0i[..., None]) & (
            xcol[:, None] < x1i[..., None]
        )
        s_by = as_i16(
            f32(yb_s)[..., None]
            + smul(f32(xcol[:, None] - bsx[..., None]), yb_d[..., None])
        )
        s_ty = as_i16(
            f32(yt_s)[..., None]
            + smul(f32(xcol[:, None] - bsx[..., None]), yt_d[..., None])
        )
        s_ct = jnp.maximum(0, jnp.maximum(s_ty, tsc))
        s_cb = jnp.minimum(H - 1, jnp.minimum(s_by, bsc))
        spr_i = dict(
            present=in_range & valid[..., None],
            ct=s_ct, cb=s_cb, by=s_by, ty=s_ty,
            colbase=level.col_spr_off + pic_s[..., None] * PW + s_tx,
            off_y=jnp.zeros((B, MO, W), I32),
            th=jnp.broadcast_to(level.spr_h[pic_s][..., None], (B, MO, W)),
            light=jnp.broadcast_to(light_m[..., None], (B, MO, W)),
            zd=s_zd,
            uy1=jnp.broadcast_to((top_h - bottom_h)[..., None], (B, MO, W)),
            is_sprite=jnp.ones((B, MO, W), bool),
        )

    if D > 0:
        # recover each masked seg's recorded columns + draw data from pool
        present = jnp.zeros((B, D, W), bool)
        ct = jnp.zeros((B, D, W), I32)
        cb = jnp.zeros((B, D, W), I32)
        sd = [jnp.zeros((B, D, W), I32) for _ in range(5)]
        for k in range(K):
            slot = spans[:, :, k]
            k_ok = k < cnt
            kind = (slot >> 29) & 3
            g_k = d6[:, :, k]
            hit = (kind == KIND_MID) & k_ok                      # [B, W]
            match = hit[:, None, :] & (
                g_k[:, None, :] == dsegs_j[None, :, None]
            )
            y0 = ((slot >> 8) & 255) - 1
            y1 = (slot & 255) - 1
            present = present | match
            ct = jnp.where(match, y0[:, None, :], ct)
            cb = jnp.where(match, y1[:, None, :], cb)
            for di, dplane in enumerate((d1, d2, d3, d4, d5)):
                sd[di] = jnp.where(match, dplane[:, :, k][:, None, :], sd[di])
        seg_i = dict(
            present=present & dseg_valid[..., None],
            ct=ct, cb=cb,
            by=unpack16_hi(sd[1]), ty=unpack16_lo(sd[1]),
            colbase=sd[0],
            off_y=unpack16_hi(sd[2]), th=unpack16_lo(sd[2]),
            light=unpack16_hi(sd[3]), zd=unpack16_lo(sd[3]),
            uy1=lax.bitcast_convert_type(sd[4], F32),
            is_sprite=jnp.zeros((B, D, W), bool),
        )

    def cat(name):
        if MO == 0:
            return seg_i[name]
        if D == 0:
            return spr_i[name]
        return jnp.concatenate([spr_i[name], seg_i[name]], axis=1)

    items = {k: cat(k) for k in (spr_i if MO > 0 else seg_i)}
    items = lax.optimization_barrier(items)

    # ---------------- composite in sorted order ------------------------------
    ROWS = level.atlas_rows
    C = level.atlas_cols.shape[0]
    c_iota = jnp.arange(C, dtype=I32)
    r_iota = jnp.arange(ROWS, dtype=I32)
    # one-hot sampling materializes [B, W, C] per item; big atlases fall
    # back to the per-pixel gather from the column-major packed atlas
    use_onehot_sample = B * W * C * 2 <= 400_000_000

    def body(i, carry):
        idx, light, dist, is_sky = carry
        sel = item_sorted[:, i][:, None]                         # [B, 1]

        def g2(name):
            a = items[name]
            return jnp.take_along_axis(a, sel[..., None], axis=1)[:, 0]

        present = g2("present")                                   # [B, W]
        ct, cb = g2("ct"), g2("cb")
        by, ty = g2("by"), g2("ty")
        colbase = g2("colbase")
        off_y, th = g2("off_y"), g2("th")
        light_i, zd = g2("light"), g2("zd")
        uy1 = g2("uy1")
        is_spr = g2("is_sprite")
        ok = jnp.take_along_axis(item_valid, sel, axis=1)[:, 0]  # [B]

        cover = (
            present[:, None, :] & ok[:, None, None]
            & (yy >= ct[:, None, :]) & (yy <= cb[:, None, :])
        )                                                         # [B, H, W]
        ay = f32(yy - ty[:, None, :]) / f32((by - ty)[:, None, :])
        tyv = as_i16(
            f32(th[:, None, :]) + smul(ay, uy1[:, None, :])
        ) + off_y[:, None, :]
        tyv = wrap_tex(tyv, jnp.maximum(th, 1)[:, None, :])

        if use_onehot_sample:
            # MXU one-hot texel sampling: fetch each column's texture
            # column, then select the pixel's row — both exact (one-hot
            # selection of bf16-exact palette values; -1 = transparent)
            onehot_c = (colbase[..., None] == c_iota).astype(jnp.bfloat16)
            texcol = lax.dot_general(
                onehot_c, level.atlas_cols,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                  # [B, W, ROWS]
            onehot_r = (tyv[..., None] == r_iota).astype(jnp.bfloat16)
            texel_f = lax.dot_general(
                onehot_r.transpose(0, 2, 1, 3),                # [B, W, H, ROWS]
                texcol.astype(jnp.bfloat16)[..., None],        # [B, W, ROWS, 1]
                dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32,
            )[..., 0].transpose(0, 2, 1)                       # [B, H, W]
            opaque = texel_f >= 0
            texel = texel_f.astype(I32)
        else:
            t_ix = colbase[:, None, :] * ROWS + tyv
            packed = level.atlas_cm[
                jnp.clip(t_ix, 0, level.atlas_cm.shape[0] - 1)
            ]
            texel = packed & 0xFF
            opaque = (packed & 0x100) != 0

        write = cover & opaque
        idx = jnp.where(write, texel, idx)
        light = jnp.where(write, light_i[:, None, :], light)
        dist = jnp.where(write, zd[:, None, :], dist)
        is_sky = is_sky & ~write
        return idx, light, dist, is_sky

    idx, light, dist, is_sky = lax.fori_loop(
        0, n_items, body, (idx, light, dist, is_sky)
    )
    return idx, light, dist, is_sky
