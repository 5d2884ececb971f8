"""The occlusion wall scan: a lax.scan over segs in traversal order.

This is the TPU formulation of the reference's sequentially-carried
per-column occlusion state (segs.rs:37-39, 121-350): cameras and screen
columns are vectorized; only the seg axis is sequential.  Instead of
drawing immediately, each step emits fixed-size SPAN records into a
per-column pool; the resolve stage then turns spans into pixels.

The pool is a span G-BUFFER: besides the packed span word, every slot
carries the fully-resolved draw parameters (computed right here, where
all seg data is already in registers), so the resolve stage never
gathers per-piece data:

    span  nodraw(1, sign bit) | kind(2) | dc(1) | e2b(1) | e2t(1)
          | y0+1 (8) | y1+1 (8)
    d1    walls/mids: texel column base (tex*TH*TW + tx)
          planes:     light(8) << 22 | is_sky << 21 | flat(13) << 8
    d2    walls/mids: bottom_y(16) | top_y(16)   (full, for v interp)
          planes:     plane height (16) << 16
    d3    walls/mids: off_y(16) | tex_h(16)
    d4    walls/mids: light(16) | z-dist(16)
    d5    walls/mids: uy1 (f32 bits)
    d6    seg index g (full i32 — no seg-count cap from packing)

e2b/e2t are the sprite-clip extends flags (set on solid/lower/upper wall
spans at emission, where piece id + solidity are in registers); dc is the
seg's draw_ceiling for two-sided mids.  The seg index rides in its own
plane so maps of any size fit (the reference has no cap, segs.rs:17-42).

Pool slot order encodes draw order within a stage (walls draw during the
scan, planes after — so planes beat walls per pixel, and within a stage a
later slot beats an earlier one).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from doomtpu.config import RenderConfig
from doomtpu.render.device import DeviceLevel
from doomtpu.render.jmath import F32, I32, as_i16, f32, smul, wrap_tex

KIND_WALL = 0
KIND_FLOOR = 1
KIND_CEIL = 2
KIND_MID = 3

N_PLANES = 6  # d1..d6

SPAN_E2T = 1 << 26     # wall span extends-to-top (sprite clip)
SPAN_E2B = 1 << 27     # wall span extends-to-bottom
SPAN_DC = 1 << 28      # mid span's seg draws its ceiling (sky hack)
SPAN_NODRAW = -(2 ** 31)  # clip-only (texture-less) wall span


def pack_span(kind, y0, y1):
    y0c = jnp.clip(y0, -1, 254) + 1
    y1c = jnp.clip(y1, -1, 254) + 1
    return (kind << 29) | (y0c << 8) | y1c


def unpack_span(slot):
    kind = (slot >> 29) & 3
    y0 = ((slot >> 8) & 255) - 1
    y1 = (slot & 255) - 1
    return kind, y0, y1


def pack16(hi, lo):
    return ((hi & 0xFFFF) << 16) | (lo & 0xFFFF)


def _emit(pool, cnt, overflow, mask, record, data, K):
    """Append a record + its G-buffer words at each column's cursor."""
    fits = cnt < K
    do = mask & fits
    k_ix = jnp.arange(K, dtype=I32)
    write = do[..., None] & (k_ix == cnt[..., None])
    spans, planes = pool
    spans = jnp.where(write, record[..., None], spans)
    planes = [
        jnp.where(write, d[..., None], p) for p, d in zip(planes, data)
    ]
    cnt = cnt + do.astype(I32)
    overflow = overflow + (mask & ~fits).sum(axis=-1).astype(I32)
    return (spans, planes), cnt, overflow


def wall_scan(level: DeviceLevel, cfg: RenderConfig, frame: dict, order,
              debug_hook=None):
    """Run the scan.

    Returns (pool, cnt [B,W], overflow [B]) where pool is
    (spans [B,W,K], [d1..d5] each [B,W,K]).
    """
    B, G = order.shape
    W, H, K = cfg.width, cfg.height, cfg.span_capacity
    TH, TW = level.tex_pixels.shape[1], level.tex_pixels.shape[2]
    xx = jnp.arange(W, dtype=I32)[None, :]            # [1, W]

    def ordered(fld):
        x = frame[fld]
        if x.ndim == 2:
            out = jnp.take_along_axis(x, order, axis=1)
            return jnp.moveaxis(out, 1, 0)            # [G, B]
        out = jnp.take_along_axis(x, order[..., None], axis=1)
        return jnp.moveaxis(out, 1, 0)                # [G, B, 4]

    xs = {
        k: ordered(k)
        for k in (
            "x0", "x1", "active", "wall_emit", "two_sided", "draw_ceiling",
            "yb_s", "yb_d", "yt_s", "yt_d", "floor_flat", "ceil_flat", "draws",
            "floor_h_i", "ceil_h_i", "light",
            "lsx", "lex", "length", "start_offset", "offset_x_total",
            "tex", "off_y", "uy1",
        )
    }
    xs["g"] = jnp.moveaxis(order, 1, 0)               # [G, B]

    flat_sky = level.flat_is_sky

    def step(state, seg):
        hor, fo, co, pool, cnt, overflow = state
        g_b = jnp.broadcast_to(seg["g"][:, None], (B, W))  # d6 for all spans
        x0 = seg["x0"][:, None]                        # [B, 1] i32
        x0i = as_i16(seg["x0"])[:, None]
        x1i = as_i16(seg["x1"])[:, None]
        two_sided = seg["two_sided"][:, None]
        draw_c = seg["draw_ceiling"][:, None]
        f_sky = flat_sky[seg["floor_flat"]][:, None]
        c_sky = flat_sky[seg["ceil_flat"]][:, None]
        light = seg["light"][:, None]                  # [B, 1]

        # plane G-buffer words (shared by all plane emissions of this seg)
        pfl_d1 = (light << 22) | (seg["floor_flat"][:, None] << 8) | (
            f_sky.astype(I32) << 21
        )
        pfl_d2 = pack16(seg["floor_h_i"][:, None], 0)
        pce_d1 = (light << 22) | (seg["ceil_flat"][:, None] << 8) | (
            c_sky.astype(I32) << 21
        )
        pce_d2 = pack16(seg["ceil_h_i"][:, None], 0)
        zero = jnp.zeros((B, W), I32)

        def plane_data(d1, d2):
            d1b = jnp.broadcast_to(d1, (B, W))
            d2b = jnp.broadcast_to(d2, (B, W))
            return (d1b, d2b, zero, zero, zero, g_b)

        # perspective-correct texture u + column depth, shared per seg
        # (bitmap_render.rs:241-251)
        one = f32(1.0)
        ax = f32(xx - x0) / f32(seg["x1"][:, None] - x0)
        uz0 = seg["lsx"][:, None]
        uz1 = seg["lex"][:, None]
        inv0 = one / f32(uz0)
        inv1 = one / f32(uz1)
        denom = smul(one - ax, inv0) + smul(ax, inv1)
        u = (
            smul(one - ax, f32(0.0) / f32(uz0))
            + smul(ax, seg["length"][:, None] / f32(uz1))
        ) / denom
        tx_base = as_i16(u) + as_i16(seg["start_offset"])[:, None] + seg[
            "offset_x_total"
        ][:, None]
        zdist = as_i16(((one - ax) + ax) / denom)

        def piece(p, carry):
            hor, fo, co, pool, cnt, overflow = carry
            act = seg["active"][:, p][:, None]
            covered = (xx >= x0i) & (xx <= x1i) & act
            open_ = covered & ~hor

            by = as_i16(
                f32(seg["yb_s"][:, p])[:, None]
                + smul(f32(xx - x0), seg["yb_d"][:, p][:, None])
            )
            ty = as_i16(
                f32(seg["yt_s"][:, p])[:, None]
                + smul(f32(xx - x0), seg["yt_d"][:, p][:, None])
            )
            cb = jnp.minimum(H - 1, jnp.minimum(fo, by))
            ct = jnp.maximum(0, jnp.maximum(co, ty))
            in_ver = (cb >= ct) & open_

            draws_p = seg["draws"][:, p][:, None]

            # wall G-buffer words for this piece
            tex = seg["tex"][:, p]                     # [B]
            tex_safe = jnp.maximum(tex, 0)
            tw = level.tex_w[tex_safe][:, None]
            th = level.tex_h[tex_safe][:, None]
            tx = wrap_tex(tx_base, jnp.maximum(tw, 1), pow2=level.tex_sizes_pow2)
            d1 = tex_safe[:, None] * TW + tx          # atlas column id
            d2 = pack16(by, ty)
            d3 = pack16(seg["off_y"][:, p][:, None], th)
            d4 = pack16(light, zdist)
            d5 = jnp.broadcast_to(
                lax.bitcast_convert_type(seg["uy1"][:, p], I32)[:, None],
                (B, W),
            )
            wall_data = (d1, d2, d3, d4, d5, g_b)

            if p == 0:
                solid = ~two_sided
                rec = pack_span(KIND_WALL, ct, cb) | SPAN_E2B | SPAN_E2T
                # sign bit marks clip-only (texture-less) wall spans
                rec = jnp.where(draws_p, rec, rec | SPAN_NODRAW)
                pool, cnt, overflow = _emit(
                    pool, cnt, overflow, in_ver & solid, rec, wall_data, K
                )

                # visplanes (segs.rs:263-291), 1-pixel skip at emission
                fl_keep = f_sky | (jnp.minimum(H - 1, fo) - cb > 1)
                fl_emit = in_ver & (cb < fo) & (cb != H - 1) & fl_keep
                pool, cnt, overflow = _emit(
                    pool, cnt, overflow, fl_emit,
                    pack_span(KIND_FLOOR, cb, fo),
                    plane_data(pfl_d1, pfl_d2), K,
                )
                ce_keep = c_sky | (
                    jnp.minimum(H - 1, ct) - jnp.maximum(0, co) > 1
                )
                ce_emit = in_ver & draw_c & (ct > co) & ce_keep
                pool, cnt, overflow = _emit(
                    pool, cnt, overflow, ce_emit,
                    pack_span(KIND_CEIL, co, ct),
                    plane_data(pce_d1, pce_d2), K,
                )

                # occluded-gap fill (segs.rs:293-318)
                gap = open_ & ~in_ver & (fo > co)
                keep_g = jnp.minimum(H - 1, fo) - jnp.maximum(0, co) > 1
                gap_b = gap & (by <= co)
                pool, cnt, overflow = _emit(
                    pool, cnt, overflow, gap_b & (f_sky | keep_g),
                    pack_span(KIND_FLOOR, co, fo),
                    plane_data(pfl_d1, pfl_d2), K,
                )
                gap_t = gap & draw_c & (ty >= fo)
                pool, cnt, overflow = _emit(
                    pool, cnt, overflow, gap_t & (c_sky | keep_g),
                    pack_span(KIND_CEIL, co, fo),
                    plane_data(pce_d1, pce_d2), K,
                )
                gap_occl = gap_b | gap_t

                occl_m = in_ver & two_sided
                fo = jnp.where(occl_m, cb, fo)
                co = jnp.where(occl_m & draw_c, ct, co)

                solid_occl = (covered & solid) | gap_occl
                hor = hor | solid_occl
                fo = jnp.where(solid_occl, H // 2, fo)
                co = jnp.where(solid_occl, H // 2, co)

            elif p == 1:
                rec = pack_span(KIND_MID, ct, cb) | jnp.where(
                    draw_c, SPAN_DC, 0
                )
                pool, cnt, overflow = _emit(
                    pool, cnt, overflow, in_ver, rec, wall_data, K
                )

            elif p == 2:
                rec = pack_span(KIND_WALL, ct, cb) | SPAN_E2B
                rec = jnp.where(draws_p, rec, rec | SPAN_NODRAW)
                pool, cnt, overflow = _emit(
                    pool, cnt, overflow, in_ver, rec, wall_data, K
                )
                fo = jnp.where(in_ver, ct, fo)         # segs.rs:329-331

            else:  # p == 3
                rec = pack_span(KIND_WALL, ct, cb) | SPAN_E2T
                rec = jnp.where(draws_p, rec, rec | SPAN_NODRAW)
                pool, cnt, overflow = _emit(
                    pool, cnt, overflow, in_ver, rec, wall_data, K
                )
                co = jnp.where(in_ver, cb, co)         # segs.rs:333-335

            return hor, fo, co, pool, cnt, overflow

        carry = (hor, fo, co, pool, cnt, overflow)
        for p in range(4):
            carry = piece(p, carry)
        return carry, None

    init_pool = (
        jnp.zeros((B, W, K), I32),
        [jnp.zeros((B, W, K), I32) for _ in range(N_PLANES)],
    )
    init = (
        jnp.zeros((B, W), bool),
        jnp.full((B, W), H, I32),
        jnp.full((B, W), -1, I32),
        init_pool,
        jnp.zeros((B, W), I32),
        jnp.zeros((B,), I32),
    )

    if debug_hook is not None:
        state = init
        for i in range(G):
            seg_i = {k: v[i] for k, v in xs.items()}
            state, _ = step(state, seg_i)
            debug_hook(i, seg_i, state)
        hor, fo, co, pool, cnt, overflow = state
        return pool, cnt, overflow

    state, _ = lax.scan(step, init, xs)
    hor, fo, co, pool, cnt, overflow = state
    return pool, cnt, overflow
