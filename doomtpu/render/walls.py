"""The occlusion wall scan: a lax.scan over segs in traversal order.

This is the TPU formulation of the reference's sequentially-carried
per-column occlusion state (segs.rs:37-39, 121-350): cameras and screen
columns are vectorized; only the seg axis is sequential.  Instead of
drawing immediately, each step emits fixed-size SPAN records into a
per-column pool; the resolve stage then turns spans into pixels.

Span record, packed in one int32:

    bits 29-30  kind: 0 wall (solid/lower/upper), 1 floor plane,
                2 ceiling plane, 3 deferred two-sided mid
    bits 16-28  item id = seg*4 + piece (segs capped at 2048/map)
    bits  8-15  y0 + 1  (clipped top / plane top, in [-1, 201])
    bits  0-7   y1 + 1  (clipped bottom / plane bottom)

Pool slot order encodes draw order within a stage (walls draw during the
scan, planes after — so planes beat walls per pixel, and within a stage a
later slot beats an earlier one).  Wall texture coordinates are not
stored: they are recomputed at resolve time from the seg frame, exactly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from doomtpu.config import RenderConfig
from doomtpu.render.device import DeviceLevel
from doomtpu.render.jmath import F32, I32, as_i16, f32, smul

KIND_WALL = 0
KIND_FLOOR = 1
KIND_CEIL = 2
KIND_MID = 3


def pack_span(kind, item, y0, y1):
    y0c = jnp.clip(y0, -1, 254) + 1
    y1c = jnp.clip(y1, -1, 254) + 1
    return (kind << 29) | (item << 16) | (y0c << 8) | y1c


def unpack_span(slot):
    kind = (slot >> 29) & 3
    item = (slot >> 16) & 0x1FFF
    y0 = ((slot >> 8) & 255) - 1
    y1 = (slot & 255) - 1
    return kind, item, y0, y1


def _emit(pool, cnt, overflow, mask, record, K):
    """Append `record` at each column's cursor where mask holds."""
    fits = cnt < K
    do = mask & fits
    k_ix = jnp.arange(K, dtype=I32)
    write = do[..., None] & (k_ix == cnt[..., None])
    pool = jnp.where(write, record[..., None], pool)
    cnt = cnt + do.astype(I32)
    overflow = overflow + (mask & ~fits).sum(axis=-1).astype(I32)
    return pool, cnt, overflow


def wall_scan(level: DeviceLevel, cfg: RenderConfig, frame: dict, order,
              debug_hook=None):
    """Run the scan.  Returns (pool [B,W,K], cnt [B,W], overflow [B]).

    `frame` is the seg-frame dict from build_seg_frame (original seg
    order); `order` is [B, G] traversal-order seg indices.
    """
    B, G = order.shape
    W, H, K = cfg.width, cfg.height, cfg.span_capacity
    xx = jnp.arange(W, dtype=I32)[None, :]            # [1, W]

    # gather per-camera ordered views of every field, then put the seg
    # axis first for lax.scan
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
            "yb_s", "yb_d", "yt_s", "yt_d", "floor_flat", "ceil_flat",
        )
    }
    xs["g"] = jnp.moveaxis(order, 1, 0)               # [G, B]

    flat_sky = level.flat_is_sky

    def step(state, seg):
        hor, fo, co, pool, cnt, overflow = state
        item_base = seg["g"] * 4                       # [B]
        x0 = seg["x0"][:, None]                        # [B, 1] i32
        x1 = seg["x1"][:, None]
        x0i = as_i16(seg["x0"])[:, None]
        x1i = as_i16(seg["x1"])[:, None]
        two_sided = seg["two_sided"][:, None]
        draw_c = seg["draw_ceiling"][:, None]
        f_sky = flat_sky[seg["floor_flat"]][:, None]
        c_sky = flat_sky[seg["ceil_flat"]][:, None]

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

            item = item_base[:, None] + p

            if p == 0:
                solid = ~two_sided
                # solid wall span (drawable, used for sprite clipping too)
                rec = pack_span(KIND_WALL, item, ct, cb)
                pool, cnt, overflow = _emit(
                    pool, cnt, overflow, in_ver & solid, rec, K
                )

                # visplanes (segs.rs:263-291), with the 1-pixel-column
                # skip applied at emission (visplanes.rs:98-101)
                fl_keep = f_sky | (jnp.minimum(H - 1, fo) - cb > 1)
                fl_emit = in_ver & (cb < fo) & (cb != H - 1) & fl_keep
                pool, cnt, overflow = _emit(
                    pool, cnt, overflow, fl_emit,
                    pack_span(KIND_FLOOR, item, cb, fo), K,
                )
                ce_keep = c_sky | (
                    jnp.minimum(H - 1, ct) - jnp.maximum(0, co) > 1
                )
                ce_emit = in_ver & draw_c & (ct > co) & ce_keep
                pool, cnt, overflow = _emit(
                    pool, cnt, overflow, ce_emit,
                    pack_span(KIND_CEIL, item, co, ct), K,
                )

                # occluded-gap fill (segs.rs:293-318)
                gap = open_ & ~in_ver & (fo > co)
                gap_b = gap & (by <= co)
                gap_keep_f = f_sky | (
                    jnp.minimum(H - 1, fo) - jnp.maximum(0, co) > 1
                )
                gap_keep_c = c_sky | (
                    jnp.minimum(H - 1, fo) - jnp.maximum(0, co) > 1
                )
                pool, cnt, overflow = _emit(
                    pool, cnt, overflow, gap_b & gap_keep_f,
                    pack_span(KIND_FLOOR, item, co, fo), K,
                )
                gap_t = gap & draw_c & (ty >= fo)
                pool, cnt, overflow = _emit(
                    pool, cnt, overflow, gap_t & gap_keep_c,
                    pack_span(KIND_CEIL, item, co, fo), K,
                )
                gap_occl = gap_b | gap_t

                # occlusion updates: portal full-height pass
                # (segs.rs:320-326) and solid occlude (segs.rs:341-344)
                occl_m = in_ver & two_sided
                fo = jnp.where(occl_m, cb, fo)
                co = jnp.where(occl_m & draw_c, ct, co)

                solid_occl = (covered & solid) | gap_occl
                hor = hor | solid_occl
                fo = jnp.where(solid_occl, H // 2, fo)
                co = jnp.where(solid_occl, H // 2, co)

            elif p == 1:
                # deferred two-sided middle: record only (segs.rs:527-548)
                rec = pack_span(KIND_MID, item, ct, cb)
                pool, cnt, overflow = _emit(
                    pool, cnt, overflow, in_ver, rec, K
                )

            elif p == 2:
                rec = pack_span(KIND_WALL, item, ct, cb)
                pool, cnt, overflow = _emit(
                    pool, cnt, overflow, in_ver, rec, K
                )
                fo = jnp.where(in_ver, ct, fo)         # segs.rs:329-331

            else:  # p == 3
                rec = pack_span(KIND_WALL, item, ct, cb)
                pool, cnt, overflow = _emit(
                    pool, cnt, overflow, in_ver, rec, K
                )
                co = jnp.where(in_ver, cb, co)         # segs.rs:333-335

            return hor, fo, co, pool, cnt, overflow

        carry = (hor, fo, co, pool, cnt, overflow)
        for p in range(4):
            carry = piece(p, carry)
        return carry, None

    init = (
        jnp.zeros((B, W), bool),
        jnp.full((B, W), H, I32),
        jnp.full((B, W), -1, I32),
        jnp.zeros((B, W, K), I32),
        jnp.zeros((B, W), I32),
        jnp.zeros((B,), I32),
    )
    if debug_hook is not None:
        # eager python loop over segs for introspection (tests/debug only)
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
