"""Deferred pass: map-object sprites + masked two-sided mid walls.

Models renderer/map_objects.rs:19-241 without data-dependent control
flow, restructured for scale (the round-1 design ran one full-frame pass
per item — 5.4 s at 215 mobjs):

1. per-item scalars (billboard projection, painter keys) stay
   vectorized over ALL items [B, I], I = mobjs + drawable mids
2. the nearest max_visible_mobjs items in painter order are SELECTED;
   farther items are dropped (counted in items_dropped)
3. per-column draw data is computed only for selected items [B, N, W]:
   sprites get perspective u + seg clip bounds, mids recover their
   recorded columns from the span pool
4. items are EMITTED nearest-first into a per-column ITEM POOL
   [B, W, KI] (same shape discipline as the wall-span pool; overflow
   drops the farthest items per column, counted in item_overflow)
5. one composite fold per pool slot, farthest -> nearest, overwriting
   where the item's texel is opaque — bit-identical to the reference's
   back-to-front painter (renderer/map_objects.rs:216-240)

Sprite clipping reproduces :127-166 exactly: solid pieces clip via
their extends flags and clipped y values, portals clip to the opening
with full edge values, honoring the sky-hack draw_ceiling flag (all
read straight from the clip pool's flag bits + G-buffer).  On the
item-kernel path the clip runs inside ops/pallas_items.py per pool
slot; the XLA fallback computes the "is this seg in front of the
sprite" test (bitmap_render.rs:137-165) per (seg, selected item) and
reduces it over clip-pool slots.
"""

from __future__ import annotations

import math
import os as _os

import jax
import jax.numpy as jnp
from jax import lax

import numpy as np

from doomtpu.config import PLAYER_EYE_HEIGHT, RenderConfig
from doomtpu.render import camera as cam
from doomtpu.render.device import DeviceLevel
from doomtpu.render.jmath import (
    F32, I32, as_i16, f32, is_left_of, rotate, smul, stable_positions,
    wrap_tex,
)
from doomtpu.render.resolve import unpack16_hi, unpack16_lo
from doomtpu.render.walls import (
    KIND_MID, KIND_WALL, SPAN_DC, SPAN_E2B, SPAN_E2T, pack16,
)

_PI = np.float32(math.pi)

# measurement-only early-return cuts inside deferred_pass (outputs are
# WRONG with any value set — TPU stage attribution, see
# scripts/probe_item_decomp.py): 4 = presence + slot cumsum only,
# 1 = + one-hot emission fold, 2 = + per-slot sprite math (clip
# excluded on the clip_in_kernel path), 3 = + mid-pool slot fill.
# Sub-decomposition of cut 4 (the 16.75 ms sweep-#11 wall):
# 9 = sprite presence only, 7 = + mid presence (full pres, no cumsum),
# 8 = + reverse cumsum (no oh/icnt).
# The remainder vs the full pass is the composite kernel.
# Probe scripts monkeypatch this module attribute between traces; there
# is deliberately NO env-var path (an env var read at import time would
# silently corrupt every render in the process).
_DEFER_ONLY = 0

# Perf A/Bs for the deferred side's two measured walls (sweep #11:
# presence+cumsum 16.75 ms, mid slot fill +17.1 ms).  Bit-exact either
# way; defaults flip only on end-to-end bench numbers (PERF.md rule).
#   DEFER_MIDPRES=1: mid presence per selected item (KMID x [B, N, W]
#     compare-or) instead of the dseg-expanded KMID x [B, D, W] loop +
#     [B, N, W]-point take_along_axis.
#   DEFER_MIDFILL=1: mid-pool slot fill restructured KMID-outer and
#     vectorized over KI (KMID x ~9 ops on [B, W, KI], one fused
#     chain) instead of the KI x KMID nested loop (KI*KMID [B, W]
#     select rounds + 6*KI [B, W, KI] scatter-selects).
# Both DEFAULT ON since sweep #13 (2026-08-21): together they measure
# 2468.1 f/s end-to-end vs 2207.4 (rollout 2503.7 vs 2230.6) at
# calibrated pools, counters 0 — full deferred ladder 33.96 ms vs
# 38.77.  =0 restores the round-4 formulations.
DEFER_MIDPRES = _os.environ.get("DOOMTPU_DEFER_MIDPRES", "1") != "0"
DEFER_MIDFILL = _os.environ.get("DOOMTPU_DEFER_MIDFILL", "1") != "0"
MID_MARK = 1 << 30  # item-pool word flag: slot is a masked mid (fill pending)
SPR_MARK = 1 << 29  # item-pool word flag: slot is a sprite (seg-clippable)


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


def pools_from_unified(pool, cnt):
    """View the unified span pool as the (clip, mid) pool pair the
    deferred pass consumes.  Non-wall slots are inert in the clip view
    (their kind/flag bits never match), and mid draw data is read from
    the same slots the KIND_MID records live in — semantically identical
    to the paint kernel's dedicated pools (ops/pallas_paint.py)."""
    spans, (d1, d2, d3, d4, d5, d6) = pool
    clip = {"span": spans, "d2": d2, "d6": d6, "cnt": cnt}
    mid = {
        "span": spans, "d1": d1, "d2": d2, "d3": d3, "d4": d4,
        "d5": d5, "d6": d6, "cnt": cnt,
    }
    return clip, mid


def pools_from_paint(out_or_aux):
    """(clip, mid) pools from the paint kernel's output dict / aux."""
    c_span, c_d2, c_d6, c_lsx, c_lsy, c_lex, c_ley = out_or_aux["clippool"]
    m = out_or_aux["midpool"]
    clip = {
        "span": c_span, "d2": c_d2, "d6": c_d6,
        "lsx": c_lsx, "lsy": c_lsy, "lex": c_lex, "ley": c_ley,
        "cnt": out_or_aux["cnt_clip"],
    }
    mid = {
        "span": m[0], "d1": m[1], "d2": m[2], "d3": m[3], "d4": m[4],
        "d5": m[5], "d6": m[6], "cnt": out_or_aux["cnt_mid"],
    }
    return clip, mid


def _sprite_scalars(
    level: DeviceLevel,
    cfg: RenderConfig,
    px, py, angle, floor_height,        # [B]
    sector_light,                        # [B, SEC]
    mobj_state,                          # [B, MO]
):
    """Per-mobj billboard scalars [B, MO] (renderer/map_objects.rs:37-121)
    — the sprite half of _select_items, shared with the capacity census
    (calibrate.py).  Returns None when the level has no mobjs."""
    MO = level.num_mobjs
    if MO == 0:
        return None
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

    # back-to-front painter position j_of_m WITHOUT a scatter: the
    # old path argsorted (as_i16(lsx), m) ascending, reversed it,
    # and scattered positions back; j_of_m[m] is simply MO-1 minus
    # m's ascending stable position — bit-identical
    j_of_m = (MO - 1) - stable_positions(as_i16(lsx))        # [B, MO]
    return dict(
        valid=valid, pic_s=pic_s, w_pic=w_pic, light_m=light_m,
        lsx=lsx, lsy=lsy, lex=lex, ley=ley, start_off=start_off,
        vpx=vpx, vpy=vpy, bsx=bsx, bex=bex,
        yb_s=yb_s, yb_d=yb_d, yt_s=yt_s, yt_d=yt_d,
        bottom_h=bottom_h, top_h=top_h, j_of_m=j_of_m,
    )


def _select_items(
    level: DeviceLevel,
    cfg: RenderConfig,
    frame: dict,
    order,
    px, py, angle, floor_height,        # [B]
    sector_light,                        # [B, SEC]
    mobj_state,                          # [B, MO]
):
    """Per-item scalars + nearest-N painter-order selection.

    Everything here is [B, MO] / [B, I] / [B, N] — no W-scaled arrays.
    Shared by the XLA deferred pass (which expands per-column data from
    it) and the standalone item-pass kernel (ops/pallas_itempass.py,
    which ships it to VMEM/SMEM packs).  Returns None when the level
    has no items at all.
    """
    B = px.shape[0]
    G = level.num_segs
    MO = level.num_mobjs
    dsegs_j = level.dseg_ix
    D = dsegs_j.shape[0]
    I = MO + D
    if I == 0:
        return None
    N = I if cfg.max_visible_mobjs <= 0 else min(cfg.max_visible_mobjs, I)

    # ---------------- sprite scalars [B, MO] -------------------------------
    if MO > 0:
        sps = _sprite_scalars(
            level, cfg, px, py, angle, floor_height, sector_light,
            mobj_state,
        )
        valid = sps["valid"]
        pic_s, w_pic, light_m = sps["pic_s"], sps["w_pic"], sps["light_m"]
        lsx, lsy, lex, ley = sps["lsx"], sps["lsy"], sps["lex"], sps["ley"]
        start_off, vpx, vpy = sps["start_off"], sps["vpx"], sps["vpy"]
        bsx, bex = sps["bsx"], sps["bex"]
        yb_s, yb_d = sps["yb_s"], sps["yb_d"]
        yt_s, yt_d = sps["yt_s"], sps["yt_d"]
        bottom_h, top_h = sps["bottom_h"], sps["top_h"]
        j_of_m = sps["j_of_m"]
    else:
        valid = jnp.zeros((B, 0), bool)

    # ---------------- masked mid seg painter keys ---------------------------
    if D > 0:
        if MO > 0:
            midx = f32(f32(lsx + lex) / f32(2.0))
            midy = f32(f32(lsy + ley) / f32(2.0))
            behind_mid = is_behind_vertex(
                frame["lsx"][:, dsegs_j, None], frame["lsy"][:, dsegs_j, None],
                frame["lex"][:, dsegs_j, None], frame["ley"][:, dsegs_j, None],
                midx[:, None, :], midy[:, None, :],
            )                                                   # [B, D, MO]
            # first draw-order position among behind+valid mobjs = the
            # MINIMUM painter position (no sorted-order take + argmax)
            bv = behind_mid & valid[:, None, :]
            j_first = jnp.min(
                jnp.where(bv, j_of_m[:, None, :], MO), axis=-1
            )                                                    # [B, D]
        else:
            j_first = jnp.full((B, D), 0, I32)

        # traversal position of each drawable-mid seg.  DOOMTPU_SELPOS=1
        # inverts the `order` permutation with ONE [B, G] unique-index
        # scatter — asymptotically better (O(B*G) vs the [B, G, D]
        # one-hot operand) but measured 3.4x SLOWER on the v5e at e1m1
        # scale (sweep #15: cut 10 = 25.98 ms vs 7.64 — XLA TPU scatter
        # again, same lesson as the counting-sort and KIB losses), so
        # the one-hot compare-reduce stays the default; the scatter
        # form remains the right pick only for very large maps where
        # the argsort fallback below would kick in anyway.
        if _os.environ.get("DOOMTPU_SELPOS", "0") != "0":
            positions = (
                jnp.zeros((B, G), I32)
                .at[jnp.arange(B, dtype=I32)[:, None], order]
                .set(
                    jnp.broadcast_to(
                        jnp.arange(G, dtype=I32)[None], (B, G)
                    ),
                    unique_indices=True,
                    mode="promise_in_bounds",
                )
            )
            pos_d = positions[:, dsegs_j]                        # [B, D]
        elif G * D <= 1 << 20:
            g_iota = jnp.arange(G, dtype=I32)
            pos_d = (
                (order[:, :, None] == dsegs_j[None, None, :])
                * g_iota[None, :, None]
            ).sum(1).astype(I32)                                 # [B, D]
        else:
            positions = jnp.argsort(
                order, axis=1, stable=True
            ).astype(I32)                                        # [B, G]
            pos_d = positions[:, dsegs_j]
        tie_d = (G - 1) - pos_d                                  # [B, D]
        dseg_valid = frame["valid"][:, dsegs_j] & frame["active"][:, dsegs_j, 1]
    else:
        j_first = jnp.zeros((B, 0), I32)
        tie_d = jnp.zeros((B, 0), I32)
        dseg_valid = jnp.zeros((B, 0), bool)

    # ---------------- painter keys + nearest-N selection --------------------
    TIE = G + 1
    if MO > 0:
        key_sprite = (2 * j_of_m + 1) * TIE
    else:
        key_sprite = jnp.zeros((B, 0), I32)
    key_seg = (2 * j_first) * TIE + tie_d
    item_key = jnp.concatenate([key_sprite, key_seg], axis=1)    # [B, I]
    item_valid = jnp.concatenate([valid, dseg_valid], axis=1)
    # invalid items get key -1 so the LAST N of the ascending order are
    # exactly the nearest N valid items (valid keys are >= 0)
    item_key = jnp.where(item_valid, item_key, -1)

    # nearest-N selection WITHOUT a take_along_axis per field: stable
    # ascending positions (compare-reduce / double-argsort by size, see
    # stable_positions), then ONE exact one-hot MXU contraction gathers
    # every per-item field at the selected slots.  Fields ride as u16
    # halves (exactly representable in f32; a one-hot row holds a
    # single 1.0), so the result is bit-identical to the gather path —
    # the same discipline as the paint-kernel input compaction
    # (ops/pallas_paint.py).
    ii_ = jnp.arange(I, dtype=I32)
    pos_i = stable_positions(item_key)                           # [B, I]
    slot_i = pos_i - (I - N)                                     # >= 0: kept
    onehot = (
        slot_i[:, :, None] == jnp.arange(N, dtype=I32)[None, None, :]
    ).astype(F32)                                                # [B, I, N]

    n_valid = item_valid.sum(axis=1).astype(I32)
    items_dropped = jnp.maximum(0, n_valid - N)

    def padI(x):
        return jnp.pad(x, ((0, 0), (0, I - x.shape[1])))

    def bits(x):
        return lax.bitcast_convert_type(f32(x), I32) if x.dtype != I32 \
            else x

    cols = [
        jnp.broadcast_to(ii_[None], (B, I)),                     # sel index
        item_valid.astype(I32),
    ]
    spr_names = []
    if MO > 0:
        s_len = jnp.sqrt(
            smul(lsx - lex, lsx - lex) + smul(lsy - ley, lsy - ley)
        )
        spr_fields = [
            ("lsx", lsx, True), ("lsy", lsy, True),
            ("lex", lex, True), ("ley", ley, True),
            ("soff", start_off, True), ("pic", pic_s, False),
            ("wpic", w_pic, False), ("light", light_m, False),
            ("bsx", bsx, False), ("bex", bex, False),
            ("ybs", f32(yb_s), True), ("ybd", yb_d, True),
            ("yts", f32(yt_s), True), ("ytd", yt_d, True),
            ("uy1", top_h - bottom_h, True), ("slen", s_len, True),
            ("vpx", vpx, True), ("vpy", vpy, True),
        ]
        for name, v, _isf in spr_fields:
            spr_names.append((name, _isf))
            cols.append(padI(bits(v)))
    if D > 0:
        cols.append(
            jnp.concatenate(
                [
                    jnp.zeros((B, MO), I32),
                    jnp.broadcast_to(dsegs_j[None], (B, D)),
                ],
                axis=1,
            )
        )
    src = jnp.stack(cols, axis=-1)                               # [B, I, C]
    C = src.shape[-1]
    halves = jnp.concatenate(
        [f32(src & 0xFFFF), f32((src >> 16) & 0xFFFF)], axis=-1
    )                                                            # [B, I, 2C]
    folded = lax.dot_general(
        onehot, halves,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=F32,
    )                                                            # [B, N, 2C]
    outc = folded[..., :C].astype(I32) | (
        folded[..., C:].astype(I32) << 16
    )                                                            # [B, N, C]

    sel = outc[..., 0]                                           # [B, N]
    sel_valid = outc[..., 1] != 0
    is_spr_sel = sel < MO if MO > 0 else jnp.zeros((B, N), bool)

    out = {
        "B": B, "MO": MO, "D": D, "I": I, "N": N,
        "sel": sel, "sel_valid": sel_valid, "is_spr_sel": is_spr_sel,
        "items_dropped": items_dropped,
    }
    if MO > 0:
        spr = {}
        for ci, (name, isf) in enumerate(spr_names):
            v = outc[..., 2 + ci]
            spr[name] = lax.bitcast_convert_type(v, F32) if isf else v
        out["spr"] = spr
        # seg-item slots carry zeros in the sprite fields (the old
        # gather fetched an arbitrary sprite's values there); every
        # consumer masks them behind is_spr_sel
    if D > 0:
        out["segsel"] = outc[..., C - 1]                         # [B, N]
    return out


# item_pack row layout: per selected item n, per camera, consumed as
# SMEM rank-0 scalars by the paint kernel's in-kernel item pass
# (ops/pallas_paint.py), which recomputes the per-column sprite math
# (things.py [B, N, W] stages) on the VPU.  Two packs: i32 rows and f32
# rows (kept separate so the kernel never bitcasts an SMEM scalar).
IPI_FL = 0       # bit0 valid, bit1 is_sprite
IPI_X0 = 1       # first screen column (as_i16(bsx) / seg x0)
IPI_X1E = 2      # exclusive end column (as_i16(bex) / seg x1 + 1)
IPI_LW = 3       # sprite: light | wpic << 16
IPI_PIC = 4      # unified picture id: mid tex | T + sprite pic (q tables)
IPI_TH = 5       # sprite picture height (spr_h)
IPI_SOFF = 6     # sprite as_i16(start_offset) / mid seg id
IPI_BSX = 7      # i32 screen-x of billboard start (project_x output)
IPI_ROWS = 8
IPF_DX = 0       # f32(bex - bsx)
IPF_INV0 = 1     # f32 1/lsx
IPF_INV1 = 2     # f32 1/lex
IPF_Z0 = 3       # f32 0/lsx
IPF_Z1 = 4       # f32 s_len/lex
IPF_YBS = 5      # f32(yb_s)
IPF_YBD = 6      # f32 yb slope
IPF_YTS = 7      # f32(yt_s)
IPF_YTD = 8      # f32 yt slope
IPF_UY1 = 9      # f32 top_h - bottom_h
IPF_VPX = 10     # f32 view-space mobj x (seg clip)
IPF_VPY = 11     # f32 view-space mobj y
IPF_ROWS = 12


def item_pack(
    level: DeviceLevel,
    cfg: RenderConfig,
    frame: dict,
    order,
    px, py, angle, floor_height,        # [B]
    sector_light,                        # [B, SEC]
    mobj_state,                          # [B, MO]
):
    """Per-item scalar packs for the in-kernel item paint, plus aux.

    Returns ({"i": [B, N, IPI_ROWS] i32, "f": [B, N, IPF_ROWS] f32},
    aux) — or (None, zero_aux) when the level has no items.

    Items are ordered farthest-first (ascending painter key), so the
    kernel paints them in index order with nearer items overwriting —
    the reference's back-to-front painter (map_objects.rs:216-240)
    without the item pool's per-column capacity cap.
    """
    B = px.shape[0]
    zero_aux = {
        "items_dropped": jnp.zeros((B,), I32),
        "item_overflow": jnp.zeros((B,), I32),
    }
    s = _select_items(
        level, cfg, frame, order, px, py, angle, floor_height,
        sector_light, mobj_state,
    )
    if s is None:
        return None, zero_aux
    MO, N = s["MO"], s["N"]
    sel_valid, is_spr = s["sel_valid"], s["is_spr_sel"]
    zero = jnp.zeros((B, N), I32)
    zf = jnp.zeros((B, N), F32)
    T = level.tex_pixels.shape[0]

    # sprite-side rows (zeros when the level has no mobjs)
    spr_i = {r: zero for r in range(IPI_ROWS)}
    spr_f = {r: zf for r in range(IPF_ROWS)}
    if MO > 0:
        sp = s["spr"]
        one = f32(1.0)
        spr_i.update({
            IPI_X0: as_i16(sp["bsx"]),
            IPI_X1E: as_i16(sp["bex"]),        # bex is exclusive already
            IPI_LW: sp["light"] | (sp["wpic"] << 16),
            IPI_PIC: T + sp["pic"],            # unified q-table id
            IPI_TH: level.spr_h[sp["pic"]],
            IPI_SOFF: as_i16(sp["soff"]),
            IPI_BSX: sp["bsx"],
        })
        spr_f.update({
            IPF_DX: f32(sp["bex"] - sp["bsx"]),
            IPF_INV0: one / f32(sp["lsx"]),
            IPF_INV1: one / f32(sp["lex"]),
            IPF_Z0: f32(0.0) / f32(sp["lsx"]),
            IPF_Z1: sp["slen"] / f32(sp["lex"]),
            IPF_YBS: sp["ybs"], IPF_YBD: sp["ybd"],
            IPF_YTS: sp["yts"], IPF_YTD: sp["ytd"],
            IPF_UY1: sp["uy1"],
            IPF_VPX: sp["vpx"], IPF_VPY: sp["vpy"],
        })

    # mid-side rows (zeros when the level has no drawable mids)
    mid_i = {r: zero for r in range(IPI_ROWS)}
    if "segsel" in s:
        segsel = s["segsel"]
        mid_i.update({
            IPI_X0: as_i16(jnp.take_along_axis(frame["x0"], segsel, axis=1)),
            IPI_X1E: as_i16(jnp.take_along_axis(frame["x1"], segsel, axis=1))
            + 1,
            IPI_PIC: jnp.maximum(level.seg_mid_tex[segsel], 0),
            IPI_SOFF: segsel,
        })

    fl = sel_valid.astype(I32) | (is_spr.astype(I32) << 1)
    rows_i = [
        jnp.where(is_spr, spr_i[r], mid_i[r]) if r != IPI_FL else fl
        for r in range(IPI_ROWS)
    ]
    # f32 rows are sprite-only (mids read their pool slot instead)
    pack = {
        "i": jnp.stack(rows_i, axis=-1),          # [B, N, IPI_ROWS]
        "f": jnp.stack(
            [spr_f[r] for r in range(IPF_ROWS)], axis=-1
        ),                                        # [B, N, IPF_ROWS]
    }
    aux = dict(zero_aux, items_dropped=s["items_dropped"])
    return pack, aux


def item_census(
    level: DeviceLevel,
    cfg: RenderConfig,
    frame: dict,
    pools,
    px, py, angle, floor_height,        # [B]
    sector_light,                        # [B, SEC]
    mobj_state,                          # [B, MO]
    tile: int = 1,
):
    """UNCAPPED per-column item-presence counts + valid-item totals.

    The census behind auto-capacity calibration (doomtpu/calibrate.py):
    returns {"n_valid": [B] i32, "presence": [B, W] i32,
    "presence_block": [] i32} where `presence[b, w]` is exactly the
    item-pool occupancy deferred_pass would see with max_visible_mobjs
    and item_capacity both uncapped (its rc[:, 0, :]), computed WITHOUT
    any [B, I, W] array:

    - sprite coverage intervals [bsx, bex) are accumulated as a
      difference array + cumsum (integer-exact)
    - mid coverage counts the mid-pool slots whose seg is a valid
      drawable mid (conservatively >= the distinct-item count if a seg
      ever emitted two mid slots in one column)

    `presence_block` is the peak count of DISTINCT live items per
    (camera `tile`, 128-column block) — the block-local emission's
    item_block_capacity requirement (a superset of the selected-item
    liveness deferred_pass compacts on, so calibrating to it is always
    conservative).
    """
    B, W = px.shape[0], cfg.width
    MO = level.num_mobjs
    dsegs_j = level.dseg_ix
    D = dsegs_j.shape[0]
    zero_w = jnp.zeros((B, W), I32)
    n_valid = jnp.zeros((B,), I32)
    LAN = 128
    NBW = (W + LAN - 1) // LAN
    wlo = jnp.arange(NBW, dtype=I32)[None, None] * LAN      # [1,1,NBW]
    T = tile if (tile > 1 and B % tile == 0) else 1

    def tile_any(x):                    # [B, I, NBW] -> [B/T, I, NBW]
        return x.reshape(B // T, T, x.shape[1], NBW).any(1)

    blk_cnt = jnp.zeros((B // T, NBW), I32)

    spr_cnt = zero_w
    if MO > 0:
        sps = _sprite_scalars(
            level, cfg, px, py, angle, floor_height, sector_light,
            mobj_state,
        )
        valid = sps["valid"]
        x0i = as_i16(sps["bsx"])
        x1i = as_i16(sps["bex"])                       # exclusive
        lo = jnp.clip(x0i, 0, W)
        hi = jnp.clip(x1i, 0, W)
        use = valid & (hi > lo)
        rows = jnp.arange(B, dtype=I32)[:, None]
        diff = jnp.zeros((B, W + 1), I32)
        # masked adds land on the dumped W column (outside the cumsum)
        diff = diff.at[rows, jnp.where(use, lo, W)].add(1)
        diff = diff.at[rows, jnp.where(use, hi, W)].add(-1)
        spr_cnt = jnp.cumsum(diff[:, :W], axis=1)
        n_valid = n_valid + valid.sum(axis=1).astype(I32)
        live_spr = (
            (x0i[..., None] < wlo + LAN) & (x1i[..., None] > wlo)
            & valid[..., None]
        )                                                      # [B,MO,NBW]
        blk_cnt = blk_cnt + tile_any(live_spr).sum(1).astype(I32)

    mid_cnt = zero_w
    if D > 0:
        _, midp = pools
        m_span, m_d6 = midp["span"], midp["d6"]
        KMID = m_span.shape[2]
        m_ok = (
            jnp.arange(KMID, dtype=I32)[None, None] < midp["cnt"][..., None]
        )
        mid_slot = (((m_span >> 29) & 3) == KIND_MID) & m_ok   # [B,W,KMID]
        dseg_valid = (
            frame["valid"][:, dsegs_j] & frame["active"][:, dsegs_j, 1]
        )                                                      # [B, D]
        valid_of_seg = jnp.zeros((B, level.num_segs), bool)
        valid_of_seg = valid_of_seg.at[:, dsegs_j].set(dseg_valid)
        seg_ok = jnp.take_along_axis(
            valid_of_seg, m_d6.reshape(B, W * KMID), axis=1
        ).reshape(B, W, KMID)
        mid_cnt = (mid_slot & seg_ok).sum(axis=2).astype(I32)
        n_valid = n_valid + dseg_valid.sum(axis=1).astype(I32)
        # distinct live mids per block: pool entries scattered into
        # (block, seg) flags, gathered back per drawable mid
        G = level.num_segs
        wblk = jnp.broadcast_to(
            (jnp.arange(W, dtype=I32) // LAN)[None, :, None], m_d6.shape
        )
        tgt = jnp.where(mid_slot & seg_ok, m_d6, G)
        segblk = jnp.zeros((B, NBW, G + 1), bool).at[
            jnp.arange(B, dtype=I32)[:, None, None], wblk, tgt
        ].set(True)                                            # [B,NBW,G+1]
        live_mid = jnp.swapaxes(
            segblk[:, :, dsegs_j], 1, 2
        ) & dseg_valid[..., None]                              # [B,D,NBW]
        blk_cnt = blk_cnt + tile_any(live_mid).sum(1).astype(I32)

    return {
        "n_valid": n_valid,
        "presence": spr_cnt + mid_cnt,
        "presence_block": blk_cnt.max(),
    }


def deferred_pass(
    level: DeviceLevel,
    cfg: RenderConfig,
    frame: dict,
    pools, order,
    px, py, angle, floor_height,        # [B]
    sector_light,                        # [B, SEC]
    mobj_state,                          # [B, MO]
    idx, light, dist, is_sky,            # wall/plane resolve outputs
    rgb=None,                            # paint path: pre-shaded packed rgb
    item_kernel=False,                   # composite via ops/pallas_items.py
    interpret=False,                     # item kernel in interpret mode
):
    """Composite sprites + masked mids over the resolved frame.

    `pools` is the (clip, mid) pair from pools_from_unified /
    pools_from_paint.  Returns (idx, light, dist, is_sky, daux) with
    daux counting dropped items (beyond max_visible_mobjs) and item-pool
    column overflow.
    """
    clip, midp = pools
    spans, d2, d6, cnt = clip["span"], clip["d2"], clip["d6"], clip["cnt"]
    B, W, K = spans.shape
    H = cfg.height
    G = level.num_segs
    MO = level.num_mobjs
    dsegs_j = level.dseg_ix
    D = dsegs_j.shape[0]

    sel_s = _select_items(
        level, cfg, frame, order, px, py, angle, floor_height,
        sector_light, mobj_state,
    )
    zero_aux = {
        "items_dropped": jnp.zeros((B,), I32),
        "item_overflow": jnp.zeros((B,), I32),
        "item_block_dropped": jnp.zeros((), I32),
    }
    if sel_s is None:
        if rgb is not None:
            zero_aux = dict(zero_aux, rgb=rgb)
        return idx, light, dist, is_sky, zero_aux

    I, N = sel_s["I"], sel_s["N"]
    sel, sel_valid = sel_s["sel"], sel_s["sel_valid"]
    is_spr_sel = sel_s["is_spr_sel"]
    items_dropped = sel_s["items_dropped"]
    if _DEFER_ONLY == 10:
        # selection machinery only (_select_items: sprite scalars,
        # painter keys, nearest-N fold) — no presence, no W-scaled work
        return (idx + sel_valid.sum().astype(I32) + sel.sum(), light,
                dist, is_sky,
                dict(zero_aux, **({"rgb": rgb} if rgb is not None
                                  else {})))
    KI = cfg.item_capacity
    # item-composite kernel path (ops/pallas_items.py): the composite
    # fold AND the per-slot sprite seg-clip run in VMEM; the [B,W,K,N]
    # clip reductions below are skipped entirely
    use_items = item_kernel and rgb is not None and level.items_ok
    # the item kernel's in-VMEM sprite clip holds all KI slots in one
    # (8, 128) vreg (sublane = slot) — item_capacity above 8 falls back
    # to the XLA clip reductions instead of asserting in the kernel
    clip_in_kernel = use_items and MO > 0 and "lsx" in clip and KI <= 8
    yy = jnp.arange(H, dtype=I32)[None, :, None]
    xcol = jnp.arange(W, dtype=I32)[None, :]

    ROWS = level.atlas_rows
    PW = level.spr_pixels.shape[2]

    # ---------------- mid-pool slot map (presence + fill) -------------------
    # A mid item's draw data IS its KIND_MID mid-pool slot; copying it
    # per selected item would cost K x [B, N, W].  Instead: precompute
    # presence per (mid, column) once (cheap, [B, D, W] bool), emit mids
    # into the item pool with just their seg id + a marker, and fill the
    # slots' planes from the mid pool afterwards (KI x KMID on [B, W]).
    m_span, m_d6 = midp["span"], midp["d6"]
    KMID = m_span.shape[2]
    m_ok = (
        jnp.arange(KMID, dtype=I32)[None, None] < midp["cnt"][..., None]
    )
    mid_slot = (((m_span >> 29) & 3) == KIND_MID) & m_ok         # [B,W,KMID]

    # ---------------- per-item scalars (presence-independent) ---------------
    one = f32(1.0)
    fbits = lambda v: lax.bitcast_convert_type(f32(v), I32)
    fields = {"fl": sel_valid.astype(I32) | (is_spr_sel.astype(I32) << 1)}
    if MO > 0:
        sp = sel_s["spr"]
        x0i = as_i16(sp["bsx"])
        x1i = as_i16(sp["bex"])                                  # exclusive
        # identical expressions to the old [B, N, W] stage setup (the
        # [..., None] broadcasts are gone; values are per-item)
        s_len = jnp.sqrt(
            smul(sp["lsx"] - sp["lex"], sp["lsx"] - sp["lex"])
            + smul(sp["lsy"] - sp["ley"], sp["lsy"] - sp["ley"])
        )
        fields.update(
            bsx=sp["bsx"],
            dxi=sp["bex"] - sp["bsx"],
            inv0=fbits(one / f32(sp["lsx"])),
            inv1=fbits(one / f32(sp["lex"])),
            z0=fbits(f32(0.0) / f32(sp["lsx"])),
            z1=fbits(s_len / f32(sp["lex"])),
            soffi=as_i16(sp["soff"]),
            wpic=sp["wpic"],
            pic=sp["pic"],
            th=level.spr_h[sp["pic"]],
            light=sp["light"],
            ybs=fbits(sp["ybs"]), ybd=fbits(sp["ybd"]),
            yts=fbits(sp["yts"]), ytd=fbits(sp["ytd"]),
            uy1=fbits(sp["uy1"]),
            vpx=fbits(sp["vpx"]), vpy=fbits(sp["vpy"]),
        )
    if D > 0:
        segsel = sel_s["segsel"]                                 # [B, N]
        want_mid = ~is_spr_sel if MO > 0 else jnp.ones((B, N), bool)
        fields["segsel"] = segsel
    names = list(fields)
    Fn = len(names)
    src_n = jnp.stack([fields[k] for k in names], axis=-1)   # [B, N, F]
    halves_n = jnp.concatenate(
        [f32(src_n & 0xFFFF), f32((src_n >> 16) & 0xFFFF)], axis=-1
    )                                                        # [B, N, 2F]

    # ---------------- emit into the per-column item pool --------------------
    # Nearest item first (slot 0 = nearest), so a full column drops the
    # FARTHEST items; the composite then folds farthest -> nearest.
    # Vectorized (an N-step sequential fori cost ~50 ms at 408 items):
    # an item's slot is the count of present nearer items (reverse
    # cumsum along n), and the pool content is gathered with an EXACT
    # one-hot contraction over n.
    #
    # What rides through the contraction is per-ITEM SCALARS [B, N, 2F]
    # (u16 halves — exactly representable in f32, and a one-hot row has
    # a single 1.0, so the fold is bit-identical to a gather); ALL
    # per-column math (billboard u/zd/by/ty interpolation, the sprite
    # seg clip) then runs POST-emission on [B, W, KI] — KI(8) vs N(320)
    # is ~40x less arithmetic + HBM traffic than the old [B, N, W]
    # column stages, with bit-identical results: the same f32 ops in
    # the same order run on the same folded per-item values, indexed by
    # pool slot instead of item row.
    #
    # BLOCK-LOCAL emission (cfg.item_block_capacity = NB > 0): the
    # census says only ~7 mean / 20 max DISTINCT items are live per
    # (camera tile, 128-column block) while N is the ~288 worst case —
    # so the presence/cumsum/one-hot operands above are ~12x denser
    # than the work.  This path compacts each (tile, block) to its <=NB
    # live items first (ascending n order preserved), then runs the
    # same reverse-cumsum + one-hot fold on [.., NB, 128, KI].  When no
    # (tile, block) exceeds NB (item_block_dropped == 0, calibrated +
    # asserted exactly like live_dropped) every output is bit-identical
    # to the dense path: per column the present subset and its order
    # are unchanged, and the fold arithmetic is the same u16-halves
    # one-hot contraction.  Truncation keeps the NEAREST items (the
    # dense path's own full-column policy drops farthest first).
    ki_iota = jnp.arange(KI, dtype=I32)[None, None, :]
    blk_dropped = jnp.zeros((), I32)
    use_blk = (
        cfg.item_block_capacity > 0 and B % 4 == 0 and _DEFER_ONLY != 6
    )
    if use_blk:
        LAN = 128
        NBWi = (W + LAN - 1) // LAN
        Wp = NBWi * LAN
        TBi = 8 if B % 8 == 0 else 4
        Bt = B // TBi
        NB = min(cfg.item_block_capacity, N)
        wlo = jnp.arange(NBWi, dtype=I32)[None, None] * LAN  # [1,1,NBW]

        # --- block liveness per selected item, unioned over the tile
        live_i = jnp.zeros((B, N, NBWi), bool)
        if MO > 0:
            live_i = live_i | (
                (x0i[..., None] < wlo + LAN) & (x1i[..., None] > wlo)
                & is_spr_sel[..., None]
            )
        if D > 0:
            # seg -> block presence from the mid pool via ONE scatter
            # over the pool entries, then a gather per selected mid
            wblk = jnp.broadcast_to(
                (xcol // LAN)[..., None], m_d6.shape
            )                                                # [B,W,KMID]
            tgt = jnp.where(mid_slot, m_d6, G)
            segblk = jnp.zeros((B, NBWi, G + 1), bool).at[
                jnp.arange(B, dtype=I32)[:, None, None], wblk, tgt
            ].set(True)                                      # [B,NBW,G+1]
            live_mid = jnp.take_along_axis(
                segblk,
                jnp.clip(segsel, 0, G)[:, None, :], axis=2,
            ).transpose(0, 2, 1) & want_mid[..., None]       # [B,N,NBW]
            live_i = live_i | live_mid
        live_i = live_i & sel_valid[..., None]
        live_tn = jnp.swapaxes(
            live_i.reshape(Bt, TBi, N, NBWi).any(1), 1, 2
        )                                                    # [Bt,NBW,N]

        # keep the NEAREST NB (largest n = nearest; farthest-first
        # order must survive the truncation)
        rev = jnp.cumsum(
            live_tn[:, :, ::-1].astype(I32), axis=2
        )[:, :, ::-1]                                        # live with >= n
        keep = live_tn & (rev <= NB)
        blk_dropped = (live_tn & (rev > NB)).sum().astype(I32)
        n_iota = jnp.arange(N, dtype=I32)[None, None]
        ilist = jnp.argsort(
            jnp.where(keep, n_iota, N + n_iota), axis=-1
        ).astype(I32)[..., :NB]                              # [Bt,NBW,NB]
        lval = jnp.take_along_axis(keep, ilist, axis=-1)
        il_safe = jnp.where(lval, ilist, 0)

        def gatherL(x):
            """[B, N] -> [Bt, TBi, NBW, NB] at the listed slots."""
            return jnp.take_along_axis(
                x.reshape(Bt, TBi, 1, N),
                jnp.broadcast_to(
                    il_safe[:, None], (Bt, TBi, NBWi, NB)
                ),
                axis=3,
            )

        colL = (
            wlo.reshape(1, 1, NBWi, 1, 1)
            + jnp.arange(LAN, dtype=I32).reshape(1, 1, 1, 1, LAN)
        )                                                    # block columns
        svalidL = gatherL(sel_valid.astype(I32)) != 0
        presL = jnp.zeros((Bt, TBi, NBWi, NB, LAN), bool)
        if MO > 0:
            is_sprL = gatherL(is_spr_sel.astype(I32)) != 0
            in_sprL = (
                (colL >= gatherL(x0i)[..., None])
                & (colL < gatherL(x1i)[..., None])
                & is_sprL[..., None]
            )
            presL = presL | in_sprL
        if D > 0:
            segL = gatherL(jnp.where(want_mid, segsel, -1))
            m_d6p = jnp.pad(
                m_d6, ((0, 0), (0, Wp - W), (0, 0))
            ).reshape(Bt, TBi, NBWi, LAN, KMID)
            slotp = jnp.pad(
                mid_slot, ((0, 0), (0, Wp - W), (0, 0))
            ).reshape(Bt, TBi, NBWi, LAN, KMID)
            mid_hitL = (
                slotp[:, :, :, None]
                & (m_d6p[:, :, :, None] == segL[..., None, None])
            ).any(-1)                                        # [..,NB,LAN]
            presL = presL | mid_hitL
        presL = presL & (lval & (il_safe < N))[:, None, :, :, None]
        presL = presL & svalidL[..., None] & (colL < W)

        rcL = jnp.cumsum(
            presL[:, :, :, ::-1].astype(I32), axis=3
        )[:, :, :, ::-1]                                     # [..,NB,LAN]
        slotL = rcL - 1
        fitsL = slotL < KI
        doL = presL & fitsL
        icnt = jnp.minimum(
            rcL[:, :, :, 0], KI
        ).reshape(B, Wp)[:, :W]                              # [B, W]
        item_overflow = (
            (presL & ~fitsL).sum(axis=(2, 3, 4)).reshape(B).astype(I32)
        )
        ohL = jnp.where(doL, slotL, -1)

        def _cut(extra):
            daux = {"items_dropped": items_dropped,
                    "item_overflow": item_overflow,
                    "item_block_dropped": blk_dropped}
            if rgb is not None:
                daux["rgb"] = rgb
            return idx + extra.astype(I32), light, dist, is_sky, daux

        if _DEFER_ONLY == 4:
            return _cut(ohL.sum() + icnt.sum())
        onehotL = (
            ohL[..., None] == jnp.arange(KI, dtype=I32)
        ).astype(jnp.float32)                        # [..,NB,LAN,KI]
        halvesL = jnp.take_along_axis(
            halves_n.reshape(Bt, TBi, 1, N, 2 * Fn),
            jnp.broadcast_to(
                il_safe[:, None, :, :, None],
                (Bt, TBi, NBWi, NB, 2 * Fn),
            ),
            axis=3,
        )                                            # [..,NB,2F]
        foldv = lax.dot_general(
            halvesL, onehotL,
            dimension_numbers=(((3,), (3,)), ((0, 1, 2), (0, 1, 2))),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )                                            # [..,2F,LAN,KI]
        foldv = (
            foldv.transpose(0, 1, 3, 2, 4, 5)        # [Bt,TBi,2F,NBW,LAN,KI]
            .reshape(B, 2 * Fn, Wp, KI)[:, :, :W]
        )
    else:
        # ---------------- dense presence [B, N, W] ---------------------------
        if MO > 0:
            in_range = (xcol[:, None] >= x0i[..., None]) & (
                xcol[:, None] < x1i[..., None]
            )
            pres_spr = in_range & is_spr_sel[..., None]
        if _DEFER_ONLY == 9:
            ps = pres_spr & sel_valid[..., None] if MO > 0 else sel_valid
            return (idx + ps.sum().astype(I32), light, dist, is_sky,
                    dict(zero_aux, **({"rgb": rgb} if rgb is not None
                                      else {})))
        if D > 0 and DEFER_MIDPRES:
            # per-item join: KMID compare-or rounds on [B, N, W]
            # directly against each selected item's seg id — skips the
            # [B, D, W] dseg expansion AND the [B, N, W]-point
            # take_along_axis.  Identical truth table: item n present
            # iff some valid mid-pool slot at (b, w) holds segsel[b, n].
            segsel_e = segsel[..., None]                         # [B,N,1]
            present_m = jnp.zeros((B, N, W), bool)
            for k in range(KMID):
                present_m = present_m | (
                    mid_slot[:, :, k][:, None, :]
                    & (m_d6[:, :, k][:, None, :] == segsel_e)
                )
            present_m = present_m & want_mid[..., None]
        elif D > 0:
            presence_d = jnp.zeros((B, D, W), bool)
            for k in range(KMID):
                hit = mid_slot[:, :, k]                          # [B, W]
                presence_d = presence_d | (
                    hit[:, None, :]
                    & (m_d6[:, :, k][:, None, :] == dsegs_j[None, :, None])
                )
            present_m = jnp.take_along_axis(
                presence_d, jnp.clip(sel - MO, 0, D - 1)[..., None], axis=1
            ) & want_mid[..., None]                              # [B, N, W]
        if MO > 0 and D > 0:
            pres = jnp.where(is_spr_sel[..., None], pres_spr, present_m)
        elif MO > 0:
            pres = pres_spr
        else:
            pres = present_m
        pres = pres & sel_valid[..., None]
        if _DEFER_ONLY == 7:
            return (idx + pres.sum().astype(I32), light, dist, is_sky,
                    dict(zero_aux, **({"rgb": rgb} if rgb is not None
                                      else {})))

        rc = jnp.cumsum(pres[:, ::-1, :].astype(I32), axis=1)[:, ::-1, :]
        if _DEFER_ONLY == 8:
            return (idx + rc.sum(), light, dist, is_sky,
                    dict(zero_aux, **({"rgb": rgb} if rgb is not None
                                      else {})))
        slot = rc - 1
        fits = slot < KI
        do = pres & fits
        icnt = jnp.minimum(rc[:, 0, :], KI)                  # [B, W]
        item_overflow = (pres & ~fits).sum(axis=(1, 2)).astype(I32)
        oh = jnp.where(do, slot, -1)                         # [B, N, W]

        def _cut(extra):
            daux = {"items_dropped": items_dropped,
                    "item_overflow": item_overflow,
                    "item_block_dropped": blk_dropped}
            if rgb is not None:
                daux["rgb"] = rgb
            return idx + extra.astype(I32), light, dist, is_sky, daux

        if _DEFER_ONLY == 6:
            # capacity probe (scripts/probe_bench_capacities.py): the
            # UNCAPPED per-column item-presence peak — the
            # item_capacity a workload truly needs — rides the idx
            # channel (probe subtracts the background idx to recover)
            return _cut(rc[:, 0, :].max())

        if _DEFER_ONLY == 4:
            return _cut(oh.sum() + icnt.sum())
        onehot = (
            oh.transpose(0, 2, 1)[..., None] == ki_iota[:, :, None, :]
        ).astype(jnp.float32)                                # [B, W, N, KI]
        foldv = lax.dot_general(
            halves_n, onehot,
            dimension_numbers=(((1,), (2,)), ((0,), (0,))),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )                                                    # [B, 2F, W, KI]

    vals = foldv[:, :Fn].astype(I32) | (
        foldv[:, Fn:].astype(I32) << 16
    )                                                        # [B, F, W, KI]
    # the barrier materializes the folded scalars once; without it XLA
    # re-fuses (recomputes) the fold into multiple consumers
    vals = lax.optimization_barrier(vals)
    if _DEFER_ONLY == 1:
        return _cut(vals.sum())
    sc = {k: vals[:, i] for i, k in enumerate(names)}        # [B, W, KI]
    scf = lambda k: lax.bitcast_convert_type(sc[k], F32)

    fl_s = sc["fl"]
    valid_slot = (fl_s & 1) != 0          # == (ki < icnt), by construction
    is_spr_slot = (fl_s & 2) != 0
    zero_s = jnp.zeros((B, W, KI), I32)

    # ---- sprite per-slot column math (old [B, N, W] stages at [B, W, KI]) --
    if MO > 0:
        xw = xcol[..., None]                                 # [1, W, 1]
        ax = f32(xw - sc["bsx"]) / f32(sc["dxi"])
        denom = smul(one - ax, scf("inv0")) + smul(ax, scf("inv1"))
        u = (smul(one - ax, scf("z0")) + smul(ax, scf("z1"))) / denom
        s_tx = as_i16(u) + sc["soffi"]
        s_tx = wrap_tex(s_tx, jnp.maximum(sc["wpic"], 1))
        s_zd = as_i16(((one - ax) + ax) / denom)
        xbf = f32(xw - sc["bsx"])
        s_by = as_i16(scf("ybs") + smul(xbf, scf("ybd")))
        s_ty = as_i16(scf("yts") + smul(xbf, scf("ytd")))

        # ---- seg clip bounds per pool slot --------------------------------
        if clip_in_kernel:
            # the item kernel applies seg clip per pool slot; only the
            # screen clamp happens here (max/min associativity matches:
            # max(max(0, s_ty), tsc) == max(0, s_ty, tsc)).  The upper
            # clamp to H keeps ct+1 inside the pool word's 9-bit field
            # (a sprite fully below the screen has s_ty >> 511, which
            # would otherwise alias into the visible range); ct == H
            # draws nothing, exactly like any ct > H would.
            s_ct = jnp.minimum(jnp.maximum(0, s_ty), H)
            s_cb = jnp.minimum(H - 1, s_by)
        else:
            # front[b, w, k, ki]: is clip slot k's seg in front of the
            # item in pool slot ki (bitmap_render.rs:137-165).  KI-wide
            # instead of the old N-wide [B, W, K, N] reductions.
            # Pool-stored seg coords are fin()-sanitized copies of the
            # frame coords (pallas_paint.py emit_clip zeroes non-finite
            # coords of INVALID segs only), so for k < cnt they equal
            # frame["lsx"][d6] bit-for-bit and k >= cnt is masked by k_ok
            # below.  If emit_clip ever records partially-invalid segs,
            # this branch diverges from the frame-gather fallback.
            if "lsx" in clip:
                lsx_k = lax.bitcast_convert_type(clip["lsx"], F32)
                lsy_k = lax.bitcast_convert_type(clip["lsy"], F32)
                lex_k = lax.bitcast_convert_type(clip["lex"], F32)
                ley_k = lax.bitcast_convert_type(clip["ley"], F32)
            else:
                def segf(name):
                    return jnp.take_along_axis(
                        frame[name], d6.reshape(B, W * K), axis=1
                    ).reshape(B, W, K)
                lsx_k, lsy_k = segf("lsx"), segf("lsy")
                lex_k, ley_k = segf("lex"), segf("ley")
            k_ok = (
                jnp.arange(K, dtype=I32)[None, None, :] < cnt[..., None]
            )                                                # [B, W, K]
            front = k_ok[..., None] & ~is_behind_vertex(
                lsx_k[..., None], lsy_k[..., None],
                lex_k[..., None], ley_k[..., None],
                scf("vpx")[:, :, None, :], scf("vpy")[:, :, None, :],
            )                                                # [B, W, K, KI]
            e2b_k = ((spans & SPAN_E2B) != 0)[..., None]
            e2t_k = ((spans & SPAN_E2T) != 0)[..., None]
            is_mid_k = (((spans >> 29) & 3) == KIND_MID)[..., None]
            dc_k = ((spans & SPAN_DC) != 0)[..., None] & is_mid_k
            y0_k = (((spans >> 8) & 255) - 1)[..., None]
            y1_k = ((spans & 255) - 1)[..., None]
            by_full = unpack16_hi(d2)[..., None]
            ty_full = unpack16_lo(d2)[..., None]
            tsc = jnp.maximum(
                jnp.where(front & e2t_k, y1_k, -1).max(axis=2),
                jnp.where(front & dc_k, ty_full, -1).max(axis=2),
            )                                                # [B, W, KI]
            bsc = jnp.minimum(
                jnp.where(front & e2b_k, y0_k, H).min(axis=2),
                jnp.where(front & is_mid_k, by_full, H).min(axis=2),
            )
            # upper clamp to H: see the clip_in_kernel branch note
            s_ct = jnp.minimum(jnp.maximum(0, jnp.maximum(s_ty, tsc)), H)
            s_cb = jnp.minimum(H - 1, jnp.minimum(s_by, bsc))

        planes_spr = [
            pack16(s_ct + 1, s_cb + 1) | SPR_MARK,
            level.col_spr_off + sc["pic"] * PW + s_tx,
            pack16(s_by, s_ty),
            pack16(zero_s, sc["th"]),
            pack16(sc["light"], s_zd),
            sc["uy1"],
        ]
        if clip_in_kernel:
            planes_spr += [sc["vpx"], sc["vpy"]]
        if _DEFER_ONLY == 2:
            return _cut(sum(p.sum() for p in planes_spr))

    # mid slots: placeholder planes; the post-pass below fills the real
    # values from the mid pool.  The seg id rides in colbase so the
    # fill can match span slots.
    MID_WORD = ((1 & 0xFFFF) << 16) | 1 | MID_MARK       # pack16(0+1, 0+1)
    planes_mid = [
        jnp.full((B, W, KI), MID_WORD, I32),
        sc["segsel"] if D > 0 else zero_s,
        zero_s, zero_s, zero_s, zero_s,
    ]
    if clip_in_kernel:
        planes_mid += [zero_s, zero_s]

    def _slotsel(a, b):
        if MO == 0:
            v = b
        elif D == 0:
            v = a
        else:
            v = jnp.where(is_spr_slot, a, b)
        # empty slots are all-zero, exactly like a no-match one-hot fold
        return jnp.where(valid_slot, v, 0)

    n_planes = 8 if clip_in_kernel else 6
    ipool = tuple(
        _slotsel(planes_spr[i] if MO > 0 else None, planes_mid[i])
        for i in range(n_planes)
    )
    # ---------------- fill mid slots from the mid pool -----------------------
    # (KI x KMID matching on [B, W] — the mid slot with the same seg id)
    iword, icolbase, ibyty, ioffth, ilightzd, iuy1 = ipool[:6]
    if D > 0 and DEFER_MIDFILL:
        # KMID-outer, vectorized over KI: one fused [B, W, KI] chain of
        # KMID match+select rounds.  Identical results to the nested
        # loop below: same ascending-k last-match-wins overwrite, same
        # zero init for matchless mid slots, non-mid slots untouched.
        m_srcs = (None, midp["d1"], midp["d2"], midp["d3"],
                  midp["d4"], midp["d5"])
        is_mid_i = (iword & MID_MARK) != 0                   # [B, W, KI]
        seg_i = icolbase
        planes = [iword, icolbase, ibyty, ioffth, ilightzd, iuy1]
        accs = [jnp.where(is_mid_i, 0, p) for p in planes]
        for k in range(KMID):
            m3 = (
                is_mid_i & mid_slot[:, :, k][..., None]
                & (m_d6[:, :, k][..., None] == seg_i)
            )                                                # [B, W, KI]
            slot = m_span[:, :, k]
            w_new = pack16(((slot >> 8) & 255), (slot & 255))
            accs[0] = jnp.where(m3, w_new[..., None], accs[0])
            for pi in range(1, 6):
                accs[pi] = jnp.where(
                    m3, m_srcs[pi][:, :, k][..., None], accs[pi]
                )
        iword, icolbase, ibyty, ioffth, ilightzd, iuy1 = accs
    elif D > 0:
        m_d1, m_d2, m_d3 = midp["d1"], midp["d2"], midp["d3"]
        m_d4, m_d5 = midp["d4"], midp["d5"]
        new_planes = [iword, icolbase, ibyty, ioffth, ilightzd, iuy1]
        for ki in range(KI):
            is_mid_i = (iword[:, :, ki] & MID_MARK) != 0         # [B, W]
            seg_i = icolbase[:, :, ki]
            vals = [jnp.zeros((B, W), I32) for _ in range(6)]
            for k in range(KMID):
                m = is_mid_i & mid_slot[:, :, k] & (m_d6[:, :, k] == seg_i)
                slot = m_span[:, :, k]
                w_new = pack16(
                    ((slot >> 8) & 255), (slot & 255)
                )  # already y+1 packed
                src = (w_new, m_d1[:, :, k], m_d2[:, :, k], m_d3[:, :, k],
                       m_d4[:, :, k], m_d5[:, :, k])
                vals = [jnp.where(m, sv, v) for v, sv in zip(vals, src)]
            for pi in range(6):
                new_planes[pi] = jnp.where(
                    is_mid_i[..., None] & (ki_iota == ki),
                    vals[pi][..., None], new_planes[pi],
                )
        iword, icolbase, ibyty, ioffth, ilightzd, iuy1 = new_planes
    iword, icolbase, ibyty, ioffth, ilightzd, iuy1 = (
        lax.optimization_barrier(
            (iword, icolbase, ibyty, ioffth, ilightzd, iuy1)
        )
    )
    if _DEFER_ONLY == 3:
        return _cut(
            iword.sum() + icolbase.sum() + ibyty.sum()
            + ioffth.sum() + ilightzd.sum() + iuy1.sum()
        )

    # ---------------- composite: item kernel fast path ----------------------
    if use_items:
        from doomtpu.ops.pallas_items import (
            LD_SKY, LD_WRITTEN, composite_items,
        )

        ld_in = (
            (light << 16) | (dist & 0xFFFF)
            | jnp.where(idx >= 0, LD_WRITTEN, 0)
            | jnp.where(is_sky, LD_SKY, 0)
        )
        idx2, ld2, rgb2 = composite_items(
            level, cfg, (iword, icolbase, ibyty, ioffth, ilightzd, iuy1),
            icnt, idx, ld_in, rgb,
            clip=clip if clip_in_kernel else None,
            vp=(ipool[6], ipool[7]) if clip_in_kernel else None,
            interpret=interpret,
        )
        daux = {"items_dropped": items_dropped,
                "item_overflow": item_overflow,
                "item_block_dropped": blk_dropped, "rgb": rgb2}
        return (
            idx2, (ld2 >> 16) & 0xFF, ((ld2 & 0xFFFF) << 16) >> 16,
            (ld2 & LD_SKY) != 0, daux,
        )

    # ---------------- composite: farthest -> nearest ------------------------
    use_onehot = jax.default_backend() != "cpu"
    want_rgb = rgb is not None
    rgb24 = jnp.zeros_like(idx) if want_rgb else None
    touched = jnp.zeros(idx.shape, bool) if want_rgb else None
    if use_onehot:
        # texture columns for every pool slot in one slice-gather
        # (per-index cost amortized over ROWS elements — see PERF.md).
        # With rgb requested, the 4-plane atlas yields idx AND the three
        # palette rgb bytes (each <= 255, bf16-exact) from ONE contraction.
        cols_src = level.atlas_cols4 if want_rgb else level.atlas_cols
        texcols = cols_src[
            jnp.clip(icolbase, 0, cols_src.shape[0] - 1)
        ]                                     # [B,W,KI,R(,4)]
        r_iota = jnp.arange(ROWS, dtype=I32)

    for k in reversed(range(KI)):
        word = iword[:, :, k]
        ok_k = k < icnt                                          # [B, W]
        ct = (((word >> 16) & 0x1FF) - 1)[:, None, :]
        cb = (unpack16_lo(word) - 1)[:, None, :]
        by = unpack16_hi(ibyty[:, :, k])[:, None, :]
        ty = unpack16_lo(ibyty[:, :, k])[:, None, :]
        off_y = unpack16_hi(ioffth[:, :, k])[:, None, :]
        th = unpack16_lo(ioffth[:, :, k])[:, None, :]
        light_i = unpack16_hi(ilightzd[:, :, k])[:, None, :]
        zd = unpack16_lo(ilightzd[:, :, k])[:, None, :]
        uy1 = lax.bitcast_convert_type(iuy1[:, :, k], F32)[:, None, :]

        cover = (
            ok_k[:, None, :] & (yy >= ct) & (yy <= cb)
        )                                                         # [B, H, W]
        ay = f32(yy - ty) / f32(by - ty)
        tyv = as_i16(f32(th) + smul(ay, uy1)) + off_y
        tyv = wrap_tex(tyv, jnp.maximum(th, 1))

        k_rgb24 = None
        if use_onehot:
            # per-pixel row select from the slot's texture column via an
            # exact bf16 one-hot contraction (palette values and -1 are
            # bf16-exact); avoids the ~0.1 G/s per-pixel gather path
            ohr = (tyv.transpose(0, 2, 1)[..., None] == r_iota).astype(
                jnp.bfloat16
            )                                                     # [B,W,H,R]
            if want_rgb:
                out4 = lax.dot_general(
                    ohr, texcols[:, :, k, :, :].astype(jnp.bfloat16),
                    dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                    preferred_element_type=jnp.float32,
                )                                                 # [B,W,H,4]
                texel_f = out4[..., 0].transpose(0, 2, 1)
                k_rgb24 = (
                    (out4[..., 1].astype(I32) << 16)
                    | (out4[..., 2].astype(I32) << 8)
                    | out4[..., 3].astype(I32)
                ).transpose(0, 2, 1)
            else:
                texel_f = lax.dot_general(
                    ohr, texcols[:, :, k, :, None].astype(jnp.bfloat16),
                    dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                    preferred_element_type=jnp.float32,
                )[..., 0].transpose(0, 2, 1)                      # [B,H,W]
            opaque = texel_f >= 0
            texel = texel_f.astype(I32)
        else:
            t_ix = icolbase[:, :, k][:, None, :] * ROWS + tyv
            packed = level.atlas_cm[
                jnp.clip(t_ix, 0, level.atlas_cm.shape[0] - 1)
            ]
            texel = packed & 0xFF
            opaque = (packed & 0x100) != 0
            if want_rgb:
                k_rgb24 = level.palette_packed[texel]

        write = cover & opaque
        idx = jnp.where(write, texel, idx)
        light = jnp.where(write, light_i, light)
        dist = jnp.where(write, zd, dist)
        is_sky = is_sky & ~write
        if want_rgb:
            rgb24 = jnp.where(write, k_rgb24, rgb24)
            touched = touched | write

    daux = {"items_dropped": items_dropped, "item_overflow": item_overflow,
            "item_block_dropped": blk_dropped}
    if want_rgb:
        # shade the composited item pixels (bitmap_render.rs:190-208)
        # and merge over the kernel-shaded background
        factor = f32(light) / f32(255.0) - smul(dist, 1.0 / (16.0 * 256.0))
        factor = jnp.maximum(factor, 0.0)
        packed = jnp.zeros_like(idx)
        for shift in (16, 8, 0):
            chan = f32((rgb24 >> shift) & 0xFF)
            byte = jnp.clip(jnp.trunc(chan * factor), 0.0, 255.0).astype(I32)
            packed = packed | (byte << shift)
        rgb = jnp.where(touched, packed, rgb)
        daux = dict(daux, rgb=rgb)
    return idx, light, dist, is_sky, daux
