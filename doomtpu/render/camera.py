"""Camera stage: batched seg transform, FOV clip, projection, BSP order.

Replaces the reference's per-seg scalar pipeline (segs.rs:353-489,
misc.rs:13-161) with one vectorized pass over all segs for all cameras at
once [B, G], and the recursive front-to-back BSP walk (mod.rs:69-104) with
a rank-and-argsort: each subsector's traversal rank is assembled from the
camera side bits along its root-to-leaf path, so one argsort yields the
same front-to-back order the recursion would.

All arithmetic mirrors the spec renderer (f32, saturating truncation) so
the two pipelines produce identical pixels.
"""

from __future__ import annotations

import jax.numpy as jnp

from doomtpu.config import ASPECT_RATIO_CORRECTION, PLAYER_EYE_HEIGHT, RenderConfig
from doomtpu.render.device import DeviceLevel
from doomtpu.render.jmath import (
    F32, I32, as_i16, as_i32, f32, is_left_of, rotate, smul,
)


# ---------------------------------------------------------------------------
# BSP traversal order
# ---------------------------------------------------------------------------

def node_side_is_left(level: DeviceLevel, px, py):
    """[B, N] is_left bit per node partition (mod.rs:74-85)."""
    sx, sy = level.node_xy[:, 0], level.node_xy[:, 1]
    dx, dy = level.node_dxy[:, 0], level.node_dxy[:, 1]
    return is_left_of(
        px[:, None], py[:, None], sx[None], sy[None],
        (sx + dx)[None], (sy + dy)[None],
    )


def traversal_rank(level: DeviceLevel, px, py):
    """Front-to-back rank of each subsector.

    Bit d (MSB-first along the path) is 0 when the path takes the node's
    front child (the child visited first), 1 for the back child.  Two
    subsectors first differ at their divergence node, so ranks order
    subsectors exactly as the recursive walk visits them.

    Returns a single [B, SS] i32 for BSP depth <= 31 (every stock map);
    deeper trees (the reference has no depth limit, map/nodes.rs:45-83)
    return a lexicographic two-word key (hi, lo) covering depth <= 62 —
    the branch is static (depth is a trace-time shape).
    """
    is_left = node_side_is_left(level, px, py)            # [B, N]
    path_nodes = level.sub_path_nodes                     # [SS, D]
    path_left = level.sub_path_left                       # [SS, D]
    depth = level.sub_depth                               # [SS]
    D = path_nodes.shape[1]

    side_at = is_left[:, path_nodes]                      # [B, SS, D]
    # front child is the left child iff camera is left of the partition
    bits = (path_left[None] != side_at.astype(I32)).astype(I32)
    d_ix = jnp.arange(D, dtype=I32)
    bits = jnp.where(d_ix[None, None] < depth[None, :, None], bits, 0)
    if D <= 31:
        weights = (1 << (D - 1 - d_ix)).astype(I32)
        return (bits * weights[None, None]).sum(-1)       # [B, SS]
    if D > 62:
        raise NotImplementedError(
            f"BSP depth {D} > 62: widen traversal_rank to a third word"
        )
    # two-word key: word 0 = levels 0..30 (MSB-first), word 1 = 31..61.
    # Each word packs <= 31 bits so it stays a non-negative i32.
    w_hi = jnp.where(d_ix < 31, (1 << (30 - jnp.minimum(d_ix, 30))), 0)
    w_lo = jnp.where(d_ix >= 31, (1 << (61 - jnp.maximum(d_ix, 31))), 0)
    hi = (bits * w_hi.astype(I32)[None, None]).sum(-1)
    lo = (bits * w_lo.astype(I32)[None, None]).sum(-1)
    return hi, lo


# counting-sort seg order (VERDICT r3 #4): subsector ranks are UNIQUE
# per camera (two leaf paths differ at their divergence node's bit), so
# a seg's traversal position decomposes into "segs of
# earlier-ranked subsectors" + its static within-subsector rank — an
# O(SS^2) compare-reduce over SUBSECTORS replaces the O(G log^2 G)
# bitonic [B, G] argsort (SS ~ G/3), and seg_order becomes one scatter
# (the inverse of a permutation).  Bit-identical to the stable argsort
# by construction (test_parity pins the inverse property; the paint/
# scan tests pin the orders).  Module flag for A/B monkeypatching;
# env override for queued sweeps.
import os as _os

# Default OFF: sweep #9 measured the counting path LOSING the camera
# stage on the v5e (INPUTONLY=3: 6.90 ms vs the argsort's 5.70 at
# NP=2048 CAP=416) — the [B, SS, SS] compare-reduce + [B, G] scatter
# inversion cost more than the stable bitonic [B, G] argsort they
# replace at e1m1 scale (SS=237, G=736).  Kept as a knob: the
# asymptotics favor it on maps where SS^2 << G log^2 G.
COUNTING_ORDER = _os.environ.get("DOOMTPU_COUNTING_ORDER", "0") != "0"
# above this subsector count the [B, SS, SS] compare-reduce's
# quadratic memory loses to the bitonic argsort (same reasoning as
# jmath.stable_positions' cutoff)
COUNTING_SS_MAX = 1024


def _counting_ok(level, rank):
    return (
        COUNTING_ORDER
        and not isinstance(rank, tuple)
        and level.sub_nseg.shape[0] <= COUNTING_SS_MAX
    )


def _seg_positions_by_sub(level: DeviceLevel, rank):
    """[B, G] traversal position via the subsector decomposition."""
    nseg = level.sub_nseg                                 # [SS]
    before = rank[:, None, :] < rank[:, :, None]          # [B, SS, SS]
    seg_before = (before * nseg[None, None]).sum(-1).astype(I32)
    return seg_before[:, level.seg_sub] + level.seg_local[None]


def seg_order(level: DeviceLevel, rank):
    """[B, G] seg indices in front-to-back draw order.

    Counting path (default): scatter-invert the positions permutation.
    Argsort path: stable argsort on the subsector rank alone — ties
    (segs of the same subsector) keep ascending seg order, exactly
    like the recursion.  A two-word rank (depth > 31) sorts
    lexicographically via two stable passes: by the low word first,
    then by the high word — stability carries the low-word (and
    seg-index) order through ties.
    """
    if isinstance(rank, tuple):
        hi, lo = rank
        seg_hi = hi[:, level.seg_sub]                     # [B, G]
        seg_lo = lo[:, level.seg_sub]
        perm = jnp.argsort(seg_lo, axis=1, stable=True)
        hi_p = jnp.take_along_axis(seg_hi, perm, axis=1)
        perm2 = jnp.argsort(hi_p, axis=1, stable=True)
        return jnp.take_along_axis(perm, perm2, axis=1).astype(I32)
    if _counting_ok(level, rank):
        pos = _seg_positions_by_sub(level, rank)          # [B, G]
        B, G = pos.shape
        return (
            jnp.zeros((B, G), I32)
            .at[jnp.arange(B, dtype=I32)[:, None], pos]
            .set(
                jnp.broadcast_to(jnp.arange(G, dtype=I32)[None], (B, G)),
                unique_indices=True,
                mode="promise_in_bounds",
            )
        )
    seg_rank = rank[:, level.seg_sub]                     # [B, G]
    return jnp.argsort(seg_rank, axis=1, stable=True).astype(I32)


def order_matches_rank(level: DeviceLevel, rank, order):
    """[B] bool: is `order` exactly the order seg_order(level, rank)
    would produce?  True iff along `order` the current seg rank is
    non-decreasing AND seg indices ascend within equal ranks — the
    defining property of the stable rank-argsort.  Costs one [B, G]
    gather + compares (no argsort), which is what makes cross-tick
    order reuse cheap to police: a camera that crossed a BSP partition
    flips this to False and the caller counts it as staleness."""
    if isinstance(rank, tuple):
        hi, lo = rank
        rh = jnp.take_along_axis(hi[:, level.seg_sub], order, axis=1)
        rl = jnp.take_along_axis(lo[:, level.seg_sub], order, axis=1)
        lt = (rh[:, :-1] < rh[:, 1:]) | (
            (rh[:, :-1] == rh[:, 1:]) & (rl[:, :-1] < rl[:, 1:])
        )
        eq = (rh[:, :-1] == rh[:, 1:]) & (rl[:, :-1] == rl[:, 1:])
    else:
        r = jnp.take_along_axis(rank[:, level.seg_sub], order, axis=1)
        lt = r[:, :-1] < r[:, 1:]
        eq = r[:, :-1] == r[:, 1:]
    idx_asc = order[:, :-1] < order[:, 1:]
    return (lt | (eq & idx_asc)).all(axis=1)


def traversal_positions(level: DeviceLevel, rank):
    """[B, G] front-to-back POSITION of each seg — the inverse of
    `seg_order`'s permutation: order[b, traversal_positions(...)[b, i]]
    == i, exactly.

    A seg's position is the number of segs the stable rank-argsort
    places before it: lower subsector rank, or equal rank (same
    subsector) and lower seg index — the subsector counting
    decomposition when eligible, else jmath.stable_positions
    (compare-reduce for small maps, double stable argsort above its
    quadratic-memory cutoff).  Two-word ranks (depth > 31) invert the
    seg_order permutation directly: argsort of a permutation IS its
    inverse."""
    from doomtpu.render.jmath import stable_positions

    if isinstance(rank, tuple):
        order = seg_order(level, rank)
        return jnp.argsort(order, axis=1, stable=True).astype(I32)
    if _counting_ok(level, rank):
        return _seg_positions_by_sub(level, rank)
    return stable_positions(rank[:, level.seg_sub])


# ---------------------------------------------------------------------------
# FOV clip (misc.rs:13-115), vectorized
# ---------------------------------------------------------------------------

def clip_to_viewport(sx, sy, ex, ey):
    """Returns (ok, nsx, nsy, nex, ney, start_offset), all batched.

    The frustum edges are y = x (left) and y = -x (right); intersection
    algebra is the reference's general line-line formula specialized to
    those edges, preserving f32 rounding.
    """
    sx, sy, ex, ey = f32(sx), f32(sy), f32(ex), f32(ey)
    zero = jnp.zeros_like(sx)

    # is_left_of(p, left edge (0,0)->(1,1)):  cross(p, (1,1)) = px - py <= 0
    s_out_l = (sx * f32(1.0) - sy * f32(1.0)) <= 0.0
    e_out_l = (ex * f32(1.0) - ey * f32(1.0)) <= 0.0
    # right edge (0,0)->(1,-1): cross = px*(-1) - py*(1) <= 0 means "left";
    # outside_right = NOT left
    s_out_r = ~((sx * f32(-1.0) - sy * f32(1.0)) <= 0.0)
    e_out_r = ~((ex * f32(-1.0) - ey * f32(1.0)) <= 0.0)

    s_in = (sx > 0.0) & ~s_out_l & ~s_out_r
    e_in = (ex > 0.0) & ~e_out_l & ~e_out_r

    # line-line intersection (geometry.rs:56-82) with the edge lines
    d = smul(sx, ey) - smul(sy, ex)
    dx12, dy12 = sx - ex, sy - ey
    quot_l = dx12 * f32(-1.0) - dy12 * f32(-1.0)
    quot_r = dx12 * f32(1.0) - dy12 * f32(-1.0)
    ok_l = jnp.abs(quot_l) >= 0.001
    ok_r = jnp.abs(quot_r) >= 0.001
    inv_l = f32(1.0) / quot_l
    inv_r = f32(1.0) / quot_r
    lix = inv_l * (d * f32(-1.0) - dx12 * f32(0.0))
    liy = inv_l * (d * f32(-1.0) - dy12 * f32(0.0))
    rix = inv_r * (d * f32(-1.0) - dx12 * f32(0.0))
    riy = inv_r * (d * f32(1.0) - dy12 * f32(0.0))

    l_hit = ok_l & (lix >= 0.0)
    r_hit = ok_r & (rix >= 0.0)

    reject = (
        (~s_in & ~e_in & ~l_hit & ~r_hit)
        | (~s_in & ~e_in & (l_hit != r_hit))
        | (r_hit & s_out_r & e_out_r)
        | (l_hit & s_out_l & e_out_l)
    )
    fully_in = s_in & e_in
    ok = fully_in | ~reject

    # apply clips (left first, then right — misc.rs:85-112)
    clip_s_l = l_hit & s_out_l & ~fully_in
    clip_e_l = l_hit & e_out_l & ~fully_in
    clip_s_r = r_hit & s_out_r & ~fully_in
    clip_e_r = r_hit & e_out_r & ~fully_in

    start_offset = jnp.where(
        clip_s_l,
        jnp.sqrt(smul(lix - sx, lix - sx) + smul(liy - sy, liy - sy)),
        zero,
    )
    nsx = jnp.where(clip_s_r, rix, jnp.where(clip_s_l, lix, sx))
    nsy = jnp.where(clip_s_r, riy, jnp.where(clip_s_l, liy, sy))
    nex = jnp.where(clip_e_r, rix, jnp.where(clip_e_l, lix, ex))
    ney = jnp.where(clip_e_r, riy, jnp.where(clip_e_l, liy, ey))
    return ok, nsx, nsy, nex, ney, start_offset


# ---------------------------------------------------------------------------
# Projection (misc.rs:130-161)
# ---------------------------------------------------------------------------

def project_x(cfg: RenderConfig, vx, vy):
    """Screen x (i32) of a view-space vertex; clamped to W-1 above."""
    tx = f32(cfg.game_camera_focus_x) * f32(vy) / f32(vx)
    tx = smul(tx, ASPECT_RATIO_CORRECTION)
    px = as_i32(f32(cfg.camera_focus_x) - tx)
    return jnp.minimum(px, cfg.width - 1)


def project_y(cfg: RenderConfig, vx, height):
    """Screen y (i32) of a view-space vertex at a given world height."""
    ty = f32(cfg.game_camera_focus_x) * f32(height) / f32(vx)
    return as_i32(f32(cfg.camera_focus_y) - ty)


# ---------------------------------------------------------------------------
# Seg frame assembly
# ---------------------------------------------------------------------------

def animated_flat(level: DeviceLevel, flat_id, timestamp):
    """flats.rs:103-111 as pure indexing; timestamp broadcasts per camera."""
    base = level.flat_anim_base[flat_id]
    n = level.flat_anim_len[flat_id]
    cycle = (f32(timestamp) * f32(3.0)).astype(I32) % n
    return jnp.where(n > 1, base + cycle, flat_id)


def build_seg_frame(
    level: DeviceLevel,
    cfg: RenderConfig,
    px, py, angle, floor_height,       # player state, each [B]
    sector_light,                      # [B, SEC]
    timestamp,                         # [B]
):
    """All per-(camera, seg) quantities the wall scan and resolve need.

    Returns a dict of [B, G] / [B, G, 4] arrays ("seg frame") in ORIGINAL
    seg index order; the scan gathers them per camera into traversal
    order.  Mirrors process_seg (segs.rs:353-489).
    """
    B = px.shape[0]
    G = level.num_segs

    # --- view transform --------------------------------------------------
    v1x = level.seg_v1[None, :, 0] - px[:, None]
    v1y = level.seg_v1[None, :, 1] - py[:, None]
    v2x = level.seg_v2[None, :, 0] - px[:, None]
    v2y = level.seg_v2[None, :, 1] - py[:, None]
    na = -angle[:, None]
    ssx, ssy = rotate(v1x, v1y, na)
    sex, sey = rotate(v2x, v2y, na)

    ok, lsx, lsy, lex, ley, start_offset = clip_to_viewport(ssx, ssy, sex, sey)
    valid = ok & (level.seg_front_side[None] >= 0)

    # --- sector attributes -------------------------------------------------
    fsec = jnp.maximum(level.seg_front_sector, 0)
    bsec_raw = level.seg_back_sector
    bsec = jnp.maximum(bsec_raw, 0)
    has_back = bsec_raw >= 0

    floor_h_i = level.sector_floor_h[fsec][None].astype(I32)       # [1,G]
    ceil_h_i = level.sector_ceil_h[fsec][None].astype(I32)
    bfloor_i = level.sector_floor_h[bsec][None].astype(I32)
    bceil_i = level.sector_ceil_h[bsec][None].astype(I32)

    floor_h = f32(floor_h_i)
    ceil_h = f32(ceil_h_i)

    has_pb = has_back[None] & (bfloor_i > floor_h_i)
    has_pt = has_back[None] & (bceil_i < ceil_h_i) & ~level.seg_sky_hack[None]
    pb = f32(bfloor_i)
    pt = f32(bceil_i)

    # sky hack lowers the drawn ceiling (segs.rs:459-477)
    ceil_used = jnp.where(
        level.seg_sky_hack[None], jnp.minimum(f32(bceil_i), ceil_h), ceil_h
    )
    draw_ceiling = jnp.broadcast_to(level.seg_draw_ceiling[None], (B, G))

    ph = f32(floor_height)[:, None] + f32(PLAYER_EYE_HEIGHT)

    # --- backface + side-on tests on the projected floor line ---------------
    bsx_px = project_x(cfg, lsx, lsy)
    bex_px = project_x(cfg, lex, ley)
    valid = valid & (bsx_px <= bex_px)                 # backface (segs.rs:446)
    valid = valid & (as_i16(bsx_px) != as_i16(bex_px))  # side-on (segs.rs:151)

    # --- per-piece line endpoints ---------------------------------------------
    two_sided = jnp.broadcast_to(level.seg_two_sided[None], (B, G))
    h_floor = floor_h - ph
    h_ceil = ceil_used - ph
    h_pb = pb - ph
    h_pt = pt - ph
    h_mid_b = jnp.where(has_pb, h_pb, h_floor)
    h_mid_t = jnp.where(has_pt, h_pt, h_ceil)

    # piece (bottom, top) heights, [B, G, 4]
    hb = jnp.stack([h_floor, h_mid_b, h_floor, jnp.where(has_pt, h_pt, h_ceil)], -1)
    ht = jnp.stack([h_ceil, h_mid_t, jnp.where(has_pb, h_pb, h_floor), h_ceil], -1)

    def proj_y_pair(h):
        return (
            project_y(cfg, lsx[..., None], h),
            project_y(cfg, lex[..., None], h),
        )

    yb_s, yb_e = proj_y_pair(hb)
    yt_s, yt_e = proj_y_pair(ht)

    denom = f32(bsx_px - bex_px)
    yb_d = f32(yb_s - yb_e) / denom[..., None]
    yt_d = f32(yt_s - yt_e) / denom[..., None]

    active = jnp.stack(
        [
            jnp.ones_like(two_sided),       # piece 0 always runs
            two_sided,                      # mid
            two_sided & has_pb,             # lower
            two_sided & has_pt,             # upper
        ],
        -1,
    ) & valid[..., None]

    # texture offsets (segs.rs:496-587)
    unpeg_b = level.seg_unpeg_bottom[None]
    unpeg_t = level.seg_unpeg_top[None]
    bg = lambda x: jnp.broadcast_to(x, (B, G))
    off0 = bg(jnp.where(~two_sided & unpeg_b, as_i32(floor_h - ceil_used), 0))
    off2 = bg(jnp.where(unpeg_b, as_i32(ceil_used - pb), 0))
    off3 = bg(jnp.where(unpeg_t, 0, as_i32(pt - ceil_used)))
    off_y = jnp.stack([off0, jnp.zeros_like(off0), off2, off3], -1)
    # reference adds two i16s; we carry i32 (map offsets never overflow i16)
    off_y_total = level.seg_yoff[None, :, None] + as_i16(off_y)

    tex = jnp.stack(
        [
            jnp.broadcast_to(level.seg_mid_tex[None], (B, G)),
            jnp.broadcast_to(level.seg_mid_tex[None], (B, G)),
            jnp.broadcast_to(level.seg_low_tex[None], (B, G)),
            jnp.broadcast_to(level.seg_up_tex[None], (B, G)),
        ],
        -1,
    )

    solid = ~two_sided
    wall_emit = jnp.stack(
        [solid, two_sided, active[..., 2], active[..., 3]], -1
    ) & active
    draws = jnp.stack(
        [
            solid & (tex[..., 0] >= 0),
            jnp.zeros_like(solid),
            tex[..., 2] >= 0,
            tex[..., 3] >= 0,
        ],
        -1,
    ) & active

    # take_along_axis (not an explicit iota-batched gather): the batch
    # axis stays a gather *batching* dim, so under an env-sharded mesh
    # GSPMD keeps the lookup shard-local instead of all-gathering the
    # [B, SEC] operand (test_camera_sort_is_shard_local asserts
    # all-gather == 0 on the full render HLO)
    light = jnp.take_along_axis(
        sector_light, jnp.broadcast_to(fsec[None], (B, fsec.shape[0])),
        axis=1,
    )

    flat_f = animated_flat(
        level, level.sector_floor_flat[fsec][None], timestamp[:, None]
    )
    flat_c = animated_flat(
        level, level.sector_ceil_flat[fsec][None], timestamp[:, None]
    )

    length = jnp.sqrt(smul(lsx - lex, lsx - lex) + smul(lsy - ley, lsy - ley))

    return {
        "valid": valid,
        "x0": bsx_px, "x1": bex_px,
        "lsx": lsx, "lsy": lsy, "lex": lex, "ley": ley,
        "start_offset": start_offset, "length": length,
        "offset_x_total": as_i16(level.seg_xoff)[None]
        + jnp.broadcast_to(level.seg_offset[None], (B, G)),
        "light": light,
        "floor_flat": flat_f, "ceil_flat": flat_c,
        "floor_h_i": jnp.broadcast_to(floor_h_i, (B, G)),
        "ceil_h_i": jnp.broadcast_to(ceil_h_i, (B, G)),
        "draw_ceiling": draw_ceiling,
        "two_sided": two_sided,
        "active": active, "wall_emit": wall_emit, "draws": draws,
        "yb_s": yb_s, "yb_d": yb_d, "yt_s": yt_s, "yt_d": yt_d,
        "uy1": ht - hb,
        "off_y": off_y_total,
        "tex": tex,
    }
