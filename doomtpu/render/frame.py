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


def paint_available(level, cfg, B) -> bool:
    """Static eligibility of the paint-kernel fast path."""
    import jax as _jax

    from doomtpu.render import jmath

    return (
        cfg.use_pallas_paint
        # exact-TPU mode pins products with lax.reduce_precision, which
        # Mosaic does not lower (sweep #13: "Unimplemented primitive
        # ... reduce_precision") — exact mode runs the pure XLA
        # pipeline, which measures the identical 421-px fast-path
        # divergence, so the attribution experiment loses nothing
        and not jmath.exact_tpu_enabled()
        and level.paint_ok
        # UNCAPPED, the per-(tile, block) compacted input packs are
        # sized Gp rows per block (static worst case) — bounded at
        # ~2 GB per 256-camera chunk by paint_max_segs.  With a
        # paint_live_capacity the packs are Gc = cap rows per block —
        # independent of map size (every remaining per-seg array is
        # linear in G) — so ANY map rides the paint path; callers
        # assert aux["live_dropped"] == 0 for exactness (bench.py does,
        # engine.render_counters exposes it).
        and (
            level.num_segs <= cfg.paint_max_segs
            or cfg.paint_live_capacity > 0
        )
        and B % 4 == 0
        and cfg.height % 8 == 0
        and _jax.default_backend() != "cpu"
    )


def _itempack_fits(level, cfg) -> bool:
    I = level.num_mobjs + int(level.dseg_ix.shape[0])
    if I == 0:
        return False
    N = I if cfg.max_visible_mobjs <= 0 else min(cfg.max_visible_mobjs, I)
    # SMEM budget: the item packs cost (8 + 12 rows) * TB * 4 B per item,
    # double-buffered (= 1280 B/item at TB=8), beside the ~100 KB the
    # flattened seg packs use (SMEM is 1 MB)
    return N * 1280 <= 600_000


def itempass_available(level, cfg, B) -> bool:
    """Static eligibility of the standalone item-pass kernel
    (ops/pallas_itempass.py): the deferred item pass fully in-kernel."""
    return (
        cfg.use_item_pass_kernel
        and paint_available(level, cfg, B)
        and level.itempaint_ok
        and _itempack_fits(level, cfg)
    )


def _stages_paint(level, cfg, px, py, angle, floor_height, sector_light,
                  timestamp, interpret=False, reuse=None, want_reuse=False):
    """Fast path: walls/planes/sky painted in-kernel (pallas_paint).

    reuse/want_reuse: cross-tick live-list reuse (see render_paint).
    With `reuse`, the traversal order comes from reuse["order"] and is
    validated against this pose's rank (cam.order_matches_rank);
    cameras whose BSP order changed count into aux["live_stale"]."""
    from doomtpu.ops.pallas_paint import LD_SKY, render_paint

    frame = cam.build_seg_frame(
        level, cfg, px, py, angle, floor_height, sector_light, timestamp
    )
    frame = jax.lax.optimization_barrier(frame)
    rank = cam.traversal_rank(level, px, py)
    order_stale = jnp.zeros((), jnp.int32)
    if reuse is not None:
        order = reuse["order"]
        order_stale = (
            ~cam.order_matches_rank(level, rank, order)
        ).sum().astype(jnp.int32)
    else:
        order = cam.seg_order(level, rank)
    out = render_paint(
        level, cfg, frame, order, angle, px, py, floor_height,
        interpret=interpret,
        reuse=None if reuse is None else reuse["paint"],
        want_reuse=want_reuse,
    )
    ld = out["ld"]
    light = (ld >> 16) & 0xFF
    dist = ((ld & 0xFFFF) << 16) >> 16
    is_sky = (ld & LD_SKY) != 0
    aux = {
        "frame": frame, "order": order,
        "midpool": out["midpool"], "cnt_mid": out["cnt_mid"],
        "clippool": out["clippool"], "cnt_clip": out["cnt_clip"],
        "overflow": out["overflow"], "live_dropped": out["live_dropped"],
        "live_stale": out["live_stale"] + order_stale,
        "light": light, "dist": dist, "is_sky": is_sky,
    }
    if want_reuse:
        aux["reuse"] = {"order": order, "paint": out["reuse"]}
    return out["idx"], light, dist, is_sky, out["rgb"], aux


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
    from doomtpu.render import jmath as _jm

    if (cfg.use_pallas_scan and B % 8 == 0
            and not _jm.exact_tpu_enabled()
            and jax.default_backend() != "cpu"):
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
    if paint_available(level, cfg, px.shape[0]):
        idx, light, dist, is_sky, rgb, aux = _stages_paint(
            level, cfg, px, py, angle, floor_height, sector_light, timestamp
        )
        return idx, rgb, aux
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
    reuse=None, want_reuse: bool = False,
):
    """The full frame: walls, planes, sky, sprites, masked mids.

    Batched equivalent of Renderer::render (renderer/mod.rs:118-136).
    Returns (idx [B,H,W] palette indices with -1 = unwritten,
    rgb [B,H,W] packed 0xRRGGBB i32, aux dict).

    reuse/want_reuse (cross-tick live-list reuse, rollouts): only the
    paint-kernel pipeline supports it; want_reuse returns the pose-
    derived traversal/compaction metadata in aux["reuse"], and passing
    it back skips those stages with aux["live_stale"] policing
    exactness (callers assert it 0 like every drop counter).
    """
    from doomtpu.render import things

    B = px.shape[0]
    if reuse is not None or want_reuse:
        assert paint_available(level, cfg, B) and not itempass_available(
            level, cfg, B
        ), "live-list reuse requires the paint+deferred pipeline"
    if itempass_available(level, cfg, B):
        # walls/planes/sky from the paint kernel, sprites + mids from
        # the item-pass kernel — no [B, N, W] XLA stage anywhere
        from doomtpu.ops.pallas_itempass import item_pass
        from doomtpu.ops.pallas_paint import LD_SKY, render_paint

        frame = cam.build_seg_frame(
            level, cfg, px, py, angle, floor_height, sector_light,
            timestamp,
        )
        frame = jax.lax.optimization_barrier(frame)
        order = cam.seg_order(level, cam.traversal_rank(level, px, py))
        out = render_paint(
            level, cfg, frame, order, angle, px, py, floor_height
        )
        ipack, item_aux = things.item_pack(
            level, cfg, frame, order, px, py, angle, floor_height,
            sector_light, mobj_state,
        )
        if ipack is None:
            # carry live_dropped too: render_paint ran with a possible
            # paint_live_capacity even on an item-less level, and
            # engine.render_counters defaults missing keys to 0 — an
            # undersized cap must not pass the exactness check silently
            return out["idx"], out["rgb"], dict(
                item_aux, overflow=out["overflow"],
                live_dropped=out["live_dropped"],
            )
        idx, ld, rgb = item_pass(level, cfg, ipack, out["raw"])
        aux = {
            "frame": frame, "order": order,
            "overflow": out["overflow"],
            "live_dropped": out["live_dropped"],
            "light": (ld >> 16) & 0xFF,
            "dist": ((ld & 0xFFFF) << 16) >> 16,
            "is_sky": (ld & LD_SKY) != 0,
        }
        aux.update(item_aux)
        return idx, rgb, aux
    if paint_available(level, cfg, B):
        idx, light, dist, is_sky, rgb, aux = _stages_paint(
            level, cfg, px, py, angle, floor_height, sector_light,
            timestamp, reuse=reuse, want_reuse=want_reuse,
        )
        pools = things.pools_from_paint(aux)
        idx2, light2, dist2, is_sky, daux = things.deferred_pass(
            level, cfg, aux["frame"], pools, aux["order"],
            px, py, angle, floor_height, sector_light, mobj_state,
            idx, light, dist, is_sky, rgb=rgb,
            item_kernel=level.items_ok,
        )
        rgb2 = daux.pop("rgb")
        aux.update(daux)
        return idx2, rgb2, aux

    idx, light, dist, is_sky, aux = _stages_1_2(
        level, cfg, px, py, angle, floor_height, sector_light, timestamp
    )
    idx2, light2, dist2, is_sky, daux = things.deferred_pass(
        level, cfg, aux["frame"],
        things.pools_from_unified(aux["pool"], aux["cnt"]), aux["order"],
        px, py, angle, floor_height, sector_light, mobj_state,
        idx, light, dist, is_sky,
    )
    aux.update(daux)
    rgb = res.shade(level, idx2, light2, dist2, is_sky)
    return idx2, rgb, aux
