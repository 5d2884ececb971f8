"""Auto-capacity calibration: derive pool capacities from a census.

The renderer trades dynamic data structures for fixed-capacity pools +
drop counters (SURVEY §7 "variable-size data on fixed-shape hardware").
Undersized pools drop work — wrong pixels — so every capacity must ride
above the workload's true peak.  Hand-tuned constants are fragile (the
round-3 audit found every pre-audit bench number silently clipped
columns) and pose-set-dependent (a B=32 run trips a cap censused at
B=2048).  This module measures the peaks on the ACTUAL workload:

    cfg = calibrated_config(engine, states)

censuses, over the provided GameStates (e.g. exactly the states a
benchmark will render):

  span pool peak              -> span_capacity
  wall+mid clip-span peak     -> clip_capacity (sprites clip against these)
  mid-span peak               -> mid_capacity
  item presence peak          -> item_capacity
  valid item count peak       -> max_visible_mobjs
  per-(tile, block) live-seg peaks (union + per-camera)
                              -> paint_live_capacity

and returns a copy of engine.config with those capacities set.
Pool capacities round UP to the next multiple of 8 and the live cap to
the next multiple of 32 (the paint kernel's U*GSUB granularity), so the
shipped numbers carry one quantum of headroom and nothing else.  The
census itself runs UNCAPPED: the span census pool is grown and re-run
until its own overflow counter is zero.

Cost note: the census uses the XLA scan pipeline (backend-agnostic,
bit-identical pools to the paint kernel's by the pipeline-equivalence
tests).  Geometry-dependent censuses (spans, live lists) run only for
states whose camera poses differ from the previous state's; the
item census (the only part mobj animation changes) runs per state and
is [B, MO]-cheap.

Kernel-side count sources this mirrors (cited so drift is auditable):
- clip/mid emission masks: ops/pallas_paint.py emit_clip/emit_mid call
  sites == render/walls.py KIND_WALL/KIND_MID span emissions.
- live-list predicate: ops/pallas_paint.py render_paint's
  `live_s = act_o & overlap_s` compaction.
- item presence: render/things.py deferred_pass `rc[:, 0, :]` with
  max_visible_mobjs / item_capacity uncapped (things.item_census).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from doomtpu.config import RenderConfig
from doomtpu.render import camera as cam
from doomtpu.render import things, walls
from doomtpu.render.jmath import I32, as_i16

LANES = 128

# bump when the census logic changes (invalidates every cache entry)
_CACHE_VERSION = 1

# config fields that change the census RESULT (not just its speed):
# chunking/tiling, the sort permutation, which live peak is selected,
# whether the block-item peak is substituted, and the screen shape
_KEY_FIELDS = (
    "width", "height", "render_chunk", "camera_sort",
    "paint_percam_compact",
)
# the capacity fields a cache entry stores / re-applies
_OUT_FIELDS = (
    "span_capacity", "mid_capacity", "clip_capacity", "item_capacity",
    "max_visible_mobjs", "item_block_capacity", "paint_live_capacity",
)


def _cache_key(engine, states, margin_q) -> str:
    """sha256 over everything the census output depends on: the WAD
    bytes + map name, the key config fields, and the exact state arrays
    (poses drive geometry censuses; mobj_state drives the item census;
    sector_light/timestamp ride along for safety — hashing is ~ms)."""
    cfg = engine.config
    h = hashlib.sha256()
    h.update(f"v{_CACHE_VERSION};{engine.tables.name};".encode())
    h.update(np.ascontiguousarray(engine.wad.data).tobytes())
    h.update(json.dumps(
        [getattr(cfg, f) for f in _KEY_FIELDS]
        + [cfg.item_block_capacity > 0, list(margin_q)]
        # the Morton sort-key knobs change tile composition and
        # therefore the censused live/tile peaks — key them in so an
        # A/B sweep can never serve stale capacities
        + [os.environ.get("DOOMTPU_SORT_ABITS"),
           os.environ.get("DOOMTPU_SORT_FBITS")]
    ).encode())
    for st in states:
        for arr in (st.pos, st.angle, st.floor_height, st.mobj_state,
                    st.sector_light, st.timestamp):
            a = np.asarray(arr)
            h.update(str(a.shape).encode())
            h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()


def _cache_dir() -> str:
    return os.environ.get(
        "DOOMTPU_CALIB_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".calib_cache"),
    )


def _round_up(v: int, q: int) -> int:
    return max(q, ((int(v) + q - 1) // q) * q)


@partial(jax.jit, static_argnums=(0, 6))
def _geom_census(cfg, level, px, py, angle, floor_height, tile,
                 sector_light, timestamp):
    """Span/clip/mid pool peaks + live-list peaks for one pose chunk."""
    frame = cam.build_seg_frame(
        level, cfg, px, py, angle, floor_height, sector_light, timestamp
    )
    frame = jax.lax.optimization_barrier(frame)
    order = cam.seg_order(level, cam.traversal_rank(level, px, py))
    pool, cnt, overflow = walls.wall_scan(level, cfg, frame, order)
    spans = pool[0]
    K = spans.shape[2]
    k_ok = jnp.arange(K, dtype=I32)[None, None] < cnt[..., None]
    kind = (spans >> 29) & 3
    is_mid = k_ok & (kind == walls.KIND_MID)
    is_clip = is_mid | (k_ok & (kind == walls.KIND_WALL))

    # live-list census: exactly render_paint's compaction predicate
    B, G = order.shape
    NBW = (cfg.width + LANES - 1) // LANES
    pact = jnp.take_along_axis(frame["active"].any(-1), order, axis=1)
    x0 = jnp.take_along_axis(as_i16(frame["x0"]), order, axis=1)
    x1 = jnp.take_along_axis(as_i16(frame["x1"]), order, axis=1)
    wlo = jnp.arange(NBW, dtype=I32)[None, None] * LANES
    live = (
        pact[..., None] & (x0[..., None] < wlo + LANES)
        & (x1[..., None] >= wlo)
    )                                                   # [B, G, NBW]
    cnt_cam = live.sum(1)                               # [B, NBW]
    if B % tile == 0 and tile > 1:
        cnt_uni = live.reshape(B // tile, tile, G, NBW).any(1).sum(1)
    else:
        cnt_uni = cnt_cam
    return {
        "span": cnt.max(),
        "mid": is_mid.sum(2).max(),
        "clip": is_clip.sum(2).max(),
        "overflow": overflow.sum(),
        "live_cam": cnt_cam.max(),
        "live_union": cnt_uni.max(),
        # the item census needs the mid pool; returning it here reuses
        # the scan instead of re-running it per state
        "pool": pool,
        "cnt": cnt,
    }


@partial(jax.jit, static_argnums=(0, 11))
def _item_census(cfg, level, pool, cnt, px, py, angle, floor_height,
                 sector_light, timestamp, mobj_state, tile):
    frame = cam.build_seg_frame(
        level, cfg, px, py, angle, floor_height, sector_light, timestamp
    )
    pools = things.pools_from_unified(pool, cnt)
    out = things.item_census(
        level, cfg, frame, pools, px, py, angle, floor_height,
        sector_light, mobj_state, tile=tile,
    )
    return {
        "items": out["presence"].max(),
        "n_valid": out["n_valid"].max(),
        "items_block": out["presence_block"],
    }


def calibrated_config(engine, states, margin_q=(8, 32),
                      cache=True) -> RenderConfig:
    """Measure capacity peaks over `states` and return engine.config
    with span/mid/clip/item/max_visible_mobjs/paint_live_capacity set.

    `states`: a GameState or list of them — the exact states the caller
    will render (include ticked states if the workload ticks).
    `margin_q`: (pool, live-cap) round-up quanta.
    `cache`: the census is a pure function of (WAD, map, key config
    fields, states) but costs ~105 s through the relay per bench start;
    results are cached on disk keyed by a sha256 of those inputs
    (DOOMTPU_CALIB_CACHE overrides the location, =0 disables).
    """
    if not isinstance(states, (list, tuple)):
        states = [states]
    cdir = _cache_dir()
    use_cache = cache and cdir != "0"
    if use_cache:
        key = _cache_key(engine, states, margin_q)
        path = os.path.join(cdir, key + ".json")
        try:
            with open(path) as f:
                entry = json.load(f)
            return dataclasses.replace(
                engine.config,
                **{f: int(entry[f]) for f in _OUT_FIELDS},
            )
        except (OSError, KeyError, ValueError):
            pass
    cfg = engine.config
    level = engine.level
    B = states[0].pos.shape[0]
    C = cfg.render_chunk
    chunked = B > C and B % C == 0
    tile = 8 if B % 8 == 0 else (4 if B % 4 == 0 else 1)
    if chunked:
        tile = 8 if C % 8 == 0 else (4 if C % 4 == 0 else 1)

    from doomtpu.engine import _camera_sort_perm

    peaks = {k: 0 for k in
             ("span", "mid", "clip", "live_cam", "live_union",
              "items", "n_valid", "items_block")}
    span_cap = _round_up(max(cfg.span_capacity, 64), 8)
    while True:
        ccfg = dataclasses.replace(
            cfg, span_capacity=span_cap, max_visible_mobjs=0,
            use_pallas_scan=False, use_pallas_paint=False,
            use_item_pass_kernel=False, paint_live_capacity=0,
        )
        overflow = 0
        prev_pose = None
        geo = None
        geos = {}
        for state in states:
            perm = None
            if cfg.camera_sort and B > 8:
                perm = _camera_sort_perm(state)
                state = jax.tree_util.tree_map(lambda x: x[perm], state)
            pose = (np.asarray(state.pos), np.asarray(state.angle),
                    np.asarray(state.floor_height))
            pose_changed = prev_pose is None or not all(
                np.array_equal(a, b) for a, b in zip(pose, prev_pose)
            )
            prev_pose = pose
            n_chunks = B // C if chunked else 1
            for ci in range(n_chunks):
                sl = (
                    jax.tree_util.tree_map(
                        lambda a: a[ci * C:(ci + 1) * C], state
                    )
                    if chunked else state
                )
                if pose_changed or ci not in geos:
                    geo = _geom_census(
                        ccfg, level, sl.pos[:, 0], sl.pos[:, 1], sl.angle,
                        sl.floor_height, tile, sl.sector_light,
                        sl.timestamp,
                    )
                    geos[ci] = (geo["pool"], geo["cnt"])
                    for k in ("span", "mid", "clip",
                              "live_cam", "live_union"):
                        peaks[k] = max(peaks[k], int(np.asarray(geo[k])))
                    overflow += int(np.asarray(geo["overflow"]))
                pool, cnt = geos[ci]
                it = _item_census(
                    ccfg, level, pool, cnt, sl.pos[:, 0], sl.pos[:, 1],
                    sl.angle, sl.floor_height, sl.sector_light,
                    sl.timestamp, sl.mobj_state, tile,
                )
                for k in ("items", "n_valid", "items_block"):
                    peaks[k] = max(peaks[k], int(np.asarray(it[k])))
        if overflow == 0:
            break
        span_cap *= 2          # census pool itself clipped: grow + rerun
        peaks = {k: 0 for k in peaks}

    pq, lq = margin_q
    live_peak = (
        peaks["live_cam"] if cfg.paint_percam_compact
        else peaks["live_union"]
    )
    out = dataclasses.replace(
        cfg,
        span_capacity=_round_up(peaks["span"], pq),
        mid_capacity=_round_up(peaks["mid"], pq),
        clip_capacity=_round_up(peaks["clip"], pq),
        item_capacity=_round_up(peaks["items"], pq),
        max_visible_mobjs=_round_up(peaks["n_valid"], 32),
        # block-local item emission (things.deferred_pass) measured a
        # LOSS on v5e (sweep #10 ladder: cut-3 36.4 ms vs 20.25 dense —
        # the mid-liveness scatter + the [NB, LAN, KMID] mid-presence
        # compare outweigh the N->NB operand shrink).  Keep it opt-in:
        # calibrate leaves it at the caller's value; the census peak is
        # still measured and only substituted when the caller asked for
        # the block path with a nonzero placeholder capacity.
        item_block_capacity=(
            _round_up(peaks["items_block"], pq)
            if cfg.item_block_capacity > 0 else 0
        ),
        # +1 forces a full quantum of headroom even at exact multiples
        paint_live_capacity=_round_up(live_peak + 1, lq),
    )
    if use_cache:
        try:
            os.makedirs(cdir, exist_ok=True)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(
                    {f: getattr(out, f) for f in _OUT_FIELDS}
                    | {"peaks": peaks}, f,
                )
            os.replace(tmp, path)
        except OSError:
            pass
    return out
