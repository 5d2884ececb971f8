#!/usr/bin/env python
"""Measure the TRUE pool capacities the bench workload needs (TPU).

Round-3 finding: bench.py's warmup assert (added 16bffaf) trips at the
bench poses — the mid/clip pools and the per-column item pool overflow
(wrong pixels the round-2 numbers silently shipped).  This probe runs
every 256-chunk of the NP-pose bench workload through the paint kernel
with OVERSIZED pools and reports the exact per-column peaks:

  cnt_mid / cnt_clip maxima  -> mid_capacity / clip_capacity
  item presence peak          -> item_capacity  (_DEFER_ONLY == 6 cut)
  per-(tile, block) union and per-camera live peaks -> paint caps

Env: NP (default 2048), B chunk (default 256), KM/KC probe sizes
(default 64/96).
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    B = int(os.environ.get("B", 256))
    NP = int(os.environ.get("NP", 2048))
    KM = int(os.environ.get("KM", 32))
    KC = int(os.environ.get("KC", 64))
    from doomtpu.config import RenderConfig
    from doomtpu.engine import DoomEngine, _camera_sort_perm
    from doomtpu.render import camera as cam, things
    from doomtpu.render.jmath import as_i16
    from doomtpu.ops.pallas_paint import render_paint
    from doomtpu.wad import synth

    cfg = RenderConfig(
        span_capacity=48, max_visible_mobjs=320,
        mid_capacity=KM, clip_capacity=KC,
        use_pallas_paint=True, use_pallas_scan=True,
    )
    eng = DoomEngine.from_wad_bytes(synth.e1m1_scale_wad(), "e1m1",
                                    config=cfg)
    level = eng.level
    t = eng.tables
    rng = np.random.default_rng(0)
    poses = []
    left, right, top, bottom = [float(v) for v in t.bbox]
    while len(poses) < NP:
        x = rng.uniform(left, right)
        y = rng.uniform(top, bottom)
        s = t.sector_at(x, y)
        if s >= 0 and t.sector_floor_h[s] < t.sector_ceil_h[s]:
            poses.append((x, y, rng.uniform(0, 2 * math.pi)))
    poses = np.asarray(poses, np.float32)
    state = eng.new_game(
        NP, pos=poses[:, :2], angle=poses[:, 2], key=jax.random.PRNGKey(0)
    )
    perm = _camera_sort_perm(state)
    state = jax.tree_util.tree_map(lambda x: x[perm], state)
    print(f"backend={jax.default_backend()} NP={NP} chunk={B} "
          f"probe KM={KM} KC={KC}", flush=True)

    things._DEFER_ONLY = 6          # deferred returns idx + presence max

    LANES = 128
    NBW = (cfg.width + LANES - 1) // LANES

    @jax.jit
    def chunk_stats(lv, x, y, an, f, s_l, t_s, m_s):
        frame = cam.build_seg_frame(lv, cfg, x, y, an, f, s_l, t_s)
        frame = jax.lax.optimization_barrier(frame)
        order = cam.seg_order(lv, cam.traversal_rank(lv, x, y))
        out = render_paint(lv, cfg, frame, order, an, x, y, f)
        ld = out["ld"]
        light = (ld >> 16) & 0xFF
        dist = ((ld & 0xFFFF) << 16) >> 16
        is_sky = (ld & (1 << 25)) != 0
        clip, midp = things.pools_from_paint(out)
        r, *_ = things.deferred_pass(
            lv, cfg, frame, (clip, midp), order, x, y, an, f, s_l, m_s,
            out["idx"], light, dist, is_sky, rgb=out["rgb"],
        )
        item_peak = (r - out["idx"]).max()
        # live-count census (same math as render_paint's compaction)
        pact = jnp.take_along_axis(
            frame["active"].any(-1), order, axis=1
        )
        x0 = jnp.take_along_axis(as_i16(frame["x0"]), order, axis=1)
        x1 = jnp.take_along_axis(as_i16(frame["x1"]), order, axis=1)
        wlo = jnp.arange(NBW, dtype=jnp.int32)[None, None] * LANES
        live = (
            pact[..., None] & (x0[..., None] < wlo + LANES)
            & (x1[..., None] >= wlo)
        )                                               # [B, G, NBW]
        cnt_cam = live.sum(1)                           # [B, NBW]
        cnt_uni = live.reshape(B // 8, 8, -1, NBW).any(1).sum(1)
        return (
            out["cnt_mid"].max(), out["cnt_clip"].max(),
            out["overflow"].max(), item_peak,
            cnt_cam.max(), cnt_uni.max(),
        )

    peaks = np.zeros(6, np.int64)
    t0 = time.time()
    for c in range(NP // B):
        sl = jax.tree_util.tree_map(
            lambda a: a[c * B:(c + 1) * B], state
        )
        vals = chunk_stats(
            level, sl.pos[:, 0], sl.pos[:, 1], sl.angle,
            sl.floor_height, sl.sector_light, sl.timestamp,
            sl.mobj_state,
        )
        vals = [int(np.asarray(v)) for v in vals]
        peaks = np.maximum(peaks, vals)
        if c == 0:
            print(f"compile {time.time() - t0:.0f}s", flush=True)
    names = ("cnt_mid", "cnt_clip", "pool_overflow(must be 0)",
             "item_presence", "live_per_camera", "live_union_tile")
    for n, v in zip(names, peaks):
        print(f"{n:28s} {v}", flush=True)
    things._DEFER_ONLY = 0


if __name__ == "__main__":
    main()
