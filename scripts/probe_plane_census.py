#!/usr/bin/env python
"""Census for the deferred-plane-sampling roadmap (PERF.md round 4).

The paint kernel's plane stage is its single biggest body cost
(~23.6 ms/chunk, PAINT_SKIP ladder): every floor/ceiling span emission
pays the inverse projection + the per-pixel 2D flat gather, and spans
OVERDRAW as occlusion tightens.  Deferring flat sampling to the finish
pass trades `overdraw x per-row work` for `1 x KF x per-pixel work`,
where KF = distinct flats the finish must loop over per (camera tile,
128-column block).  This probe measures both factors from the span
pool at bench-style poses (CPU, no TPU needed):

  - painted plane rows (sum of emitted floor/ceil span lengths)
  - final plane pixels (union coverage: planes always beat walls in
    the composite, so any covered pixel is final)
  - overdraw = painted / final, split sky vs flat
  - distinct non-sky flat ids per (tile, block) over emitted spans
    (sky needs no flat gather in the finish), and per (tile, block,
    8-row y-block) -- the granularity a finish-pass flat loop pays

Env: B (chunk size, default 256), NP (pose census pool, default 2048),
LEVEL=demo|e1m1.
"""
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    B = int(os.environ.get("B", 256))
    NP = int(os.environ.get("NP", 2048))
    level_name = os.environ.get("LEVEL", "e1m1")
    from doomtpu.config import RenderConfig
    from doomtpu.engine import DoomEngine, _camera_sort_perm
    from doomtpu.render import camera as cam
    from doomtpu.render.walls import KIND_CEIL, KIND_FLOOR, wall_scan
    from doomtpu.wad import synth

    cfg = RenderConfig(span_capacity=64)
    wad = synth.demo_wad() if level_name == "demo" else synth.e1m1_scale_wad()
    eng = DoomEngine.from_wad_bytes(wad, "e1m1", config=cfg)
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
    c0 = (NP // B // 2) * B
    state = jax.tree_util.tree_map(lambda x: x[c0:c0 + B], state)

    @jax.jit
    def pools(lv, x, y, an, f, s_l, ts):
        frame = cam.build_seg_frame(lv, cfg, x, y, an, f, s_l, ts)
        rank = cam.traversal_rank(lv, x, y)
        order = cam.seg_order(lv, rank)
        pool, cnt, overflow = wall_scan(lv, cfg, frame, order)
        return pool, cnt, overflow

    (spans, planes), cnt, overflow = jax.device_get(
        pools(
            level, state.pos[:, 0], state.pos[:, 1], state.angle,
            state.floor_height, state.sector_light, state.timestamp,
        )
    )
    assert int(np.asarray(overflow).sum()) == 0, "span pool overflow"
    d1 = planes[0]                                       # [B, W, K]
    W, H = cfg.width, cfg.height
    K = spans.shape[-1]
    slot_live = np.arange(K)[None, None, :] < cnt[..., None]
    kind = (spans >> 29) & 3
    y0 = ((spans >> 8) & 255) - 1
    y1 = (spans & 255) - 1
    is_plane = slot_live & ((kind == KIND_FLOOR) | (kind == KIND_CEIL))
    is_sky = (d1 >> 21) & 1
    flat_id = (d1 >> 8) & 0x1FFF
    rows = np.maximum(y1 - y0 + 1, 0)

    painted_flat = int(rows[is_plane & (is_sky == 0)].sum())
    painted_sky = int(rows[is_plane & (is_sky == 1)].sum())

    # final coverage union per column (plane beats wall in composite)
    yy = np.arange(H)[None, None, :]
    acc_flat = np.zeros((B, W, H), bool)
    acc_sky = np.zeros((B, W, H), bool)
    for k in range(K):
        cover = (
            is_plane[:, :, k, None]
            & (yy >= y0[:, :, k, None]) & (yy <= y1[:, :, k, None])
        )
        sk = (is_sky[:, :, k] == 1)[:, :, None]
        acc_flat |= cover & ~sk
        acc_sky |= cover & sk
    final_flat = int(acc_flat.sum())
    final_sky = int(acc_sky.sum())

    print(f"B={B} chunk at bench-style sorted poses, level={level_name}")
    print(f"flat spans: painted rows {painted_flat}  final px {final_flat}"
          f"  overdraw {painted_flat / max(final_flat, 1):.2f}x")
    print(f"sky  spans: painted rows {painted_sky}  final px {final_sky}"
          f"  overdraw {painted_sky / max(final_sky, 1):.2f}x")
    tot_px = B * W * H
    print(f"plane share of frame: "
          f"{(final_flat + final_sky) / tot_px * 100:.1f}%")

    # KF census: distinct non-sky flats per (tile of 8 cams, 128-block)
    TB, LANES = 8, 128
    NBW = (W + LANES - 1) // LANES
    Bt = B // TB
    fl_t = flat_id.reshape(Bt, TB, W, K)
    pl_t = (is_plane & (is_sky == 0)).reshape(Bt, TB, W, K)
    yb0 = y0.reshape(Bt, TB, W, K)
    yb1 = y1.reshape(Bt, TB, W, K)
    kf_block = np.zeros((Bt, NBW), np.int32)
    kf_yblock_max = 0
    kf_yblock_sum = 0
    kf_yblock_n = 0
    for bt in range(Bt):
        for w in range(NBW):
            xs = slice(w * LANES, min((w + 1) * LANES, W))
            m = pl_t[bt, :, xs]
            ids = fl_t[bt, :, xs][m]
            kf_block[bt, w] = len(np.unique(ids))
            # per-8-row y-block distinct count (finish-pass granularity)
            for ybl in range(H // 8):
                lo, hi = ybl * 8, ybl * 8 + 7
                my = m & (yb1[bt, :, xs] >= lo) & (yb0[bt, :, xs] <= hi)
                n = len(np.unique(fl_t[bt, :, xs][my]))
                kf_yblock_max = max(kf_yblock_max, n)
                kf_yblock_sum += n
                kf_yblock_n += 1
    print(f"KF per (tile, 128-block): max {int(kf_block.max())} "
          f"mean {kf_block.mean():.2f} "
          f"p99 {int(np.percentile(kf_block, 99))}")
    print(f"KF per (tile, block, 8-row y-block): max {kf_yblock_max} "
          f"mean {kf_yblock_sum / max(kf_yblock_n, 1):.2f}")

    # ---- emission footprint census -----------------------------------
    # The kernel's per-emission y-loop runs the UNION y-block range over
    # the whole (tile, 128-block) vreg (_ybounds), doing TB x 8 x 128
    # pixels of work per y-block.  Measure processed vs painted pixels
    # per emission = (tile, block, seg, kind) group of spans.
    g_id = planes[5]                                     # [B, W, K] seg id
    bt_ix = (np.arange(B)[:, None, None] // TB)
    blk_ix = (np.arange(W)[None, :, None] // LANES)

    def footprint(mask, label):
        if not mask.any():
            print(f"{label}: no spans")
            return
        key = (
            (bt_ix * NBW + blk_ix) * (int(g_id.max()) + 1) + g_id
        ) * 4 + kind
        keys = key[mask]
        uk, inv = np.unique(keys, return_inverse=True)
        lo = np.full(len(uk), 10 ** 9)
        hi = np.full(len(uk), -1)
        np.minimum.at(lo, inv, np.maximum(y0[mask], 0) // 8)
        np.maximum.at(hi, inv, np.minimum(y1[mask], H - 1) // 8)
        yblocks = np.maximum(hi - lo + 1, 0)
        processed = int(yblocks.sum()) * TB * 8 * LANES
        painted = int(rows[mask].sum())
        print(f"{label}: {len(uk)} emissions, "
              f"{yblocks.sum()} union y-blocks "
              f"(mean {yblocks.mean():.1f}/emission), processed px "
              f"{processed / 1e6:.1f}M vs painted {painted / 1e6:.1f}M "
              f"= {processed / max(painted, 1):.1f}x quantization")

    footprint(is_plane, "planes")
    wall_mask = slot_live & (kind == 0) & (spans >= 0)   # drawable walls
    footprint(wall_mask, "walls")

    # split the quantization: per-CAMERA footprints (what per-camera
    # yb bounds could reach, keeping 128-lane vregs) vs the tile union
    def footprint_percam(mask, label):
        key = (
            ((np.arange(B)[:, None, None] * NBW + blk_ix)
             * (int(g_id.max()) + 1) + g_id) * 4 + kind
        )
        keys = key[mask]
        uk, inv = np.unique(keys, return_inverse=True)
        lo = np.full(len(uk), 10 ** 9)
        hi = np.full(len(uk), -1)
        np.minimum.at(lo, inv, np.maximum(y0[mask], 0) // 8)
        np.maximum.at(hi, inv, np.minimum(y1[mask], H - 1) // 8)
        yblocks = np.maximum(hi - lo + 1, 0)
        processed = int(yblocks.sum()) * 8 * LANES
        painted = int(rows[mask].sum())
        print(f"{label} per-camera bounds: processed px "
              f"{processed / 1e6:.1f}M vs painted {painted / 1e6:.1f}M "
              f"= {processed / max(painted, 1):.1f}x quantization")

    footprint_percam(is_plane, "planes")
    footprint_percam(wall_mask, "walls")


if __name__ == "__main__":
    main()
