#!/usr/bin/env python
"""Quantify the early-exit opportunity in the paint kernel's seg loop.

For each (camera tile, 128-column block), the kernel visits every
compacted live seg.  But once the occlusion state hor is all-ones over
the tile's columns of the block, every later seg's body is a provable
no-op (open_ = covered & ~hor is false everywhere, and the p==0
hor/fo/co updates are idempotent on closed columns).  This probe runs
the XLA scan eagerly on CPU, records hor after each ordered seg, and
reports how many live-seg visits an in-kernel early exit would skip at
several check granularities (per U=4 sub-step / per U*GSUB=32 grid
step).

Env: B (default 64), LEVEL (e1m1|demo), SORT=0 to disable camera sort.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    B = int(os.environ.get("B", 64))
    level_name = os.environ.get("LEVEL", "e1m1")
    from doomtpu.config import RenderConfig
    from doomtpu.engine import DoomEngine, _camera_sort_perm
    from doomtpu.render import camera as cam, walls
    from doomtpu.render.jmath import as_i16
    from doomtpu.wad import synth

    cfg = RenderConfig(span_capacity=48)
    wad = synth.demo_wad() if level_name == "demo" else synth.e1m1_scale_wad()
    eng = DoomEngine.from_wad_bytes(wad, "e1m1", config=cfg)
    level = eng.level
    state = eng.new_game(B, key=jax.random.PRNGKey(0))
    if os.environ.get("SORT", "1") != "0":
        perm = _camera_sort_perm(state)
        state = jax.tree_util.tree_map(lambda x: x[perm], state)
    px, py = state.pos[:, 0], state.pos[:, 1]
    ang, fh = state.angle, state.floor_height
    sl, ts = state.sector_light, state.timestamp

    frame = cam.build_seg_frame(level, cfg, px, py, ang, fh, sl, ts)
    rank = cam.traversal_rank(level, px, py)
    order = cam.seg_order(level, rank)

    G = level.num_segs
    W, H = cfg.width, cfg.height
    TB = 8
    LANES = 128
    NBW = (W + LANES - 1) // LANES
    Bt = B // TB

    # liveness exactly as render_paint computes it (flags&15 != 0 + block
    # x-overlap, any camera of the tile)
    active = np.asarray(frame["active"])                     # [B, G, 4]
    act = active.any(-1)
    act_o = np.take_along_axis(act, np.asarray(order), axis=1)  # [B, G]
    x0i = np.asarray(as_i16(frame["x0"]))
    x1i = np.asarray(as_i16(frame["x1"]))
    x0o = np.take_along_axis(x0i, np.asarray(order), axis=1)
    x1o = np.take_along_axis(x1i, np.asarray(order), axis=1)
    wlo = np.arange(NBW)[None, None] * LANES
    overlap = (x0o[..., None] < wlo + LANES) & (x1o[..., None] >= wlo)
    live = (act_o[..., None] & overlap).reshape(Bt, TB, G, NBW).any(1)
    live = np.swapaxes(live, 1, 2)                           # [Bt, NBW, G]

    # eager scan recording hor after each ordered seg
    hor_hist = np.zeros((G, B, W), bool)

    def hook(i, seg_i, st):
        hor_hist[i] = np.asarray(st[0])

    walls.wall_scan(level, cfg, frame, order, debug_hook=hook)

    # closure step per (tile, block): first ordered index i with hor all
    # true over the tile's cameras and block columns
    Wp = NBW * LANES
    hh = np.pad(hor_hist, ((0, 0), (0, 0), (0, Wp - W)), constant_values=True)
    hh = hh.reshape(G, Bt, TB, NBW, LANES).all(axis=(2, 4))  # [G, Bt, NBW]
    closed = np.moveaxis(hh, 0, -1)                          # [Bt, NBW, G]
    never = ~closed[..., -1]
    first_closed = np.where(
        never, G, closed.argmax(-1)
    )                                                        # [Bt, NBW]

    total = live.sum()
    # visits with exit checked after every live seg (ideal)
    li = np.cumsum(live, axis=-1)                            # live rank
    # a live seg at ordered index i is visited iff i <= first_closed
    # (the seg AT closure must be processed; later ones are skipped)
    ideal = (live & (np.arange(G)[None, None] <= first_closed[..., None])
             ).sum()

    # granular: the kernel checks once per CHK live segs (checks cost a
    # reduction); visited = ceil-up to the check boundary
    def gran(chk):
        lived = live & (np.arange(G)[None, None] <= first_closed[..., None])
        n = lived.sum(-1)                                    # [Bt, NBW]
        return np.minimum(np.ceil(n / chk) * chk, live.sum(-1)).sum()

    print(f"B={B} level={level_name} tiles={Bt} blocks={NBW} G={G}")
    print(f"live-seg visits (now):           {int(total)}")
    print(f"visits w/ per-seg exit (ideal):  {int(ideal)}  "
          f"({100.0 * ideal / total:.1f}%)")
    for chk in (4, 8, 16, 32):
        v = gran(chk)
        print(f"visits w/ exit every {chk:2d} live:   {int(v)}  "
              f"({100.0 * v / total:.1f}%)")
    nv = int(never.sum())
    print(f"(tile, block) units never fully occluded: {nv}/{Bt * NBW}")


if __name__ == "__main__":
    main()
