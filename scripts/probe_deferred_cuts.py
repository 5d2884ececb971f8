#!/usr/bin/env python
"""Attribute deferred_pass cost by stage on TPU (bench spread poses).

Times things.deferred_pass (item_kernel=True, the bench default) with
the _DEFER_ONLY early-return cuts monkeypatched between traces:

  cut 4  presence [B,N,W] + slot cumsum
  cut 1  + one-hot emission fold ([B,W,N,KI] operand + MXU contraction)
  cut 2  + per-slot sprite math ([B,W,KI])
  cut 3  + mid-pool slot fill
  full   + composite kernel (ops/pallas_items.py)

Deltas between consecutive rows attribute the stage costs.  Poses are
the bench's spread poses (Morton-sorted interior chunk of NP=2048).
Env: B (default 256), NP (default 2048).
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    B = int(os.environ.get("B", 256))
    NP = int(os.environ.get("NP", 2048))
    from doomtpu.config import RenderConfig
    from doomtpu.engine import DoomEngine, _camera_sort_perm
    from doomtpu.render import camera as cam, things
    from doomtpu.wad import synth

    # honest bench capacities (probe_bench_capacities 2026-08-19)
    cfg = RenderConfig(
        span_capacity=48, max_visible_mobjs=320,
        mid_capacity=int(os.environ.get("KM", 16)),
        clip_capacity=int(os.environ.get("KC", 56)),
        item_capacity=int(os.environ.get("KI", 24)),
        # block-local emission; census max at bench poses is 20 ->
        # KIB=24 carries a quantum of headroom.  0 = dense path.
        item_block_capacity=int(os.environ.get("KIB", 0)),
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
    if NP > B:
        c0 = (NP // B // 2) * B
        state = jax.tree_util.tree_map(lambda x: x[c0:c0 + B], state)
    px, py = state.pos[:, 0], state.pos[:, 1]
    ang, fh = state.angle, state.floor_height
    sl, ts = state.sector_light, state.timestamp
    ms = state.mobj_state
    print(f"B={B} G={level.num_segs} MO={level.num_mobjs}", flush=True)

    from doomtpu.ops.pallas_paint import render_paint

    def fetch(x):
        return int(np.asarray(x.sum()))

    @jax.jit
    def paint(lv, x, y, a, f, s_l, t_s):
        frame = cam.build_seg_frame(lv, cfg, x, y, a, f, s_l, t_s)
        frame = jax.lax.optimization_barrier(frame)
        order = cam.seg_order(lv, cam.traversal_rank(lv, x, y))
        out = render_paint(lv, cfg, frame, order, a, x, y, f)
        return frame, order, out

    t0 = time.time()
    frame, order, out = paint(level, px, py, ang, fh, sl, ts)
    fetch(out["idx"])
    print(f"paint ready ({time.time() - t0:.0f}s)", flush=True)
    ld = out["ld"]
    args0 = (
        out["idx"], (ld >> 16) & 0xFF, ((ld & 0xFFFF) << 16) >> 16,
        (ld & (1 << 25)) != 0, out["rgb"],
    )
    clip, midp = things.pools_from_paint(out)
    flat = (clip["span"], clip["d2"], clip["d6"], clip["cnt"],
            clip["lsx"], clip["lsy"], clip["lex"], clip["ley"],
            midp["span"], midp["d1"], midp["d2"], midp["d3"],
            midp["d4"], midp["d5"], midp["d6"], midp["cnt"])

    def run(name, cut, n=4, items_inputonly=False):
        from doomtpu.ops import pallas_items

        things._DEFER_ONLY = cut
        pallas_items._ITEMS_INPUTONLY = items_inputonly

        def fn(lv, fr, o, x, y, an, f_h, s_l, m_s, i, l, d, s, rgb, *pf):
            pools = (
                {"span": pf[0], "d2": pf[1], "d6": pf[2], "cnt": pf[3],
                 "lsx": pf[4], "lsy": pf[5], "lex": pf[6], "ley": pf[7]},
                {"span": pf[8], "d1": pf[9], "d2": pf[10], "d3": pf[11],
                 "d4": pf[12], "d5": pf[13], "d6": pf[14], "cnt": pf[15]},
            )
            return things.deferred_pass(
                lv, cfg, fr, pools, o, x, y, an, f_h, s_l, m_s,
                i, l, d, s, rgb=rgb, item_kernel=True,
            )[0]

        f = jax.jit(fn)
        t0 = time.time()
        r = f(level, frame, order, px, py, ang, fh, sl, ms, *args0, *flat)
        fetch(r)
        comp = time.time() - t0
        t0 = time.time()
        for _ in range(n):
            r = f(level, frame, order, px, py, ang, fh, sl, ms,
                  *args0, *flat)
        fetch(r)
        dt = (time.time() - t0) / n
        print(f"{name:40s} {dt * 1000:8.2f} ms  (compile {comp:.0f}s)",
              flush=True)
        things._DEFER_ONLY = 0
        pallas_items._ITEMS_INPUTONLY = False

    if os.environ.get("FINE", "0") != "0":
        # sub-decomposition of cut 4 (sweep #11: 16.75 ms — where?)
        run("cut 10: selection only", 10)
        run("cut 9: sprite presence only", 9)
        run("cut 7: + mid presence (full pres)", 7)
        run("cut 8: + reverse cumsum", 8)
    run("cut 4: presence + slot cumsum", 4)
    run("cut 1: + one-hot emission fold", 1)
    run("cut 2: + per-slot sprite math", 2)
    run("cut 3: + mid slot fill", 3)
    run("cut 5a: + pregather slice-gather only", 0, items_inputonly=2)
    run("cut 5: + item-kernel input pregather", 0, items_inputonly=True)
    run("full deferred (+ composite kernel)", 0)


if __name__ == "__main__":
    main()
