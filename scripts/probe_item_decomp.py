#!/usr/bin/env python
"""Decompose the NON-paint side of a full-frame chunk on TPU.

The 2026-08-18 sweep pinned the paint call at ~65 ms per 256-camera
chunk but left the remaining ~94 ms (deferred items + resolve + pack)
unattributed.  This probe times, at B=256 on the e1m1-scale fixture:

  1. paint call alone (camera + input build + kernel)     [~65 ms ref]
  2. item_pack alone (selection + scalar packs, [B, N])
  3. deferred_pass item_kernel=True given paint outputs
  4. deferred_pass with max_visible_mobjs=16 (N-scaling)
  5. the full render chunk (engine one(state) body)

(3) - (2)'s select share attributes the [B, N, W] column stages +
emission + composite; (5) - (1) - (3) is the leftover glue.

Env: B (default 256).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    B = int(os.environ.get("B", 256))
    from doomtpu.config import RenderConfig
    from doomtpu.engine import DoomEngine, _camera_sort_perm
    from doomtpu.render import camera as cam, things
    from doomtpu.render.frame import render_frame
    from doomtpu.wad import synth

    cfg = RenderConfig(
        span_capacity=48, max_visible_mobjs=320,
        use_pallas_paint=True, use_pallas_scan=True,
    )
    eng = DoomEngine.from_wad_bytes(synth.e1m1_scale_wad(), "e1m1",
                                    config=cfg)
    level = eng.level
    # bench-style poses: random spread over the map (new_game puts ALL
    # cameras at the Player1Start — a degenerate best case where tiles
    # share identical live lists and sprite rotations; bench.py's
    # spread poses are the honest workload)
    import math

    t = eng.tables
    rng = np.random.default_rng(0)
    poses = []
    left, right, top, bottom = [float(v) for v in t.bbox]
    # NP > B reproduces a bench chunk honestly: generate NP poses
    # (bench.py uses 2048), Morton-sort them ALL, then take one
    # interior B-sized chunk — the tile coherence the bench's chunks
    # actually see (sorting only B spread poses leaves each 8-camera
    # tile far more divergent than a 2048-sort does)
    NP = int(os.environ.get("NP", B))
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
    # bench-like poses: sorted cameras (the bench's _render_jit sorts)
    perm = _camera_sort_perm(state)
    state = jax.tree_util.tree_map(lambda x: x[perm], state)
    if NP > B:
        c0 = (NP // B // 2) * B
        state = jax.tree_util.tree_map(lambda x: x[c0:c0 + B], state)
    px, py = state.pos[:, 0], state.pos[:, 1]
    ang, fh = state.angle, state.floor_height
    sl, ts = state.sector_light, state.timestamp
    ms = state.mobj_state
    print(f"B={B} G={level.num_segs} MO={level.num_mobjs} "
          f"D={level.dseg_ix.shape[0]}", flush=True)

    from doomtpu.ops.pallas_paint import render_paint

    def fetch(x):
        return int(np.asarray(x.sum()))

    def timeit(name, f, *args, n=4):
        t0 = time.time()
        r = f(*args)
        fetch(jax.tree_util.tree_leaves(r)[0])
        comp = time.time() - t0
        t0 = time.time()
        for _ in range(n):
            r = f(*args)
        fetch(jax.tree_util.tree_leaves(r)[0])
        dt = (time.time() - t0) / n
        print(f"{name:44s} {dt * 1000:8.2f} ms  (compile {comp:.0f}s)",
              flush=True)
        return r

    START = int(os.environ.get("START", 1))

    # ---- 1. paint call alone -------------------------------------------
    @jax.jit
    def paint(lv, x, y, a, f, s_l, t_s):
        frame = cam.build_seg_frame(lv, cfg, x, y, a, f, s_l, t_s)
        frame = jax.lax.optimization_barrier(frame)
        order = cam.seg_order(lv, cam.traversal_rank(lv, x, y))
        out = render_paint(lv, cfg, frame, order, a, x, y, f)
        return frame, order, out

    if START <= 4:
        frame, order, out = timeit(
            "1. paint (camera+input+kernel)", paint, level, px, py, ang,
            fh, sl, ts)

    # ---- 2. item_pack alone --------------------------------------------
    @jax.jit
    def pack_only(lv, fr, o, x, y, a, f, s_l, m_s):
        p, aux = things.item_pack(lv, cfg, fr, o, x, y, a, f, s_l, m_s)
        return p["i"], p["f"], aux["items_dropped"]

    if START <= 4:
        timeit("2. item_pack (select + scalar packs)", pack_only,
               level, frame, order, px, py, ang, fh, sl, ms)

    # ---- 3./4. deferred pass given paint outputs ------------------------
    if START > 4:
        ld = args0 = flat = None
    else:
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

    def make_deferred(c):
        def fn(lv, fr, o, x, y, an, f_h, s_l, m_s, i, l, d, s, rgb,
               *pf):
            pools = (
                {"span": pf[0], "d2": pf[1], "d6": pf[2], "cnt": pf[3],
                 "lsx": pf[4], "lsy": pf[5], "lex": pf[6], "ley": pf[7]},
                {"span": pf[8], "d1": pf[9], "d2": pf[10], "d3": pf[11],
                 "d4": pf[12], "d5": pf[13], "d6": pf[14], "cnt": pf[15]},
            )
            return things.deferred_pass(
                lv, c, fr, pools, o, x, y, an, f_h, s_l, m_s,
                i, l, d, s, rgb=rgb, item_kernel=True,
            )[0]
        return jax.jit(fn)

    if START <= 4:
        timeit("3. deferred_pass (item kernel, N=320)", make_deferred(cfg),
               level, frame, order, px, py, ang, fh, sl, ms, *args0, *flat)
        import dataclasses
        timeit("4. deferred_pass (item kernel, N=16)",
               make_deferred(dataclasses.replace(cfg, max_visible_mobjs=16)),
               level, frame, order, px, py, ang, fh, sl, ms, *args0, *flat)

    # ---- 5. item_pass kernel given paint raw outputs ---------------------
    from doomtpu.ops.pallas_itempass import item_pass

    @jax.jit
    def ipass(lv, x, y, a, f, s_l, m_s, t_s):
        # re-run paint inside (raw outputs are not fetchable across
        # jits cheaply); subtract row 1 to get the kernel's own cost
        frame = cam.build_seg_frame(lv, cfg, x, y, a, f, s_l, t_s)
        frame = jax.lax.optimization_barrier(frame)
        order = cam.seg_order(lv, cam.traversal_rank(lv, x, y))
        out = render_paint(lv, cfg, frame, order, a, x, y, f)
        p, _ = things.item_pack(lv, cfg, frame, order, x, y, a, f, s_l,
                                m_s)
        return item_pass(lv, cfg, p, out["raw"])[0]

    if START <= 5:
        timeit("5. paint + item_pack + item_pass kernel", ipass,
               level, px, py, ang, fh, sl, ms, ts)

    # ---- 6./7. full render chunk, old vs new item path --------------------
    import dataclasses as _dc

    cfg_old = _dc.replace(cfg, use_item_pass_kernel=False)

    @jax.jit
    def full_old(lv, x, y, a, f, s_l, m_s, t_s):
        idx, rgb, _ = render_frame(lv, cfg_old, x, y, a, f, s_l, m_s, t_s)
        return idx, rgb

    timeit("6. full chunk (deferred + composite)", full_old,
           level, px, py, ang, fh, sl, ms, ts)

    @jax.jit
    def full_new(lv, x, y, a, f, s_l, m_s, t_s):
        idx, rgb, _ = render_frame(lv, cfg, x, y, a, f, s_l, m_s, t_s)
        return idx, rgb

    timeit("7. full chunk (item-pass kernel)", full_new,
           level, px, py, ang, fh, sl, ms, ts)


if __name__ == "__main__":
    main()
