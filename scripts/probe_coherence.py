#!/usr/bin/env python
"""Measure camera-tile coherence of the paint kernel's compacted slots.

For each (8-camera tile, 128-column block, live compacted slot): do all
cameras hold the SAME seg (and wall texture) at that traversal
position?  Uniform slots let the kernel share ONE texture/flat window
load per paint call (DOOMTPU_PAINT_SHAREDTEX); on the e1m1 fixture with
Morton-sorted bench poses this measures 100% uniform.

Env: B (default 64), LEVEL (e1m1|demo), SORT=0 to disable camera sort.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    B = int(os.environ.get("B", 64))
    level_name = os.environ.get("LEVEL", "e1m1")
    from doomtpu.config import RenderConfig
    from doomtpu.engine import DoomEngine, _camera_sort_perm
    from doomtpu.render import camera as cam
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
    frame = cam.build_seg_frame(
        level, cfg, px, py, state.angle, state.floor_height,
        state.sector_light, state.timestamp,
    )
    order = np.asarray(cam.seg_order(level, cam.traversal_rank(level, px, py)))

    TB, LANES = 8, 128
    Bt = B // TB
    G = level.num_segs
    NBW = (cfg.width + LANES - 1) // LANES

    act_o = np.take_along_axis(
        np.asarray(frame["active"]).any(-1), order, axis=1
    )
    x0o = np.take_along_axis(np.asarray(as_i16(frame["x0"])), order, axis=1)
    x1o = np.take_along_axis(np.asarray(as_i16(frame["x1"])), order, axis=1)
    wlo = np.arange(NBW)[None, None] * LANES
    live = (
        act_o[..., None]
        & (x0o[..., None] < wlo + LANES)
        & (x1o[..., None] >= wlo)
    )
    live_t = np.swapaxes(live.reshape(Bt, TB, G, NBW), 2, 3)  # [Bt,TB,NBW,G]
    any_live = live_t.any(1)
    order_t = order.reshape(Bt, TB, G)
    tex = np.asarray(frame["tex"])

    total = same_seg = same_tex = 0
    for bt in range(Bt):
        for w in range(NBW):
            for g in np.nonzero(any_live[bt, w])[0]:
                lv = live_t[bt, :, w, g]
                segs = order_t[bt, :, g]
                total += 1
                if lv.all() and len(set(segs.tolist())) == 1:
                    same_seg += 1
                cams = np.arange(bt * TB, bt * TB + TB)
                t0 = tex[cams, segs, 0]
                if lv.all() and len(set(t0[lv].tolist())) == 1:
                    same_tex += 1
    print(
        f"B={B} level={level_name}: visits={total}, "
        f"all-live & same seg: {100.0 * same_seg / total:.1f}%, "
        f"all-live & same piece0 tex: {100.0 * same_tex / total:.1f}%"
    )


if __name__ == "__main__":
    main()
