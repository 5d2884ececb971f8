#!/usr/bin/env python
"""Visit-count census for the paint kernel at the bench workload (CPU).

Reproduces bench.py's B=2048 spread poses (Morton-sorted, chunked at
256), then computes — per 256-chunk — the paint kernel's compaction
metadata exactly as render_paint does:

- seg visits: sum over (tile, block) of live-seg counts (the in-kernel
  fori iterations), useful g grid steps (ceil(scnt/UG)) vs the static
  grid, and the scnt distribution
- item visits: sum over (tile, block) of live-item counts (the deferred
  item-pass kernel's per-block loops) and their distribution

This turns the TPU sweep's aggregate ms into per-visit costs and sizes
the headroom of visit-reduction ideas (wider blocks, tighter culling)
without a TPU in the loop.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from doomtpu.config import RenderConfig
from doomtpu.engine import DoomEngine, _camera_sort_perm
from doomtpu.render import camera as cam
from doomtpu.render import things
from doomtpu.render.jmath import as_i16
from doomtpu.wad import synth

LANES = 128


def main():
    B = int(os.environ.get("B", 2048))
    CHUNK = 256
    TB, UG = 8, 32
    cfg = RenderConfig(width=320, height=200, max_visible_mobjs=320,
                       span_capacity=48)
    engine = DoomEngine.from_wad_bytes(synth.e1m1_scale_wad(), "e1m1",
                                       config=cfg)
    t = engine.tables
    rng = np.random.default_rng(0)
    poses = []
    left, right, top, bottom = [float(v) for v in t.bbox]
    while len(poses) < B:
        x = rng.uniform(left, right)
        y = rng.uniform(top, bottom)
        s = t.sector_at(x, y)
        if s >= 0 and t.sector_floor_h[s] < t.sector_ceil_h[s]:
            poses.append((x, y, rng.uniform(0, 2 * math.pi)))
    pos = np.asarray([(p[0], p[1]) for p in poses], np.float32)
    ang = np.asarray([p[2] for p in poses], np.float32)
    state = engine.new_game(B, key=jax.random.PRNGKey(0), pos=pos, angle=ang)
    perm = np.asarray(_camera_sort_perm(state))
    state = jax.tree_util.tree_map(lambda x: x[perm], state)

    level = engine.level
    G = level.num_segs
    W = cfg.width
    NBW = (W + LANES - 1) // LANES
    wlo = np.arange(NBW, dtype=np.int64)[None, None] * LANES

    tot = dict(seg_visits=0, seg_gsteps=0, grid_gsteps=0, item_visits=0,
               scnt_max=0, icnt_max=0, seg_blocks_per_liveseg=[],
               item_cols=0, item_blocks=0)
    scnts = []
    icnts = []
    for c0 in range(0, B, CHUNK):
        st = jax.tree_util.tree_map(lambda x: x[c0:c0 + CHUNK], state)
        px, py = st.pos[:, 0], st.pos[:, 1]
        frame = cam.build_seg_frame(level, cfg, px, py, st.angle,
                                    st.floor_height, st.sector_light,
                                    st.timestamp)
        order = cam.seg_order(level, cam.traversal_rank(level, px, py))
        active = np.asarray(frame["active"])
        pact = (active[..., 0] | (active[..., 1] << 1)
                | (active[..., 2] << 2) | (active[..., 3] << 3))
        pact_o = np.take_along_axis(pact.astype(np.int32),
                                    np.asarray(order), 1)
        x0 = np.take_along_axis(np.asarray(as_i16(frame["x0"])),
                                np.asarray(order), 1)
        x1 = np.take_along_axis(np.asarray(as_i16(frame["x1"])),
                                np.asarray(order), 1)
        ov = (x0[..., None] < wlo + LANES) & (x1[..., None] >= wlo)
        live = (pact_o != 0)[..., None] & ov                 # [C,G,NBW]
        Bt = CHUNK // TB
        live_t = live.reshape(Bt, TB, G, NBW).any(1)         # [Bt,G,NBW]
        scnt = live_t.sum(1)                                 # [Bt,NBW]
        scnts.append(scnt.ravel())
        tot["seg_visits"] += int(scnt.sum())
        tot["seg_gsteps"] += int(np.ceil(scnt / UG).sum())
        tot["grid_gsteps"] += Bt * NBW * ((G + UG - 1) // UG)
        tot["scnt_max"] = max(tot["scnt_max"], int(scnt.max()))
        # blocks per live seg (how much a wider block would dedupe)
        nb = live_t.sum(2)
        tot["seg_blocks_per_liveseg"].append(
            (nb[nb > 0].mean(), live_t.any(2).sum()))

        # items: reuse item_pack's selection then the live-list math
        ipack, _ = things.item_pack(level, cfg, frame, order, px, py,
                                    st.angle, st.floor_height,
                                    st.sector_light, st.mobj_state)
        if ipack is None:
            continue
        ii = np.asarray(ipack["i"])
        from doomtpu.render.things import IPI_FL, IPI_X0, IPI_X1E
        fl = (ii[:, :, IPI_FL] & 1) != 0
        ix0 = ii[:, :, IPI_X0]
        ix1e = ii[:, :, IPI_X1E]
        liv = fl[..., None] & (ix0[..., None] < wlo + LANES) & (
            ix1e[..., None] > wlo)                          # [C,N,NBW]
        liv_t = liv.reshape(Bt, TB, -1, NBW).any(1)
        icnt = liv_t.sum(1)
        icnts.append(icnt.ravel())
        tot["item_visits"] += int(icnt.sum())
        tot["icnt_max"] = max(tot["icnt_max"], int(icnt.max()))
        # total live item-columns (the real pixel work)
        span = np.clip(np.minimum(ix1e[..., None], wlo + LANES)
                       - np.maximum(ix0[..., None], wlo), 0, LANES)
        tot["item_cols"] += int((span * liv).sum())
        tot["item_blocks"] += int(liv.any(-1).sum())

    sc = np.concatenate(scnts)
    ic = np.concatenate(icnts) if icnts else np.zeros(1)
    bl = tot["seg_blocks_per_liveseg"]
    mean_blocks = float(np.average([m for m, _ in bl],
                                   weights=[n for _, n in bl]))
    nchunks = B // CHUNK
    print(f"chunks: {nchunks}  G={G}  NBW={NBW}  (per-chunk averages)")
    print(f"seg visits/chunk:  {tot['seg_visits']/nchunks:8.0f}   "
          f"scnt mean {sc.mean():6.1f}  p50 {np.percentile(sc,50):5.0f}  "
          f"p90 {np.percentile(sc,90):5.0f}  max {tot['scnt_max']}")
    print(f"g-steps/chunk: useful {tot['seg_gsteps']/nchunks:6.0f}  "
          f"grid {tot['grid_gsteps']/nchunks:6.0f}  "
          f"(dead {100*(1-tot['seg_gsteps']/tot['grid_gsteps']):.0f}%)")
    print(f"blocks per live seg: {mean_blocks:.2f} "
          f"(union-block visit cut would be ~{mean_blocks:.2f}x)")
    print(f"item visits/chunk: {tot['item_visits']/nchunks:8.0f}   "
          f"icnt mean {ic.mean():6.1f}  p50 {np.percentile(ic,50):5.0f}  "
          f"p90 {np.percentile(ic,90):5.0f}  max {tot['icnt_max']}")
    print(f"item cols/chunk: {tot['item_cols']/nchunks:8.0f}  "
          f"cols/visit {tot['item_cols']/max(tot['item_visits'],1):6.1f}  "
          f"blocks/live-item-cam {tot['item_blocks']/nchunks:6.0f}")


if __name__ == "__main__":
    main()
