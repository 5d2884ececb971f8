#!/usr/bin/env python
"""Census: per-(camera tile, 128-column block) ITEM-POOL occupancy max
at the bench poses — the trip-count bound a kimax-prefixed composite
kernel would run with (round-4 VERDICT #1).

The composite kernel folds all KI item-pool slots per (tile, block,
y-block) regardless of occupancy; if the per-block max is far below KI,
bounding the fold by a per-(tile, block) SMEM scalar wins
proportionally.  This prints the distribution that decides it.

Env: NP (default 2048), B chunk (default 256), KI clip (default 24).
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
    KI = int(os.environ.get("KI", 24))
    from doomtpu.config import RenderConfig
    from doomtpu.engine import DoomEngine, _camera_sort_perm
    from doomtpu.render import camera as cam, things, walls
    from doomtpu.wad import synth

    cfg = RenderConfig(
        span_capacity=96, max_visible_mobjs=0,
        use_pallas_paint=False, use_pallas_scan=False,
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
    print(f"backend={jax.default_backend()} NP={NP} chunk={B} KI={KI}",
          flush=True)

    LANES = 128
    NBW = (cfg.width + LANES - 1) // LANES
    TB = 8

    @jax.jit
    def chunk_blockmax(lv, x, y, an, f, s_l, t_s, m_s):
        frame = cam.build_seg_frame(lv, cfg, x, y, an, f, s_l, t_s)
        frame = jax.lax.optimization_barrier(frame)
        order = cam.seg_order(lv, cam.traversal_rank(lv, x, y))
        pool, cnt, _ = walls.wall_scan(lv, cfg, frame, order)
        pools = things.pools_from_unified(pool, cnt)
        census = things.item_census(
            lv, cfg, frame, pools, x, y, an, f, s_l, m_s,
        )
        pres = jnp.minimum(census["presence"], KI)     # actual pool occupancy
        Wp = NBW * LANES
        W = pres.shape[1]
        if Wp != W:
            pres = jnp.pad(pres, ((0, 0), (0, Wp - W)))
        blk = pres.reshape(B // TB, TB, NBW, LANES).max(axis=(1, 3))
        return blk                                       # [Bt, NBW]

    blocks = []
    t0 = time.time()
    for c in range(NP // B):
        sl = jax.tree_util.tree_map(lambda a: a[c * B:(c + 1) * B], state)
        blk = np.asarray(chunk_blockmax(
            level, sl.pos[:, 0], sl.pos[:, 1], sl.angle,
            sl.floor_height, sl.sector_light, sl.timestamp, sl.mobj_state,
        ))
        blocks.append(blk)
        if c == 0:
            print(f"compile {time.time() - t0:.0f}s", flush=True)
    blk = np.concatenate(blocks).ravel()
    q = np.percentile(blk, [50, 90, 99])
    print(
        f"blocks={blk.size} zero={np.mean(blk == 0):.3f} "
        f"mean={blk.mean():.2f} p50={q[0]:.0f} p90={q[1]:.0f} "
        f"p99={q[2]:.0f} max={blk.max()}",
        flush=True,
    )
    hist = np.bincount(blk, minlength=KI + 1)
    print("hist:", " ".join(f"{i}:{v}" for i, v in enumerate(hist) if v),
          flush=True)


if __name__ == "__main__":
    main()
