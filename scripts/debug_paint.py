#!/usr/bin/env python
"""Localize paint-kernel (interpret) vs XLA-path mismatches on the demo
level: per-region mismatch counts for idx/light/dist/sky/rgb + pool
diffs.  CPU, fast-FP mode (bit-identical expectation)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from doomtpu.config import RenderConfig
from doomtpu.render import camera as cam, jmath, resolve as res, walls
from doomtpu.render.device import DeviceLevel
from doomtpu.engine import DoomEngine
from doomtpu.wad import synth

VIEWS = [
    (384.0, 256.0, 0.0),
    (900.0, 256.0, 2.5),
    (300.0, 700.0, 4.6),
    (384.0, 256.0, 3.1),
]


def main():
    # strict mode (conftest default for tests): smul-protected products
    jmath.set_strict_fp(True)
    cfg = RenderConfig(width=320, height=200, span_capacity=32)
    engine = DoomEngine.from_wad_bytes(synth.demo_wad(), "e1m1", config=cfg)
    level, t = engine.level, engine.tables
    assert level.paint_ok

    B = len(VIEWS)
    px = jnp.asarray([v[0] for v in VIEWS], jnp.float32)
    py = jnp.asarray([v[1] for v in VIEWS], jnp.float32)
    pa = jnp.asarray([v[2] for v in VIEWS], jnp.float32)
    fh = jnp.asarray(
        [float(t.sector_floor_h[t.sector_at(v[0], v[1])]) for v in VIEWS],
        jnp.float32,
    )
    sl = jnp.asarray(t.sector_light, jnp.int32)[None].repeat(B, 0)
    ts = jnp.full(B, 0.4, jnp.float32)

    frame = cam.build_seg_frame(level, cfg, px, py, pa, fh, sl, ts)
    order = cam.seg_order(level, cam.traversal_rank(level, px, py))

    pool, cnt, _ = walls.wall_scan(level, cfg, frame, order)
    idx_r, light_r, dist_r, sky_r = res.resolve_frame(
        level, cfg, frame, pool, cnt, px, py, pa, fh
    )
    rgb_r = res.shade(level, idx_r, light_r, dist_r, sky_r, onehot=False)

    from doomtpu.ops.pallas_paint import LD_SKY, LD_WRITTEN, render_paint

    out = render_paint(level, cfg, frame, order, pa, px, py, fh,
                       interpret=True)

    idx_p = np.asarray(out["idx"])
    idx_r = np.asarray(idx_r)
    ld = np.asarray(out["ld"])
    light_p = (ld >> 16) & 0xFF
    dist_p = (ld & 0xFFFF).astype(np.int32)
    sky_p = (ld & LD_SKY) != 0
    wr_r = idx_r >= 0

    def report(name, a, b, mask=None):
        d = a != b
        if mask is not None:
            d = d & mask
        n = int(d.sum())
        print(f"{name:8s} mismatches: {n}")
        if n:
            bb, yy, xx = np.nonzero(d)
            print(f"  views: {sorted(set(bb.tolist()))}")
            print(f"  x range: {xx.min()}..{xx.max()}  (blocks "
                  f"{sorted(set((xx // 128).tolist()))})")
            print(f"  y range: {yy.min()}..{yy.max()}")
            i = np.argsort(bb * 10**6 + xx * 10**3 + yy)[:8]
            for j in i:
                b_, y_, x_ = bb[j], yy[j], xx[j]
                print(f"   b={b_} x={x_} y={y_}: ref={a[b_, y_, x_]} "
                      f"paint={b[b_, y_, x_]}")
        return n

    report("idx", idx_r, idx_p)
    report("light", np.asarray(light_r), light_p, wr_r)
    report("dist", np.asarray(dist_r) & 0xFFFF, dist_p, wr_r)
    report("sky", np.asarray(sky_r), sky_p)
    report("rgb", np.asarray(rgb_r), np.asarray(out["rgb"]))

    # pool comparison: clip pool vs unified pool's wall/mid records
    spans, (d1, d2, d3, d4, d5, d6) = pool
    spans = np.asarray(spans); d2n = np.asarray(d2); d6n = np.asarray(d6)
    cnt_n = np.asarray(cnt)
    kinds = (spans >> 29) & 3
    k_ok = np.arange(spans.shape[2])[None, None] < cnt_n[..., None]
    is_clip = k_ok & ((kinds == walls.KIND_WALL) | (kinds == walls.KIND_MID))
    ref_clip_cnt = is_clip.sum(-1)
    print("clip cnt equal:",
          bool((np.asarray(out["cnt_clip"]) == ref_clip_cnt).all()))
    # compare clip records in order per column on a few mismatching cols
    c_span = np.asarray(out["clippool"][0])
    mism = np.asarray(out["cnt_clip"]) != ref_clip_cnt
    if mism.any():
        b_, x_ = np.nonzero(mism)
        b0, x0 = b_[0], x_[0]
        print(f"first cnt mismatch b={b0} x={x0}: "
              f"ref={ref_clip_cnt[b0, x0]} paint={out['cnt_clip'][b0, x0]}")
    ovf = np.asarray(out["overflow"])
    print("overflow max:", ovf.max(axis=0))


if __name__ == "__main__":
    main()
