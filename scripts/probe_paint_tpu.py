#!/usr/bin/env python
"""Compile + run the paint kernel on the real TPU (demo level, B=4|8).

Prints the first few output stats; the point is that the Mosaic compile
succeeds and the kernel executes.  Timing is NOT meaningful at B=4.

Usage: python scripts/probe_paint_tpu.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from doomtpu.config import RenderConfig
    from doomtpu.engine import DoomEngine
    from doomtpu.wad import synth

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = RenderConfig(width=320, height=200, span_capacity=32,
                       use_pallas_paint=True)
    engine = DoomEngine.from_wad_bytes(synth.demo_wad(), "e1m1", config=cfg)
    level = engine.level
    assert level.paint_ok

    t = engine.tables
    views = [(384.0, 256.0, 0.0), (900.0, 256.0, 2.5),
             (300.0, 700.0, 4.6), (384.0, 256.0, 3.1)]
    views = (views * ((B + 3) // 4))[:B]
    px = jnp.asarray([v[0] for v in views], jnp.float32)
    py = jnp.asarray([v[1] for v in views], jnp.float32)
    pa = jnp.asarray([v[2] for v in views], jnp.float32)
    fh = jnp.asarray(
        [float(t.sector_floor_h[t.sector_at(v[0], v[1])]) for v in views],
        jnp.float32,
    )
    sl = jnp.asarray(t.sector_light, jnp.int32)[None].repeat(B, 0)
    ts = jnp.full(B, 0.4, jnp.float32)

    from doomtpu.render import camera as cam
    from doomtpu.ops.pallas_paint import render_paint

    @jax.jit
    def run(level, px, py, pa, fh, sl, ts):
        frame = cam.build_seg_frame(level, cfg, px, py, pa, fh, sl, ts)
        order = cam.seg_order(level, cam.traversal_rank(level, px, py))
        return render_paint(level, cfg, frame, order, pa, px, py, fh)

    t0 = time.time()
    out = run(level, px, py, pa, fh, sl, ts)
    cs = int(np.asarray(out["idx"].sum()))
    print(f"compile+run ok in {time.time() - t0:.1f}s  idx checksum={cs}",
          flush=True)
    t0 = time.time()
    n = 5
    for _ in range(n):
        out = run(level, px, py, pa, fh, sl, ts)
    cs = int(np.asarray(out["idx"].sum()))
    dt = (time.time() - t0) / n
    print(f"steady: {dt * 1000:.1f} ms/call at B={B} (checksum {cs})",
          flush=True)
    print("rgb[0] nonzero px:", int(np.asarray((out["rgb"][0] != 0).sum())),
          flush=True)


if __name__ == "__main__":
    main()
