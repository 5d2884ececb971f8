#!/usr/bin/env python
"""CPU fast-path vs strict-FP exactness — companion to probe_tpu_exactness.

Sweep #9 measured 421/512,000 mismatched pixels on the real TPU, identical
across all four pipelines (incl. pure XLA), pointing at the shared fast-path
f32 arithmetic rather than the Pallas kernels.  This probe closes the loop on
CPU: render the SAME 8 poses (same rng seed) through the pure-XLA pipeline
twice — fast (plain f32) and strict (jmath.set_strict_fp + x64, the proven
oracle-equal configuration per scripts/parity.py) — and diff the palette
planes.  A per-view mismatch pattern matching the TPU probe's
[54, 46, 147, 73, 0, 0, 0, 101] pins the divergence on fast-vs-strict FP
semantics, not on TPU hardware.

Ref arithmetic the strict mode models: bitmap_render.rs:241-263.
"""

import dataclasses
import math
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

_WORKER = "_DOOMTPU_EXACT_WORKER"


def render_once(strict: bool):
    """Run in a subprocess: x64/strict flip process-global state."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    if strict:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from doomtpu.assets.bundle import LevelAssets
    from doomtpu.config import RenderConfig
    from doomtpu.info import load_default_tables
    from doomtpu.level.tables import MapTables
    from doomtpu.render import jmath
    from doomtpu.render.device import DeviceLevel
    from doomtpu.render.frame import render_frame
    from doomtpu.wad import synth
    from doomtpu.wad.reader import WadFile

    if strict:
        jmath.set_strict_fp(True)

    n_views = int(os.environ.get("VIEWS", 8))
    info = load_default_tables()
    base = RenderConfig(
        span_capacity=64, mid_capacity=24, clip_capacity=64,
        item_capacity=32, max_visible_mobjs=0, paint_live_capacity=0,
    )
    wad = WadFile(synth.e1m1_scale_wad())
    mt = MapTables.load(wad, "E1M1")
    assets = LevelAssets.load(wad, mt, info.sprite_names)
    level = DeviceLevel.build(mt, assets, info)

    rng = np.random.default_rng(0)  # SAME seed as probe_tpu_exactness
    views = []
    left, right, top, bottom = [float(v) for v in mt.bbox]
    while len(views) < n_views:
        x = rng.uniform(left, right)
        y = rng.uniform(top, bottom)
        s = mt.sector_at(x, y)
        if s >= 0 and mt.sector_floor_h[s] < mt.sector_ceil_h[s]:
            views.append((x, y, rng.uniform(0, 2 * math.pi)))

    dn = info.mobj_index_by_doomednum()
    st = [
        int(info.mobj_spawn[dn[int(mt.thing_type[i])]])
        for i in range(len(mt.thing_type))
        if not (1 <= int(mt.thing_type[i]) <= 4 or int(mt.thing_type[i]) == 11)
    ]

    B = len(views)
    px = jnp.array([v[0] for v in views], jnp.float32)
    py = jnp.array([v[1] for v in views], jnp.float32)
    pa = jnp.array([v[2] for v in views], jnp.float32)
    fh = jnp.array(
        [float(mt.sector_floor_h[mt.sector_at(v[0], v[1])]) for v in views],
        jnp.float32,
    )
    sl = jnp.asarray(mt.sector_light, jnp.int32)[None].repeat(B, 0)
    ts = jnp.zeros(B, jnp.float32)
    mstate = jnp.asarray(np.array(st, np.int32))[None].repeat(B, 0)

    idx, _, _ = render_frame(
        level, base, px, py, pa, fh, sl, mstate, ts
    )
    np.save(os.environ[_WORKER], np.asarray(idx, np.int16))


def main():
    if _WORKER in os.environ:
        render_once(strict=os.environ["_DOOMTPU_EXACT_STRICT"] == "1")
        return
    here = os.path.abspath(__file__)
    planes = {}
    for strict in (False, True):
        out = f"/tmp/exact_{'strict' if strict else 'fast'}.npy"
        env = dict(
            os.environ, _DOOMTPU_EXACT_WORKER=out,
            _DOOMTPU_EXACT_STRICT="1" if strict else "0",
            JAX_PLATFORMS="cpu",
        )
        subprocess.run([sys.executable, here], env=env, check=True)
        planes[strict] = np.load(out)
    fast, strict = planes[False], planes[True]
    per = [int((fast[b] != strict[b]).sum()) for b in range(fast.shape[0])]
    total = sum(per)
    print(
        f"cpu fast-vs-strict mismatched px {total} / {fast.size} "
        f"({total / fast.size:.6%})  per-view {per}",
        flush=True,
    )
    print("tpu (sweep #9, all pipelines):   421 / 512000 (0.082227%)  "
          "per-view [54, 46, 147, 73, 0, 0, 0, 101]")


if __name__ == "__main__":
    main()
