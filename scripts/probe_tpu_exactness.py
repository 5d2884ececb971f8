#!/usr/bin/env python
"""On-TPU pixel exactness vs the spec oracle (round-4 VERDICT #5).

Every bit-exactness proof so far ran in CPU/interpret strict-FP mode;
the TPU fast path uses plain f32 (Mosaic may contract mul+add), so the
shipped numbers and the parity claim came from different configurations.
This probe renders spread poses on the e1m1-scale fixture ON THE REAL
TPU through each pipeline and diffs the palette-index plane against the
scalar spec oracle (render/spec.py; ref arithmetic
bitmap_render.rs:241-263):

  paint+composite   the bench default (pallas paint + item kernel)
  paint+itempass    pallas paint + standalone item-pass kernel
  scan+resolve      pallas wall-scan + XLA resolve/deferred
  xla               pure XLA pipeline (no kernels)

Capacities are uncapped/oversized so any mismatch is floating-point,
not pool clipping.  Prints per-view and total mismatch counts; PERF.md
records the result.  Env: VIEWS (default 4).
"""

import dataclasses
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() != "cpu", "run on the TPU"
    exact = int(os.environ.get("DOOMTPU_EXACT", "0"))
    if exact in (1, 2):
        # exact-TPU mode (VERDICT r4 #4): pin parity-critical products
        # (level 1) and optionally host-libm trig (level 2) — see
        # jmath.set_exact_tpu.  Run the probe at 0/1/2 to attribute the
        # 421-px fast-path divergence.  (Level 2 needs host callbacks,
        # which the axon runtime lacks — see EXACT=3 below for the
        # trig attribution that works here.)
        from doomtpu.render import jmath

        jmath.set_exact_tpu(exact)
    if exact:
        print(f"DOOMTPU_EXACT={exact}", flush=True)
    from doomtpu.assets.bundle import LevelAssets
    from doomtpu.config import RenderConfig
    from doomtpu.info import load_default_tables
    from doomtpu.level.tables import MapTables
    from doomtpu.render.device import DeviceLevel
    from doomtpu.render.frame import render_frame
    from doomtpu.render.spec import Player, SpecRenderer
    from doomtpu.wad import synth
    from doomtpu.wad.reader import WadFile

    # 8 views -> TB=8 camera tiles, the exact kernel shape the bench runs
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
    spec = SpecRenderer(mt, assets, info, base)

    # spread poses, same generator as the bench probes
    rng = np.random.default_rng(0)
    views = []
    left, right, top, bottom = [float(v) for v in mt.bbox]
    while len(views) < n_views:
        x = rng.uniform(left, right)
        y = rng.uniform(top, bottom)
        s = mt.sector_at(x, y)
        if s >= 0 and mt.sector_floor_h[s] < mt.sector_ceil_h[s]:
            views.append((x, y, rng.uniform(0, 2 * math.pi)))

    # mobjs spawned from THINGS exactly like parity.py / the engine
    dn = info.mobj_index_by_doomednum()
    pos, ang, st = [], [], []
    for i in range(len(mt.thing_type)):
        tt = int(mt.thing_type[i])
        if 1 <= tt <= 4 or tt == 11:
            continue
        pos.append(mt.thing_pos[i])
        ang.append(mt.thing_angle[i])
        st.append(int(info.mobj_spawn[dn[tt]]))
    mp = np.array(pos, np.float32)
    ma = np.array(ang, np.float32)
    ms = np.array(st, np.int32)

    B = len(views)
    px = jnp.array([v[0] for v in views], jnp.float32)
    py = jnp.array([v[1] for v in views], jnp.float32)
    pa = jnp.array([v[2] for v in views], jnp.float32)
    fh = jnp.array(
        [float(mt.sector_floor_h[mt.sector_at(v[0], v[1])])
         for v in views], jnp.float32,
    )
    sl = jnp.asarray(mt.sector_light, jnp.int32)[None].repeat(B, 0)
    ts = jnp.zeros(B, jnp.float32)
    mstate = jnp.asarray(ms, jnp.int32)[None].repeat(B, 0)

    print(f"backend={jax.default_backend()} views={B} "
          f"G={level.num_segs} MO={level.num_mobjs}", flush=True)

    if exact == 3:
        # EXACT=3 (reverse attribution): render the ORACLE with the
        # TPU's own cos/sin values (fetched per ±angle from the device)
        # and diff the untouched fast pipelines against it.  Mismatch
        # counts here are the divergence NOT explained by the
        # transcendental ULP gap (0 == trig explains everything).
        import jax.numpy as jnp2

        from doomtpu.render import spec as spec_mod

        angs = np.asarray(
            [v[2] for v in views] + [-v[2] for v in views], np.float32
        )
        c_t = np.asarray(jnp2.cos(jnp2.asarray(angs)))
        s_t = np.asarray(jnp2.sin(jnp2.asarray(angs)))
        table = {
            np.float32(a).tobytes(): (c, s)
            for a, c, s in zip(angs, c_t, s_t)
        }
        n_missing = [0]

        def override(ang):
            hit = table.get(np.float32(ang).tobytes())
            if hit is None:
                n_missing[0] += 1
            return hit

        spec_mod.set_trig_override(override)
        print("EXACT=3: oracle renders with XLA:TPU trig", flush=True)

    t0 = time.time()
    oracle = []
    for (x, y, a), f in zip(views, np.asarray(fh)):
        p = Player(x, y, a, float(f))
        oracle.append(
            spec.render(p, mobj_pos=mp, mobj_angle=ma, mobj_state=ms)
        )
    print(f"oracle: {time.time() - t0:.0f}s", flush=True)
    if exact == 3:
        from doomtpu.render import spec as spec_mod

        spec_mod.set_trig_override(None)
        print(f"EXACT=3: angles not in the table: {n_missing[0]}",
              flush=True)

    pipelines = {
        "paint+composite": dataclasses.replace(
            base, use_pallas_paint=True, use_pallas_scan=True),
        "paint+itempass": dataclasses.replace(
            base, use_pallas_paint=True, use_pallas_scan=True,
            item_capacity=8, use_item_pass_kernel=True),
        "scan+resolve": dataclasses.replace(base, use_pallas_scan=True),
        "xla": base,
    }
    if exact in (1, 2):
        # Mosaic cannot lower reduce_precision (sweep #13), so exact
        # mode forces the pure XLA pipeline regardless of config —
        # every row would collapse to it; run it once.  (The EXACT=0
        # table shows all four pipelines diverge identically, so the
        # xla row is the attribution that matters.)
        pipelines = {"xla": base}
    elif exact == 3:
        # trig-injected ORACLE vs the untouched fast pipelines: the
        # bench-default row is the attribution that matters
        pipelines = {"paint+composite": pipelines["paint+composite"]}

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def render(lv, c, x, y, a, f, s_l, m_s, t_s):
        idx, rgb, aux = render_frame(lv, c, x, y, a, f, s_l, m_s, t_s)
        return idx, aux

    for name, c in pipelines.items():
        t0 = time.time()
        idx, aux = render(level, c, px, py, pa, fh, sl, mstate, ts)
        idx = np.asarray(idx)
        drops = sum(
            int(np.asarray(aux[k]).sum())
            for k in ("overflow", "live_dropped", "items_dropped",
                      "item_overflow") if k in aux
        )
        total = 0
        per = []
        for b in range(B):
            n_bad = int((idx[b] != oracle[b]["idx"]).sum())
            total += n_bad
            per.append(n_bad)
        print(
            f"{name:18s} mismatched px {total:6d} / {B * idx[0].size} "
            f"({total / (B * idx[0].size):.6%})  per-view {per}  "
            f"drops={drops}  ({time.time() - t0:.0f}s incl. compile)",
            flush=True,
        )


if __name__ == "__main__":
    main()
