#!/usr/bin/env python
"""Lower every Pallas kernel for the REAL TPU backend without executing.

Interpret-mode tests run the kernels' semantics on CPU but skip Mosaic's
lowering rules (block-shape divisibility, layout legality, SMEM window
checks...) — a kernel can pass the whole suite and still fail to lower
on hardware (e.g. the plive (1, 1, UG) SMEM block, fixed in d6ee75a).
`jax.jit(f).lower(...)` runs the Pallas->Mosaic lowering in-process and
stops before the (slow, relayed) XLA compile, so this catches that
class of bug in seconds.  Run after ANY kernel or block-spec change:

    python scripts/check_tpu_lowering.py

Exits non-zero on the first lowering failure.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    assert jax.default_backend() != "cpu", (
        "needs the TPU backend registered (lowering only, no execution)"
    )
    from doomtpu.config import RenderConfig
    from doomtpu.engine import DoomEngine
    from doomtpu.render import camera as cam, things
    from doomtpu.ops.pallas_paint import render_paint
    from doomtpu.ops.pallas_scan import wall_scan_pallas
    from doomtpu.wad import synth

    cfg = RenderConfig(span_capacity=48)
    eng = DoomEngine.from_wad_bytes(
        synth.e1m1_scale_wad(), "e1m1", config=cfg
    )
    level = eng.level
    B = 32
    state = eng.new_game(B, key=jax.random.PRNGKey(0))
    px, py = state.pos[:, 0], state.pos[:, 1]
    ang, fh = state.angle, state.floor_height
    sl, ts, ms = state.sector_light, state.timestamp, state.mobj_state

    def paint(lv, x, y, an, f, s_l, t, mstate):
        frame = cam.build_seg_frame(lv, cfg, x, y, an, f, s_l, t)
        order = cam.seg_order(lv, cam.traversal_rank(lv, x, y))
        return render_paint(lv, cfg, frame, order, an, x, y, f)

    def scan(lv, x, y, an, f, s_l, t):
        frame = cam.build_seg_frame(lv, cfg, x, y, an, f, s_l, t)
        order = cam.seg_order(lv, cam.traversal_rank(lv, x, y))
        return wall_scan_pallas(lv, cfg, frame, order)

    def deferred(lv, x, y, an, f, s_l, t, mstate):
        # paint + item-composite kernel path (frame.render_frame's
        # default route: deferred_pass with item_kernel=True)
        frame = cam.build_seg_frame(lv, cfg, x, y, an, f, s_l, t)
        order = cam.seg_order(lv, cam.traversal_rank(lv, x, y))
        out = render_paint(lv, cfg, frame, order, an, x, y, f)
        ld = out["ld"]
        light = (ld >> 16) & 0xFF
        dist = ((ld & 0xFFFF) << 16) >> 16
        is_sky = (ld & (1 << 25)) != 0
        pools = things.pools_from_paint(out)
        return things.deferred_pass(
            lv, cfg, frame, pools, order, x, y, an, f, s_l, mstate,
            out["idx"], light, dist, is_sky, rgb=out["rgb"],
            item_kernel=True,
        )

    def itempass(lv, x, y, an, f, s_l, t, mstate):
        # paint + standalone item-pass kernel (frame.render_frame's
        # route when use_item_pass_kernel applies)
        from doomtpu.ops.pallas_itempass import item_pass

        frame = cam.build_seg_frame(lv, cfg, x, y, an, f, s_l, t)
        order = cam.seg_order(lv, cam.traversal_rank(lv, x, y))
        out = render_paint(lv, cfg, frame, order, an, x, y, f)
        ip, _ = things.item_pack(
            lv, cfg, frame, order, x, y, an, f, s_l, mstate
        )
        return item_pass(lv, cfg, ip, out["raw"])

    def deferred_honest(lv, x, y, an, f, s_l, t, mstate):
        # honest bench pools (KI=24 > 8): clip_in_kernel is off, so the
        # composite takes the k-outer occupancy-bounded kernel
        import dataclasses

        hcfg = dataclasses.replace(
            cfg, mid_capacity=16, clip_capacity=56, item_capacity=24,
        )
        frame = cam.build_seg_frame(lv, hcfg, x, y, an, f, s_l, t)
        order = cam.seg_order(lv, cam.traversal_rank(lv, x, y))
        out = render_paint(lv, hcfg, frame, order, an, x, y, f)
        ld = out["ld"]
        light = (ld >> 16) & 0xFF
        dist = ((ld & 0xFFFF) << 16) >> 16
        is_sky = (ld & (1 << 25)) != 0
        pools = things.pools_from_paint(out)
        return things.deferred_pass(
            lv, hcfg, frame, pools, order, x, y, an, f, s_l, mstate,
            out["idx"], light, dist, is_sky, rgb=out["rgb"],
            item_kernel=True,
        )

    def paint_stream():
        # streaming seg-pack pipeline (grid drops its seg dimension;
        # in-kernel double-buffered HBM->VMEM/SMEM chunk DMAs)
        from doomtpu.ops import pallas_paint as pp

        old = pp.PAINT_STREAM
        pp.PAINT_STREAM = True
        try:
            return jax.jit(paint).lower(level, px, py, ang, fh, sl, ts, ms)
        finally:
            pp.PAINT_STREAM = old

    def paint_pcyb():
        # per-camera y-bounds (lane-reduce + VMEM scratch round trip +
        # scalar reads + per-camera pl.when): scalar reads from VMEM
        # are the unproven Mosaic construct here — catch a lowering
        # rejection before the sweep burns its slot
        from doomtpu.ops import pallas_paint as pp

        old = pp.PAINT_PCYB
        pp.PAINT_PCYB = True
        try:
            return jax.jit(paint).lower(level, px, py, ang, fh, sl, ts, ms)
        finally:
            pp.PAINT_PCYB = old

    def paint_pdefer():
        # deferred plane records (store-only plane emission + in-kernel
        # per-final-pixel finish resolve) — opt-in, but this repo's
        # failure class (TB=16 ApplyVectorLayout crash, vmem overflow)
        # surfaces only at hardware compile, so keep it lowering-checked
        from doomtpu.ops import pallas_paint as pp

        old = pp.PAINT_PDEFER
        pp.PAINT_PDEFER = True
        try:
            return jax.jit(paint).lower(level, px, py, ang, fh, sl, ts, ms)
        finally:
            pp.PAINT_PDEFER = old

    checks = [
        ("render_paint", lambda: jax.jit(paint).lower(
            level, px, py, ang, fh, sl, ts, ms)),
        ("render_paint STREAM", paint_stream),
        ("render_paint PDEFER", paint_pdefer),
        ("render_paint PCYB", paint_pcyb),
        ("item_pass", lambda: jax.jit(itempass).lower(
            level, px, py, ang, fh, sl, ts, ms)),
        ("wall_scan_pallas", lambda: jax.jit(scan).lower(
            level, px, py, ang, fh, sl, ts)),
        ("deferred+item_kernel", lambda: jax.jit(deferred).lower(
            level, px, py, ang, fh, sl, ts, ms)),
        ("deferred+item_kernel honest KI=24 (k-outer)",
         lambda: jax.jit(deferred_honest).lower(
            level, px, py, ang, fh, sl, ts, ms)),
    ]
    for name, fn in checks:
        fn()
        print(f"lowering OK: {name}", flush=True)
    print("all kernels lower for TPU")
    return 0


if __name__ == "__main__":
    sys.exit(main())
