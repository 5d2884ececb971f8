#!/usr/bin/env python
"""Rollout-at-scale benchmark: engine.rollout (tick + render per step)
at B cameras x T ticks on the e1m1-scale fixture — the RL-env workload
of BASELINE.json configs[4].

Frames stay on device (return_frames=False -> per-step checksums), the
timing forces a host fetch of a dependent scalar (PERF.md discipline).

Env: DOOMTPU_ROLLOUT_B (default 2048), DOOMTPU_ROLLOUT_T (default 64),
DOOMTPU_ROLLOUT_MOBJS (max_visible_mobjs, default 48).
"""

import math
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

    B = int(os.environ.get("DOOMTPU_ROLLOUT_B", 2048))
    T = int(os.environ.get("DOOMTPU_ROLLOUT_T", 64))
    mv = int(os.environ.get("DOOMTPU_ROLLOUT_MOBJS", 48))

    on_tpu = jax.default_backend() != "cpu"
    paint = os.environ.get("DOOMTPU_ROLLOUT_PAINT", "1") != "0"
    cfg = RenderConfig(
        width=320, height=200, span_capacity=48,
        max_visible_mobjs=mv,
        use_pallas_scan=on_tpu and paint,
        use_pallas_paint=on_tpu and paint,
    )
    engine = DoomEngine.from_wad_bytes(
        synth.e1m1_scale_wad(), "e1m1", config=cfg
    )
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
    # random movement controls per tick (bits: see sim.step)
    controls_seq = jnp.asarray(
        rng.integers(0, 16, (T, B), np.int32), jnp.int32
    )
    key = jax.random.PRNGKey(7)

    # the relay's TPU worker kills single executions running longer than
    # ~100 s (measured: B=2048 T=32 = 53 s OK, T=64 = ~106 s crashes the
    # worker), so long rollouts are chained as <=32-tick scan segments —
    # same compiled executable, state carried across calls
    SEG = min(T, 32)
    n_seg = (T + SEG - 1) // SEG
    seq = controls_seq[: SEG * n_seg].reshape(n_seg, SEG, B)

    t0 = time.time()
    final, cks = engine.rollout(state, seq[0], key, return_frames=False)
    warm = int(np.asarray(cks.sum()))
    compile_s = time.time() - t0

    t0 = time.time()
    cs = 0
    for i in range(n_seg):
        final, cks = engine.rollout(
            final, seq[i], jax.random.fold_in(key, i), return_frames=False
        )
        cs += int(np.asarray(cks.sum()))
    dt = time.time() - t0

    fps = B * SEG * n_seg / dt
    print(
        f"rollout: B={B} T={SEG}x{n_seg} max_visible_mobjs={mv} "
        f"compile={compile_s:.1f}s run={dt:.3f}s "
        f"-> {fps:,.0f} step+render frames/sec/chip (checksum {cs})"
    )


if __name__ == "__main__":
    main()
