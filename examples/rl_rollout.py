#!/usr/bin/env python
"""Batched RL-environment workload: N Doom cameras stepping + rendering
as ONE jit-compiled program.

This is the canonical consumer of doomtpu: thousands of parallel
environments where each step is a 35 Hz game tick (sector-light
thinkers, map-object state machines, player movement) followed by a
full frame render, all under `lax.scan` on device — frames never touch
the host unless you ask.

    python examples/rl_rollout.py                # 256 envs x 32 ticks
    B=2048 T=64 python examples/rl_rollout.py    # production shapes

On a multi-chip host, shard the env axis first (doomtpu/parallel):

    from doomtpu.parallel import make_mesh, shard_batch
    state = shard_batch(state, make_mesh())

and the same rollout GSPMD-partitions over the mesh (map/asset tables
replicate; there are no collectives on the hot path).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from doomtpu.engine import DoomEngine
from doomtpu.sim.player import KEY_LEFT, KEY_RIGHT, KEY_UP
from doomtpu.wad import synth


def main():
    B = int(os.environ.get("B", 256))
    # engine.rollout chains long rollouts as <=32-tick jitted scan
    # segments automatically (relay TPU workers kill single executions
    # over ~100 s), bit-identical to one long scan
    T = int(os.environ.get("T", 32))

    # any IWAD works (DoomEngine.from_wad("doom1.wad", "e1m1")); the
    # synthetic e1m1-scale level needs no game files
    engine = DoomEngine.from_wad_bytes(synth.e1m1_scale_wad(), "e1m1")
    key = jax.random.PRNGKey(0)
    state = engine.new_game(B, key=key)

    # a toy policy: every env walks forward, half turn left, half right
    turn = jnp.where(jnp.arange(B) % 2 == 0, KEY_LEFT, KEY_RIGHT)
    controls_seq = jnp.broadcast_to(
        (KEY_UP | turn)[None], (T, B)
    ).astype(jnp.int32)

    t0 = time.time()
    # live_reuse=True (TPU paint pipeline) reuses each segment's
    # first-tick traversal/compaction metadata for the rest of the
    # segment and returns a staleness counter — 0 proves frames are
    # bit-identical to the recompute-every-tick path (~+3% measured);
    # assert it like the drop counters:
    #   final_state, out, stale = engine.rollout(..., live_reuse=True)
    #   assert int(stale) == 0
    final_state, out = engine.rollout(
        state, controls_seq, key,
        # True: frames [T, B, H, W] stay on device (mind HBM at scale);
        # False: per-step checksums [T, B] (frames still rendered)
        return_frames=(B * T <= 1 << 14),
    )
    np.asarray(jax.tree_util.tree_leaves(out)[0].sum())  # force execution
    dt = time.time() - t0

    print(f"rollout: B={B} envs x T={T} ticks in {dt:.2f}s "
          f"({B * T / dt:,.0f} step+render frames/sec, incl. compile)")
    print(f"final positions (env 0): "
          f"{engine.player_position_json(final_state)}")
    # observations for an RL loop: palette-index frames + game state
    if out.ndim == 4:
        print(f"frames: {out.shape} palette indices, "
              f"{np.asarray(out[-1, 0] >= 0).mean() * 100:.0f}% written")


if __name__ == "__main__":
    main()
