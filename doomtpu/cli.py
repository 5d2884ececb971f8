"""Command-line shell, mirroring the reference binary's flags (main.rs:29-54)
plus headless/batch extensions.

Reference flags:
    --map        map name (default e1m1)
    --wad        WAD file path (default doom1.wad)
    --turbo      movement speed percent (default 100)
    --print-fps  print rolling-average FPS per frame
    --print-player-position   print the re-runnable --player-position JSON
    --player-position '<json>'  spawn the camera at a given pose

Extensions (TPU-native batch workflow):
    --synth demo|two|single   use a built-in synthetic IWAD (no WAD needed)
    --batch N     number of parallel cameras/environments
    --steps N     headless: run N ticks then exit
    --out PATH    write the final frame (env 0) as PNG (or .npy batch dump)
    --walk        headless demo controls (walk forward, turning)
    --map-view    render the 2D overhead map instead of the 3D view
    --viewer      interactive pygame window (if pygame is installed)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="doomtpu", description=__doc__)
    ap.add_argument("-m", "--map", default="e1m1")
    ap.add_argument("-w", "--wad", default="doom1.wad")
    ap.add_argument("-t", "--turbo", type=int, default=100)
    ap.add_argument("--print-fps", action="store_true")
    ap.add_argument("--print-player-position", action="store_true")
    ap.add_argument("--player-position", default=None)
    ap.add_argument("--synth", choices=["demo", "two", "single"], default=None)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=35)
    ap.add_argument("--out", default=None)
    ap.add_argument("--walk", action="store_true")
    ap.add_argument("--map-view", action="store_true")
    ap.add_argument("--viewer", action="store_true")
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from doomtpu.config import RenderConfig
    from doomtpu.engine import Clock, DoomEngine
    from doomtpu.sim.player import KEY_LEFT, KEY_UP

    cfg = RenderConfig(width=args.width, height=args.height)

    if args.synth:
        from doomtpu.wad import synth

        data = {
            "demo": synth.demo_wad, "two": synth.two_room_wad,
            "single": synth.single_room_wad,
        }[args.synth]()
        engine = DoomEngine.from_wad_bytes(
            data, args.map, config=cfg, turbo=args.turbo / 100.0
        )
    else:
        try:
            engine = DoomEngine.from_wad(
                args.wad, args.map, config=cfg, turbo=args.turbo / 100.0,
                require_iwad=True,
            )
        except FileNotFoundError:
            print(
                f"WAD not found: {args.wad}; use --synth demo for the "
                "built-in level", file=sys.stderr,
            )
            return 2

    key = jax.random.PRNGKey(args.seed)
    pos = angle = None
    if args.player_position:
        op = json.loads(args.player_position)
        pos = np.tile(
            [[op["position"]["x"], op["position"]["y"]]], (args.batch, 1)
        )
        angle = np.full(args.batch, op["angle"], np.float32)
    state = engine.new_game(args.batch, key=key, pos=pos, angle=angle)

    if args.viewer:
        from doomtpu.viewer import run_viewer

        return run_viewer(engine, state, print_fps=args.print_fps)

    controls = jnp.zeros(args.batch, jnp.int32)
    if args.walk:
        controls = jnp.full(args.batch, KEY_UP | KEY_LEFT, jnp.int32)

    clock = Clock()
    idx = rgb = None
    for i in range(args.steps):
        t0 = time.time()
        idx, rgb = engine.render(state)
        jax.block_until_ready(rgb)
        state = engine.tick(state, controls, jax.random.fold_in(key, i))
        clock.add_elapsed_interval(time.time() - t0)
        if args.print_fps:
            print(f"FPS {clock.fps() * args.batch:.1f}")
        if args.print_player_position:
            print(f"--player-position '{engine.player_position_json(state)}'")

    if args.out:
        if args.map_view:
            img = engine.map_2d(state)
        else:
            from doomtpu.utils.color import unpack_rgb

            img = unpack_rgb(rgb[0])
        if args.out.endswith(".npy"):
            np.save(args.out, np.asarray(rgb))
        else:
            from PIL import Image

            Image.fromarray(img).save(args.out)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
