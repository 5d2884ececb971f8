"""CLI shell smoke tests (reference flags main.rs:29-54 + extensions).

Headless in-process runs on the synthetic demo IWAD at a small
resolution; the render path itself is covered pixel-exactly elsewhere —
these assert the shell wiring: flag parsing, spawn override, the
re-runnable --print-player-position output, batch .npy dump, and the
missing-WAD exit code.
"""

import json

import numpy as np
import pytest

from doomtpu.cli import main


def test_cli_headless_npy(tmp_path, capsys):
    out = tmp_path / "frames.npy"
    rc = main([
        "--synth", "demo", "--batch", "2", "--steps", "2",
        "--width", "64", "--height", "48", "--walk", "--out", str(out),
    ])
    assert rc == 0
    frames = np.load(out)
    assert frames.shape == (2, 48, 64)
    assert (frames != 0).any()
    assert "wrote" in capsys.readouterr().out


def test_cli_player_position_round_trip(capsys):
    spawn = {"position": {"x": 384.0, "y": 256.0}, "angle": 1.5}
    rc = main([
        "--synth", "demo", "--batch", "1", "--steps", "1",
        "--width", "64", "--height", "48",
        "--player-position", json.dumps(spawn),
        "--print-player-position",
    ])
    assert rc == 0
    line = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("--player-position")
    ][-1]
    echoed = json.loads(line.split("'", 1)[1].rstrip("'"))
    # one tick of standing still: x/y unchanged, angle preserved
    assert echoed["position"]["x"] == pytest.approx(384.0)
    assert echoed["position"]["y"] == pytest.approx(256.0)
    assert echoed["angle"] == pytest.approx(1.5, abs=1e-5)


def test_cli_missing_wad_exit_code(capsys):
    rc = main(["--wad", "/nonexistent/nowhere.wad", "--steps", "1"])
    assert rc == 2
    assert "WAD not found" in capsys.readouterr().err
