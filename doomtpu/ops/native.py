"""ctypes bindings to the native (C++) asset decoder.

The reference's entire runtime is native Rust; here the JAX/XLA compute
path covers rendering, and load-time hot spots (decoding hundreds of
picture lumps per WAD) go through native/doomdec.cpp when built.  Every
entry point degrades gracefully to the pure-NumPy implementation.

Build with `make -C native` (see native/Makefile); the .so is searched
next to the source tree and via $DOOMTPU_NATIVE.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    candidates = []
    if os.environ.get("DOOMTPU_NATIVE"):
        candidates.append(os.environ["DOOMTPU_NATIVE"])
    root = Path(__file__).resolve().parents[2]
    candidates.append(str(root / "native" / "libdoomdec.so"))
    for c in candidates:
        if os.path.exists(c):
            try:
                lib = ctypes.CDLL(c)
                lib.doomdec_picture.restype = ctypes.c_int
                lib.doomdec_picture.argtypes = [
                    ctypes.c_char_p, ctypes.c_size_t,
                    ctypes.c_int, ctypes.c_int,
                    ctypes.c_char_p, ctypes.c_char_p,
                ]
                _lib = lib
                break
            except OSError:
                continue
    return _lib


def available() -> bool:
    return _load() is not None


def decode_picture(raw: np.ndarray, w: int, h: int):
    """Native picture decode; returns (pixels, mask) or None if unavailable."""
    lib = _load()
    if lib is None or w <= 0 or h <= 0:
        return None
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    pixels = np.zeros((h, w), dtype=np.uint8)
    mask = np.zeros((h, w), dtype=np.uint8)
    rc = lib.doomdec_picture(
        raw.ctypes.data_as(ctypes.c_char_p), raw.nbytes, w, h,
        pixels.ctypes.data_as(ctypes.c_char_p),
        mask.ctypes.data_as(ctypes.c_char_p),
    )
    if rc != 0:
        return None
    return pixels, mask.astype(bool)
