"""Camera-sort helpers shared by engine renders and sim rollouts.

Cameras are Morton-sorted (coarse region, angle bucket, fine position)
before rendering so the paint kernel's 8-camera tiles see overlapping
geometry, and unsorted after — a pure reorder, bit-identical outputs.
Key order matters: angle above fine position (measured on the e1m1
fixture: 22984 -> 15727 live-seg visits vs 21280 for an angle-last key).

Under an `env`-sharded mesh the sort runs WITHIN each shard: a global
argsort + batch gather would be an all-to-all reshuffle on the hot
path, and the permutation only affects kernel tile coherence, never
output values.  `sort_shards` reads the shard count eagerly (outside
jit); `sort_state`/`unsort_out` express the permutation as a
take_along_axis on the unsharded local axis of a [S, B/S, ...] view,
which GSPMD partitions with no communication.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def camera_sort_key(pos, angle):
    """Morton key [B] from pos [B, 2] / angle [B].

    DOOMTPU_SORT_ABITS / DOOMTPU_SORT_FBITS override the angle-bucket
    and fine-position bit widths for coherence A/Bs (sweep #23 —
    the B=4096 scaling win showed tile coherence is still a lever).
    With both unset the key layout is bit-for-bit the round-2 one, so
    every measured number stays comparable.  Any key is output-exact
    (the permutation only affects kernel tile coherence)."""
    import os as _os

    x = jnp.asarray(pos[:, 0], jnp.float32)
    y = jnp.asarray(pos[:, 1], jnp.float32)

    def spread(v):  # interleave 8 bits with zeros
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    def morton(xq, yq):
        return spread(xq) | (spread(yq) << 1)

    xr = (x * (1.0 / 1024.0)).astype(jnp.int32) & 0x3F
    yr = (y * (1.0 / 1024.0)).astype(jnp.int32) & 0x3F
    abits = _os.environ.get("DOOMTPU_SORT_ABITS")
    fbits = _os.environ.get("DOOMTPU_SORT_FBITS")
    if abits is None and fbits is None:
        aq = (
            jnp.asarray(angle, jnp.float32) * (4.0 / np.pi)
        ).astype(jnp.int32) & 7
        xf = (x * 0.015625).astype(jnp.int32) & 0xF
        yf = (y * 0.015625).astype(jnp.int32) & 0xF
        return (morton(xr, yr) << 16) | (aq << 13) | morton(xf, yf)
    ab = int(abits) if abits is not None else 3
    fb = int(fbits) if fbits is not None else 4
    aq = (
        jnp.asarray(angle, jnp.float32) * ((1 << ab) / (2.0 * np.pi))
    ).astype(jnp.int32) & ((1 << ab) - 1)
    # fine cell = 64 world units at fb=4 (matches the default scale)
    fscale = (1 << fb) / 1024.0
    xf = (x * fscale).astype(jnp.int32) & ((1 << fb) - 1)
    yf = (y * fscale).astype(jnp.int32) & ((1 << fb) - 1)
    return (
        (morton(xr, yr) << (16 + ab + 2 * fb - 11))
        | (aq << (2 * fb)) | morton(xf, yf)
    )


def sort_shards(state) -> int:
    """Number of shards along the batch axis of `state` (1 if
    unsharded / unknown).  Read eagerly, OUTSIDE jit."""
    try:
        pos = state.pos
        rows = pos.sharding.shard_shape(pos.shape)[0]
        if rows > 0 and pos.shape[0] % rows == 0:
            return pos.shape[0] // rows
    except Exception:
        pass
    return 1


def sort_state(state, B: int, S: int, loc=None):
    """Sort cameras by Morton key within each of S contiguous shard
    groups.  Returns (sorted_state, loc [S, B/S] local permutation).

    Pass a previous call's `loc` to reuse its permutation (cross-tick
    live-list reuse: the compaction metadata lives in sorted camera
    space, so every tick of a reuse window must sort with the SAME
    permutation — any fixed permutation is output-correct, only tile
    coherence decays as poses move)."""
    if loc is None:
        key = camera_sort_key(state.pos, state.angle)
        loc = jnp.argsort(key.reshape(S, B // S), axis=1).astype(jnp.int32)

    def apply(x):
        x2 = x.reshape((S, B // S) + x.shape[1:])
        idx = loc.reshape(loc.shape + (1,) * (x.ndim - 1))
        return jnp.take_along_axis(x2, idx, axis=1).reshape(x.shape)

    return jax.tree_util.tree_map(apply, state), loc


def unsort_out(out, loc, B: int, S: int):
    inv = jnp.argsort(loc, axis=1).astype(jnp.int32)

    def apply(x):
        x2 = x.reshape((S, B // S) + x.shape[1:])
        idx = inv.reshape(inv.shape + (1,) * (x.ndim - 1))
        return jnp.take_along_axis(x2, idx, axis=1).reshape(x.shape)

    return jax.tree_util.tree_map(apply, out)
