"""Vectorized BSP point location (renderer/bsp.rs:9-44 equivalent).

Fixed-depth masked descent: every camera walks the node tree at once for
tree-height steps (known at load time), carrying the current node id; a
negative carry encodes the resolved subsector.  Used for player floor
height (game.rs:376-389) and anywhere else a point -> sector query is
needed on device.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from doomtpu.level.tables import NODE_IS_SUBSECTOR
from doomtpu.render.device import DeviceLevel
from doomtpu.render.jmath import I32, f32, is_left_of


def subsector_at(level: DeviceLevel, px, py):
    """[B] subsector index for each point."""
    max_depth = level.sub_path_nodes.shape[1]
    root = level.node_child.shape[0] - 1
    node = jnp.full(px.shape, root, I32)

    def body(_, node):
        resolved = node < 0
        n = jnp.maximum(node, 0)
        sx = level.node_xy[n, 0]
        sy = level.node_xy[n, 1]
        dx = level.node_dxy[n, 0]
        dy = level.node_dxy[n, 1]
        left = is_left_of(f32(px), f32(py), sx, sy, sx + dx, sy + dy)
        child = jnp.where(
            left, level.node_child[n, 1], level.node_child[n, 0]
        ) & 0xFFFF
        is_leaf = (child & NODE_IS_SUBSECTOR) != 0
        nxt = jnp.where(
            is_leaf, -(child & (NODE_IS_SUBSECTOR - 1)) - 1, child
        )
        return jnp.where(resolved, node, nxt)

    node = lax.fori_loop(0, max_depth, body, node)
    return jnp.where(node < 0, -node - 1, 0)


def sector_at(level: DeviceLevel, px, py):
    """[B] sector index (-1 if the subsector has no facing sidedef)."""
    ss = subsector_at(level, px, py)
    return level.sub_sector[ss]
