"""Multi-chip scaling: shard the camera/environment batch over a Mesh.

The workload is embarrassingly parallel per camera (SURVEY §2): map and
asset tables replicate to every chip; every [B, ...] state/frame array
shards along the single `env` mesh axis.  XLA's GSPMD partitioner then
runs the jitted step/render on each chip's slice with no collectives on
the hot path — ICI is only touched if the caller reduces across envs
(e.g. an aggregate-fps psum in benchmarks).

On one host this also covers the virtual-device CPU mesh used in tests
(xla_force_host_platform_device_count).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "env") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(tree, mesh: Mesh, axis: str = "env"):
    """Place every array with a leading batch axis on the mesh, sharded
    along that axis.  Batch sizes must divide the device count."""

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            spec = P(axis, *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return x

    return jax.tree_util.tree_map(place, tree)


def replicate(tree, mesh: Mesh):
    """Replicate map/asset constants to every device."""
    sharding = NamedSharding(mesh, P())

    def place(x):
        if hasattr(x, "ndim"):
            return jax.device_put(x, sharding)
        return x

    return jax.tree_util.tree_map(place, tree)
