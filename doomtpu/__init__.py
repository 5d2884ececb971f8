"""doomtpu — a TPU-native batched Doom renderer & simulation framework in JAX.

A from-scratch rebuild of the capabilities of freewilll/doom-rust-renderer
(reference mounted read-only at /root/reference) designed TPU-first:

- WAD lumps load once into struct-of-arrays, device-resident tables
  (``doomtpu.level``, ``doomtpu.assets``).
- The recursive front-to-back BSP traversal becomes a data-parallel
  rank-and-argsort over per-node side bits (``doomtpu.render.order``).
- The sequential solid-seg occlusion clip becomes a ``lax.scan`` /
  Pallas kernel over the ordered seg list, carrying per-column occlusion
  state for B cameras at once and emitting a fixed-capacity span pool
  (``doomtpu.render.walls``).
- Wall columns / visplane spans / sky / sprites resolve per pixel from the
  span pool with texture-atlas gathers (``doomtpu.render.resolve``).
- The thinkers state machine (sector lights, animated flats, map-object
  states) is a pure jitted step function, so step+render rolls out under
  ``lax.scan`` for RL-style batched workloads (``doomtpu.sim``).
- Multi-chip scaling shards the camera batch over a ``jax.sharding.Mesh``
  (``doomtpu.parallel``).

Everything is shaped ``[B, ...]`` with B = number of cameras; B=1 is a
special case of the batch.
"""

__version__ = "0.1.0"

from doomtpu.config import RenderConfig  # noqa: F401
