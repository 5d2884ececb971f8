"""JAX math helpers with Rust-exact cast/wrap semantics (vectorized).

Mirror of doomtpu.render.spec's scalar helpers: `as iN` casts truncate
toward zero and saturate (NaN -> 0); integer div/rem truncate toward zero;
the texture wrap idiom follows bitmap_render.rs:244-248.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

F32 = jnp.float32
I32 = jnp.int32

# Strict-FP mode: XLA's backends contract f32 mul+add chains into FMAs
# (extra internal precision), which flips truncation results at span
# boundaries relative to the reference's strict f32 arithmetic.  With
# strict mode on (used by the CPU parity tests; requires jax_enable_x64),
# parity-critical multiplies round through f64 — the product of two f32s
# is exact in f64, and the explicit f32 demotion blocks contraction.
_STRICT_FP = False

# Exact-TPU mode (round-5, VERDICT r4 #4): the v5e has no f64, so the
# strict path cannot run there; the TPU fast path measured 421/512k px
# off the oracle (probe_tpu_exactness), attributed to the shared XLA
# fast-path f32 choices (FMA contraction / excess precision), not the
# kernels.  Exact mode blocks exactly that: every parity-critical
# product is pinned with lax.reduce_precision(p, 8, 23) — numerically
# the identity on an IEEE-rounded f32 product, but an explicit bit-level
# op neither XLA nor Mosaic elides, so the product materializes at f32
# and cannot contract into a neighboring add.  Levels:
#   1 = pinned products only (pure device code, kernel-safe)
#   2 = + cos/sin through host libm via pure_callback (XLA:TPU trig
#       differs by ULPs) — requires host-callback support on the
#       backend; cos_sin is only ever called on [B] camera angles
#       outside the kernels, so the cost is one tiny round trip/frame
# Residual (documented, measured by the probe): f32 divide/sqrt on TPU
# are not guaranteed correctly rounded; if the probe still shows
# boundary flips at level 2, those are the remaining source.
_EXACT_TPU = 0


def set_strict_fp(enabled: bool) -> None:
    global _STRICT_FP
    _STRICT_FP = bool(enabled)


def strict_fp_enabled() -> bool:
    return _STRICT_FP


def set_exact_tpu(level: int) -> None:
    global _EXACT_TPU
    _EXACT_TPU = int(level)


def exact_tpu_enabled() -> int:
    return _EXACT_TPU


def f32(x):
    return jnp.asarray(x, F32)


def smul(a, b):
    """f32 multiply with strict (non-contractable) rounding in parity mode.

    The optimization barrier stops XLA's algebraic simplifier from
    undoing the widen-multiply-narrow pattern (and then contracting the
    multiply into an FMA with a neighboring add).
    """
    if _STRICT_FP:
        # the product of two f32s is exact in f64; reduce_precision then
        # applies true f32 round-to-nearest-even as an explicit bit-level
        # op that no backend elides (plain f64->f32 converts can keep
        # excess precision through a following add on XLA:CPU)
        prod = jnp.asarray(a, jnp.float64) * jnp.asarray(b, jnp.float64)
        prod = lax.reduce_precision(prod, exponent_bits=8, mantissa_bits=23)
        return prod.astype(F32)
    if _EXACT_TPU:
        # f32 multiply is IEEE-rounded on the VPU; reduce_precision is
        # numerically the identity here but pins the rounded product so
        # the compiler cannot contract it into an FMA or keep excess
        # precision into the consumer (the 421-px divergence class)
        return lax.reduce_precision(
            f32(a) * f32(b), exponent_bits=8, mantissa_bits=23
        )
    return f32(a) * f32(b)


def as_i16(x):
    """Rust `as i16` on f32: trunc toward zero, saturate, NaN->0 (as i32)."""
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.floating):
        x = jnp.where(jnp.isnan(x), 0.0, x)
        x = jnp.clip(jnp.trunc(x), -32768.0, 32767.0)
    else:
        x = jnp.clip(x, -32768, 32767)
    return x.astype(I32)


def as_i32(x):
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.floating):
        x = jnp.where(jnp.isnan(x), 0.0, x)
        x = jnp.clip(jnp.trunc(x), -(2.0**31), 2.0**31 - 1)
    return x.astype(I32)


def div_trunc(a, b):
    q = jnp.abs(a) // jnp.abs(b)
    return jnp.where((a < 0) ^ (b < 0), -q, q)


def rem_trunc(a, b):
    return a - div_trunc(a, b) * b


def wrap_tex(t, size, pow2: bool = False):
    """if t < 0 { t += size * (1 - t / size) }; t %= size  (trunc div).

    With pow2=True (static, when every possible `size` is a power of
    two), the whole idiom reduces exactly to t & (size - 1) — the
    reference wrap always lands in [0, size) like a mathematical mod.
    """
    if pow2:
        return t & (size - 1)
    t_neg = t + size * (1 - div_trunc(t, size))
    t = jnp.where(t < 0, t_neg, t)
    return rem_trunc(t, size)


def cos_sin(angle):
    """f32 cos/sin; strict mode routes through host libm so results are
    bit-identical to the NumPy oracle (XLA's vector trig differs by ULPs,
    which flips truncations at span boundaries)."""
    angle = f32(angle)
    if _STRICT_FP or _EXACT_TPU >= 2:
        import jax
        import numpy as np

        shape = jax.ShapeDtypeStruct(jnp.shape(angle), F32)
        c = jax.pure_callback(
            lambda a: np.cos(a, dtype=np.float32), shape, angle,
            vmap_method="broadcast_all",
        )
        s = jax.pure_callback(
            lambda a: np.sin(a, dtype=np.float32), shape, angle,
            vmap_method="broadcast_all",
        )
        return c, s
    return jnp.cos(angle), jnp.sin(angle)


def rotate(x, y, angle):
    """map/vertexes.rs:20-25 (f32 trig)."""
    c, s = cos_sin(angle)
    return smul(x, c) - smul(y, s), smul(y, c) + smul(x, s)


def cross(ax, ay, bx, by):
    return smul(ax, by) - smul(ay, bx)


def is_left_of(px, py, sx, sy, ex, ey):
    """vertexes.rs:32-34: cross(p - s, e - s) <= 0."""
    return cross(px - sx, py - sy, ex - sx, ey - sy) <= 0.0


def stable_positions(key, size_cutoff: int | None = None):
    """Ascending stable-sort position of each element along axis 1.

    Equals the position a stable argsort on (key, index) would assign.
    Small axes use an O(I^2) fused compare-reduce (pure VPU work — XLA
    sorts lower to O(n log^2 n) bitonic passes on TPU, slower at these
    sizes); large axes fall back to the double stable argsort, because
    the compare-reduce's [B, I, I] operand is quadratic in memory
    (~1 GB of bool at I=2048, B=256).  Both are exact.
    DOOMTPU_STABLEPOS_CUTOFF overrides the crossover for A/B (0 forces
    the double argsort everywhere)."""
    if size_cutoff is None:
        import os as _os

        size_cutoff = int(_os.environ.get("DOOMTPU_STABLEPOS_CUTOFF", 768))
    B, I = key.shape
    if I <= size_cutoff:
        ii = jnp.arange(I, dtype=I32)
        before = (key[:, None, :] < key[:, :, None]) | (
            (key[:, None, :] == key[:, :, None])
            & (ii[None, None, :] < ii[None, :, None])
        )                                                    # [B, I, I]
        return before.sum(-1).astype(I32)
    order = jnp.argsort(key, axis=1, stable=True)
    return jnp.argsort(order, axis=1, stable=True).astype(I32)
