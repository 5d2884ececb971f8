"""Rust-exact integer cast / wrap semantics, for NumPy and JAX alike.

The reference renderer leans on Rust numeric conversions everywhere
(`x as i16`, `%`, `/` on integers).  Bit-exact parity requires reproducing:

- float -> int casts truncate toward zero and SATURATE at the type bounds
  (Rust semantics; e.g. renderer/segs.rs:205-209, bitmap_render.rs:242-263).
- integer `/` truncates toward zero, `%` takes the dividend's sign
  (used by the texture wrap idiom `t += size * (1 - t / size); t %= size`,
  bitmap_render.rs:244-248, 253-263).

NumPy's `astype` wraps instead of saturating and `//`/`%` floor, so these
helpers exist.  They dispatch on the array module (`np` or `jnp`) so the
NumPy spec renderer and the JAX renderer share one definition.
"""

import numpy as np


def _xp(x):
    # jax arrays expose .aval; fall back to numpy
    if type(x).__module__.startswith("jax"):
        import jax.numpy as jnp

        return jnp
    return np


def as_int_sat(x, dtype, out_dtype=None):
    """`x as iN` for a float/int input: trunc toward zero, saturating.

    Returns `out_dtype` (defaults to int32) holding values limited to the
    range of `dtype`, so follow-on arithmetic can't overflow.
    """
    xp = _xp(x)
    info = np.iinfo(dtype)
    out_dtype = out_dtype or np.int32
    x = xp.trunc(x) if xp.issubdtype(xp.asarray(x).dtype, xp.floating) else x
    x = xp.clip(x, info.min, info.max)
    return xp.asarray(x).astype(out_dtype)


def as_i16(x):
    """Rust `x as i16` (saturating trunc), carried as int32."""
    return as_int_sat(x, np.int16)


def as_i32(x):
    return as_int_sat(x, np.int32)


def div_trunc(a, b):
    """Integer division truncating toward zero (Rust/C `/`)."""
    xp = _xp(a)
    q = xp.floor_divide(xp.abs(a), xp.abs(b))
    return xp.where((a < 0) ^ (b < 0), -q, q)


def rem_trunc(a, b):
    """Integer remainder with the dividend's sign (Rust/C `%`)."""
    return a - div_trunc(a, b) * b


def wrap_texcoord(t, size):
    """The reference's texture wrap idiom for possibly-negative coords.

    Mirrors bitmap_render.rs:244-248 (and :259-263):
        if t < 0 { t += size * (1 - t / size) }
        t %= size
    with Rust trunc-division semantics.  `t` and `size` are integers.
    """
    xp = _xp(t)
    t_neg = t + size * (1 - div_trunc(t, size))
    t = xp.where(t < 0, t_neg, t)
    return rem_trunc(t, size)
