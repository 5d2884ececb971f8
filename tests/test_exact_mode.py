"""Exact-TPU mode semantics (jmath.set_exact_tpu, VERDICT r4 #4).

On an IEEE backend, exact mode's pinned product
(reduce_precision(a*b, 8, 23)) must equal strict mode's
round-through-f64 product bit-for-bit: the f64 product of two f32s is
exact and reduce_precision applies the same f32 round-to-nearest-even
the hardware multiply already applied.  The mode's entire purpose is
blocking compiler contraction, not changing values — so on CPU the two
must agree everywhere, including subnormals/overflow/NaN.

The on-hardware divergence measurement (vs the 421-px fast baseline)
lives in scripts/probe_tpu_exactness.py with DOOMTPU_EXACT=1/2.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doomtpu.render import jmath


@pytest.fixture
def exact_mode():
    strict = jmath.strict_fp_enabled()
    jmath.set_strict_fp(False)
    jmath.set_exact_tpu(2)
    yield
    jmath.set_exact_tpu(0)
    jmath.set_strict_fp(strict)


def test_exact_smul_matches_strict(exact_mode):
    rng = np.random.default_rng(7)
    a = rng.uniform(-1e6, 1e6, 4096).astype(np.float32)
    b = rng.uniform(-1e6, 1e6, 4096).astype(np.float32)
    # edge cases: subnormal-producing, overflow, zero, inf, nan
    a = np.concatenate([a, np.float32([1e-30, 1e30, 0.0, np.inf, np.nan])])
    b = np.concatenate([b, np.float32([1e-30, 1e30, -0.0, 2.0, 1.0])])
    exact = np.asarray(jax.jit(jmath.smul)(a, b))
    jmath.set_exact_tpu(0)
    jmath.set_strict_fp(True)
    strict = np.asarray(jax.jit(jmath.smul)(a, b))
    np.testing.assert_array_equal(
        exact.view(np.int32), strict.view(np.int32)
    )


def test_exact_cos_sin_matches_strict(exact_mode):
    rng = np.random.default_rng(8)
    ang = rng.uniform(-10, 10, 512).astype(np.float32)
    ce, se = (np.asarray(v) for v in jmath.cos_sin(jnp.asarray(ang)))
    jmath.set_exact_tpu(0)
    jmath.set_strict_fp(True)
    cs, ss = (np.asarray(v) for v in jmath.cos_sin(jnp.asarray(ang)))
    np.testing.assert_array_equal(ce, cs)
    np.testing.assert_array_equal(se, ss)


def test_exact_mode_render_runs(demo_level, config):
    """The full XLA pipeline traces and runs under exact mode (the
    reduce_precision pins sit on every smul site)."""
    from doomtpu.render.device import DeviceLevel
    from doomtpu.render.frame import render_frame

    level = DeviceLevel.build(
        demo_level.tables, demo_level.assets, demo_level.info
    )
    t = demo_level.tables
    views = [(384.0, 256.0, 0.0), (900.0, 256.0, 2.5)]
    B = len(views)
    px = jnp.asarray([v[0] for v in views], jnp.float32)
    py = jnp.asarray([v[1] for v in views], jnp.float32)
    pa = jnp.asarray([v[2] for v in views], jnp.float32)
    fh = jnp.asarray(
        [float(t.sector_floor_h[t.sector_at(v[0], v[1])]) for v in views],
        jnp.float32,
    )
    sl = jnp.asarray(t.sector_light, jnp.int32)[None].repeat(B, 0)
    ts = jnp.zeros(B, jnp.float32)
    mp, ma, ms = demo_level.spawn_mobjs()
    mstate = jnp.asarray(ms, jnp.int32)[None].repeat(B, 0)

    strict = jmath.strict_fp_enabled()
    jmath.set_strict_fp(False)
    jmath.set_exact_tpu(1)
    try:
        idx, rgb, aux = render_frame(
            level, config, px, py, pa, fh, sl, mstate, ts
        )
        assert np.asarray(idx).shape == (B, config.height, config.width)
        assert int(np.asarray(aux["overflow"]).sum()) == 0
    finally:
        jmath.set_exact_tpu(0)
        jmath.set_strict_fp(strict)
