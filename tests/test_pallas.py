"""Pallas wall-scan kernel parity on CPU (interpret mode).

The kernel (doomtpu/ops/pallas_scan.py) is the TPU fast path for the
occlusion scan; it must reproduce walls.wall_scan's span pool exactly.
The test runs in strict-FP mode (conftest default): the kernel uses
jmath.smul for every parity-critical product, so interpret-mode
bit-equality holds by construction rather than by both lowerings
happening to make the same FMA-contraction choice.  On TPU (strict
off) the only permitted deviation is FMA contraction (kernel header).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doomtpu.config import RenderConfig
from doomtpu.render import camera as cam
from doomtpu.render import jmath, walls
from doomtpu.wad import synth


def _pool_pair(level_obj, cfg, views):
    """Run both scan implementations on the same frame."""
    from doomtpu.ops import pallas_scan

    level = _device_level(level_obj)
    B = len(views)
    px = jnp.asarray([v[0] for v in views], jnp.float32)
    py = jnp.asarray([v[1] for v in views], jnp.float32)
    pa = jnp.asarray([v[2] for v in views], jnp.float32)
    t = level_obj.tables
    fh = jnp.asarray(
        [float(t.sector_floor_h[t.sector_at(v[0], v[1])]) for v in views],
        jnp.float32,
    )
    sl = jnp.asarray(t.sector_light, jnp.int32)[None].repeat(B, 0)
    ts = jnp.zeros(B, jnp.float32)

    frame = cam.build_seg_frame(level, cfg, px, py, pa, fh, sl, ts)
    rank = cam.traversal_rank(level, px, py)
    order = cam.seg_order(level, rank)

    ref_pool, ref_cnt, ref_ovf = walls.wall_scan(level, cfg, frame, order)
    pal_pool, pal_cnt, pal_ovf = pallas_scan.wall_scan_pallas(
        level, cfg, frame, order, interpret=True
    )
    return (ref_pool, ref_cnt, ref_ovf), (pal_pool, pal_cnt, pal_ovf)


def _device_level(level_obj):
    from doomtpu.render.device import DeviceLevel

    return DeviceLevel.build(level_obj.tables, level_obj.assets, level_obj.info)


@pytest.mark.parametrize("n_views", [8])
def test_pallas_scan_matches_lax_scan(demo_level, n_views):
    cfg = RenderConfig(span_capacity=16)
    t = demo_level.tables
    rng = np.random.default_rng(3)
    left, right, top, bottom = [float(v) for v in t.bbox]
    views = []
    while len(views) < n_views:
        x = rng.uniform(left, right)
        y = rng.uniform(top, bottom)
        s = t.sector_at(x, y)
        if s >= 0 and t.sector_floor_h[s] < t.sector_ceil_h[s]:
            views.append((x, y, rng.uniform(0, 2 * np.pi)))
    (rp, rc, ro), (pp, pc, po) = _pool_pair(demo_level, cfg, views)
    np.testing.assert_array_equal(np.asarray(rc), np.asarray(pc))
    np.testing.assert_array_equal(np.asarray(ro), np.asarray(po))
    np.testing.assert_array_equal(np.asarray(rp[0]), np.asarray(pp[0]))
    for d_ref, d_pal in zip(rp[1], pp[1]):
        np.testing.assert_array_equal(np.asarray(d_ref), np.asarray(d_pal))
