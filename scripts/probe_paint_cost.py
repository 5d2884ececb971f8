#!/usr/bin/env python
"""Decompose the paint kernel's time: run stripped kernel variants over
the SAME grid/blocks at e1m1-scale shapes (B=256, G=736->Gp, NBW=3).

  empty     : init + outputs only (grid + block machinery)
  segcheck  : + per-seg seg_live computation (no body)
  noscan    : + occlusion/emit math, but NO paint calls
(compare with bench_paint_sweep's full-kernel number)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
TB, U, LANES = 8, 4, 128
B, G, H, W = 256, 736, 200, 320
NBW = 3
Gp = ((G + U - 1) // U) * U


def run(name, body_kind):
    def kernel(sv_ref, idx_out, hor_s, fo_s, co_s):
        gi = pl.program_id(2)

        @pl.when(gi == 0)
        def _init():
            hor_s[...] = jnp.zeros((TB, LANES), I32)
            fo_s[...] = jnp.full((TB, LANES), H, I32)
            co_s[...] = jnp.full((TB, LANES), -1, I32)

        wb = pl.program_id(1)
        xx = lax.broadcasted_iota(I32, (TB, LANES), 1) + wb * LANES

        if body_kind >= 1:
            for u_ in range(U):
                flags = sv_ref[0, u_, 3, :][:, None]
                x0i = sv_ref[0, u_, 1, :][:, None]
                x1i = sv_ref[0, u_, 2, :][:, None]
                act_any = (flags & 15) != 0
                seg_live = (
                    (xx >= x0i) & (xx <= x1i) & act_any & (hor_s[...] == 0)
                ).any()

                if body_kind >= 2:
                    @pl.when(seg_live)
                    def _seg(u_=u_, flags=flags, x0i=x0i, x1i=x1i):
                        hor = hor_s[...] != 0
                        fo = fo_s[...]
                        co = co_s[...]
                        covered = (xx >= x0i) & (xx <= x1i)
                        open_ = covered & ~hor
                        by = sv_ref[0, u_, 16, :][:, None] + xx
                        ty = sv_ref[0, u_, 24, :][:, None] - xx
                        cb = jnp.minimum(H - 1, jnp.minimum(fo, by))
                        ct = jnp.maximum(0, jnp.maximum(co, ty))
                        in_ver = (cb >= ct) & open_
                        solid_occl = covered & ((flags & 16) == 0)
                        hor_s[...] = (hor | solid_occl).astype(I32)
                        fo_s[...] = jnp.where(in_ver, cb, fo)
                        co_s[...] = jnp.where(in_ver, ct, co)

        @pl.when(gi == pl.num_programs(2) - 1)
        def _fin():
            idx_out[...] = jnp.broadcast_to(
                fo_s[...][:, None, :], (TB, H, LANES)
            )

    rng = np.random.default_rng(0)
    sv = jnp.asarray(rng.integers(0, 100, (B // TB, Gp, 44, TB), np.int32))
    out = pl.pallas_call(
        kernel,
        grid=(B // TB, NBW, Gp // U),
        in_specs=[pl.BlockSpec((1, U, 44, TB), lambda i, w, g: (i, g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_shape=jax.ShapeDtypeStruct((B, H, NBW * LANES), jnp.int32),
        out_specs=pl.BlockSpec((TB, H, LANES), lambda i, w, g: (i, 0, w),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TB, LANES), jnp.int32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 3
        ),
    )

    f = jax.jit(lambda x: out(x).sum())
    t0 = time.time()
    r = int(np.asarray(f(sv)))
    comp = time.time() - t0
    t0 = time.time()
    n = 10
    for _ in range(n):
        r = int(np.asarray(f(sv)))
    dt = (time.time() - t0) / n
    print(f"{name:10s} {dt * 1000:8.2f} ms  (compile {comp:.0f}s)",
          flush=True)


def main():
    run("empty", 0)
    run("segcheck", 1)
    run("occl", 2)


if __name__ == "__main__":
    main()
