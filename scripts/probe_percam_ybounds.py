#!/usr/bin/env python
"""Measure the per-camera y-bounds MECHANISM cost in a Pallas kernel.

The footprint census (PERF.md round-4) says the paint kernel's
tile-union y-block loops process ~31x the painted pixels (5.9x at
per-camera bounds), but warned that per-camera bounds need a cheaper
mechanism than 16 full vector->scalar reductions per emission (the
~2.4 us/seg PAINT_SEGWHEN cost class).  Sweep #12 then killed the
store-only-deferral alternative, so this mechanism is the ONLY live
lever on that wall.  This probe times, per grid step (= per emission),
over a synthetic S-step grid:

  empty    grid machinery only
  union    today's _ybounds: 2 full (8,128)->scalar reductions + ONE
           shared fori over the union y-range, trivial body
  percam   2 lane-axis reduces to (8,1), ONE VMEM scratch store each,
           2*TB scalar reads, shared fori over the union range with a
           per-camera `pl.when` skip of out-of-range y-blocks
  percamS  percam but with per-camera serial foris (no shared loop,
           bounds used directly as trip counts)

The deltas vs `union` price the mechanism; the body is a store of a
masked constant so skipped y-blocks measurably skip work.  Inputs are
random masks whose per-camera y-ranges mimic the census (union ~5x
looser than per-camera).

Run on TPU:  python scripts/probe_percam_ybounds.py     (S=4096)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

LANES = 128
TB = 8
H = 200
NYB = H // 8 + 1

I32 = jnp.int32


def _bodywork(out_ref, b, yb, vlo):
    ys = pl.ds(pl.multiple_of(yb * 8, 8), 8)
    out_ref[b, ys, :] = out_ref[b, ys, :] + vlo


def make_kernel(mode):
    def kernel(lo_ref, hi_ref, out_ref, scr_ref):
        lo_v = lo_ref[0]                                 # (TB, LANES)
        hi_v = hi_ref[0]
        if mode == "empty":
            # vector store: scalar stores to VMEM do not lower on
            # hardware ("Cannot store scalars to VMEM", sweep #13)
            out_ref[0, 0:8, :] = out_ref[0, 0:8, :] + lo_v[0:8, :]
            return
        if mode == "union":
            ylo = jnp.min(lo_v)
            yhi = jnp.max(hi_v)
            yb_lo = jnp.maximum(ylo, 0) // 8
            yb_hi = jnp.minimum(yhi, H - 1) // 8 + 1

            @pl.when(yb_lo < yb_hi)
            def _():
                for b in range(TB):
                    def body(yb, c, b=b):
                        _bodywork(out_ref, b, yb, 1)
                        return c
                    lax.fori_loop(yb_lo, yb_hi, body, 0)
            return
        if mode == "percamR":
            # fallback mechanism: 2*TB full vector->scalar reductions,
            # all issued back-to-back so the sync stalls overlap (the
            # PERF.md reduction-batching lesson); prices the "16 full
            # reduces" route the census assumed too slow
            sub = lax.broadcasted_iota(I32, (TB, LANES), 0)
            plos = [jnp.min(jnp.where(sub == b, lo_v, H))
                    for b in range(TB)]
            phis = [jnp.max(jnp.where(sub == b, hi_v, -1))
                    for b in range(TB)]
            los = [jnp.maximum(v, 0) // 8 for v in plos]
            his = [jnp.minimum(v, H - 1) // 8 + 1 for v in phis]
        else:
            # per-camera bounds: ONE lanes-axis reduce pair to (TB, 1),
            # one VMEM scratch round trip, 2*TB scalar reads
            plo = jnp.min(lo_v, axis=1, keepdims=True)       # (TB, 1)
            phi = jnp.max(hi_v, axis=1, keepdims=True)
            scr_ref[:, 0:1] = plo
            scr_ref[:, 1:2] = phi
            los = [jnp.maximum(scr_ref[b, 0], 0) // 8 for b in range(TB)]
            his = [jnp.minimum(scr_ref[b, 1], H - 1) // 8 + 1
                   for b in range(TB)]
        if mode in ("percamS", "percamR"):
            for b in range(TB):
                @pl.when(los[b] < his[b])
                def _(b=b):
                    def body(yb, c, b=b):
                        _bodywork(out_ref, b, yb, 1)
                        return c
                    lax.fori_loop(los[b], his[b], body, 0)
            return
        # percam: shared union fori + per-camera pl.when skip
        yb_lo = los[0]
        yb_hi = his[0]
        for b in range(1, TB):
            yb_lo = jnp.minimum(yb_lo, los[b])
            yb_hi = jnp.maximum(yb_hi, his[b])

        @pl.when(yb_lo < yb_hi)
        def _():
            def body(yb, c):
                for b in range(TB):
                    @pl.when((yb >= los[b]) & (yb < his[b]))
                    def _(b=b, yb=yb):
                        _bodywork(out_ref, b, yb, 1)
                return c
            lax.fori_loop(yb_lo, yb_hi, body, 0)
    return kernel


def main():
    S = int(os.environ.get("S", 4096))
    rng = np.random.default_rng(0)
    # census-like ranges: each camera covers ~12 rows somewhere on the
    # screen; the tile union spans most of it (~5x looser)
    base = rng.integers(0, H - 24, size=(S, TB, 1))
    lo = np.broadcast_to(base, (S, TB, LANES)).astype(np.int32).copy()
    hi = (lo + rng.integers(8, 24, size=(S, TB, LANES))).astype(np.int32)
    lo_d = jnp.asarray(lo)
    hi_d = jnp.asarray(np.minimum(hi, H - 1))

    def run(mode):
        f = pl.pallas_call(
            make_kernel(mode),
            grid=(S,),
            in_specs=[
                pl.BlockSpec((1, TB, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TB, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=jax.ShapeDtypeStruct((TB, H, LANES), jnp.int32),
            out_specs=pl.BlockSpec((TB, H, LANES), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((TB, LANES), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=os.environ.get("INTERP", "0") != "0",
        )
        jf = jax.jit(f)
        t0 = time.time()
        r = jf(lo_d, hi_d)
        cs = int(np.asarray(r.sum()))
        comp = time.time() - t0
        t0 = time.time()
        n = 8
        for _ in range(n):
            r = jf(lo_d, hi_d)
        cs = int(np.asarray(r.sum()))
        dt = (time.time() - t0) / n
        print(f"{mode:8s} {dt * 1e6 / S:8.3f} us/step  "
              f"(total {dt * 1e3:.2f} ms, compile {comp:.0f}s, cs={cs})",
              flush=True)
        return dt / S

    print(f"S={S} TB={TB} H={H} backend={jax.default_backend()}",
          flush=True)
    te = run("empty")
    tu = run("union")
    tp = run("percam")
    ts = run("percamS")
    tr = run("percamR")
    print(f"mechanism delta percam-union:  {(tp - tu) * 1e6:+.3f} us/emission",
          flush=True)
    print(f"mechanism delta percamS-union: {(ts - tu) * 1e6:+.3f} us/emission",
          flush=True)
    print(f"mechanism delta percamR-union: {(tr - tu) * 1e6:+.3f} us/emission",
          flush=True)
    print("NOTE union runs the union trip count; percam runs the same "
          "trips but skips per-camera out-of-range bodies — a NEGATIVE "
          "delta means the mechanism already pays for itself at these "
          "synthetic ranges.", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
