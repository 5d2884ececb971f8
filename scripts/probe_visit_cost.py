#!/usr/bin/env python
"""Measure per-construct costs inside a Mosaic kernel on this TPU.

The paint kernel's per-live-seg-visit cost is ~3.6 us (~3500 cycles);
this probe times kernels that repeat one suspect construct N times so
the per-iteration cost of each is isolated:

  math     - 32 chained (8,128) vector int ops (baseline ALU rate)
  branch   - pl.when(vec.any()) around 4 vector ops
  relayout - (TB,) lane-vector load + [:, None] sublane broadcast
  dynload  - dynamic sublane-index window load (texq pattern)
  smem     - 8 SMEM scalar reads + full-vreg select chain
  fori0    - lax.fori_loop with 0 dynamic trips (empty while)

Run on TPU: python scripts/probe_visit_cost.py
"""
import functools, os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax, jax.numpy as jnp, numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
N = 40000


def run(name, kernel, *inputs, in_specs=None):
    f = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=in_specs or [
            pl.BlockSpec(x.shape, lambda i, nd=x.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM) for x in inputs
        ],
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    g = jax.jit(lambda *a: f(*a).sum())
    t0 = time.time(); cs = int(np.asarray(g(*inputs))); comp = time.time() - t0
    # ONE host fetch for the whole timed loop: a per-call fetch measures
    # the ~30 ms relay roundtrip, not the kernel (see probe_n)
    t0 = time.time()
    outs = [g(*inputs) for _ in range(8)]
    cs = int(np.asarray(sum(o for o in outs)))
    dt = (time.time() - t0) / 8
    print(f"{name:10s} {dt*1e6:9.1f} us total  {dt/N*1e9:8.1f} ns/iter  "
          f"(compile {comp:.0f}s)", flush=True)


def k_math(x_ref, o_ref):
    def body(i, acc):
        for _ in range(32):
            acc = (acc * 3) ^ (acc >> 1)
        return acc
    o_ref[...] = lax.fori_loop(0, N, body, x_ref[...])


def k_branch(x_ref, o_ref):
    o_ref[...] = x_ref[...]
    def body(i, acc):
        @pl.when(((x_ref[...] + i) & 1).any())
        def _():
            o_ref[...] = o_ref[...] + 1
        return acc
    lax.fori_loop(0, N, body, 0)


def k_relayout(x_ref, o_ref):
    # x: (1, 64, 8): load row (8,) in lanes, transpose to sublanes
    def body(i, acc):
        v = x_ref[0, i & 63, :][:, None]
        return acc + v
    o_ref[...] = lax.fori_loop(
        0, N, body, jnp.zeros((8, 128), I32))


def k_dynload(x_ref, o_ref):
    # x: (512, 128): dynamic sublane-block window load
    def body(i, acc):
        t = x_ref[pl.ds(pl.multiple_of(((i * 37) & 63) * 8, 8), 8), :]
        return acc + t
    o_ref[...] = lax.fori_loop(0, N, body, jnp.zeros((8, 128), I32))


def k_smem(s_ref, o_ref):
    sub8 = lax.broadcasted_iota(I32, (8, 128), 0)
    def body(i, acc):
        v = jnp.full((8, 128), s_ref[0, i & 63], I32)
        for b in range(1, 8):
            v = jnp.where(sub8 == b, s_ref[b, i & 63], v)
        return acc + v
    o_ref[...] = lax.fori_loop(0, N, body, jnp.zeros((8, 128), I32))


def k_fori0(x_ref, o_ref):
    def body(i, acc):
        acc2 = lax.fori_loop(i, i, lambda j, c: c + 1, acc)
        return acc2
    o_ref[...] = jnp.full((8, 128), lax.fori_loop(0, N, body, 0), I32)


def main():
    print(f"backend: {jax.default_backend()}  N={N}", flush=True)
    x = jnp.ones((8, 128), I32)
    run("math", k_math, x)
    run("branch", k_branch, x)
    xr = jnp.ones((1, 64, 8), I32)
    run("relayout", k_relayout, xr)
    xd = jnp.ones((512, 128), I32)
    run("dynload", k_dynload, xd)
    xs = jnp.ones((8, 64), I32)
    run("smem", k_smem, xs, in_specs=[
        pl.BlockSpec((8, 64), lambda i: (0, 0), memory_space=pltpu.SMEM)
    ])
    run("fori0", k_fori0, x)


if __name__ == "__main__":
    main()


# --- v2 probes: transposed seg-block load + lane broadcasts ---------------

def k_colbcast(x_ref, o_ref):
    # x: (1, 64, 8, 128): one (8,128) window load per iteration, then 13
    # fields as (8,1) static-lane-offset slices broadcast over lanes
    def body(i, acc):
        w = x_ref[0, i & 63]
        for r in range(13):
            acc = acc + jnp.broadcast_to(w[:, r:r + 1], (8, 128))
        return acc
    o_ref[...] = lax.fori_loop(0, N, body, jnp.zeros((8, 128), I32))


def k_branch_false(x_ref, o_ref):
    # pl.when that never fires (skip cost only)
    o_ref[...] = x_ref[...]
    def body(i, acc):
        @pl.when((x_ref[...] + i < -5).any())
        def _():
            o_ref[...] = o_ref[...] + 1
        return acc
    lax.fori_loop(0, N, body, 0)


def main2():
    print("--- v2 ---", flush=True)
    xb = jnp.ones((1, 64, 8, 128), I32)
    run("colbcast13", k_colbcast, xb)
    x = jnp.ones((8, 128), I32)
    run("branch_f", k_branch_false, x)


if __name__ == "__main__" and os.environ.get("V2"):
    main2()


def k_mxubcast(x_ref, s_ref, o_ref):
    # x: (1, 64, 8, 128) f32 seg blocks; s: (128, 128) f32 stack of
    # one-hot broadcast matrices rows (field f -> lanes).  One window
    # load + 13 MXU dots per iteration.
    import jax
    def body(i, acc):
        w = x_ref[0, i & 63]                       # (8, 128) f32
        for f in range(13):
            bc = jax.lax.dot_general(
                w, s_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) if False else jnp.dot(w, s_ref[...])
            acc = acc + bc
        return acc
    o_ref[...] = lax.fori_loop(
        0, N, body, jnp.zeros((8, 128), jnp.float32)).astype(I32)


def k_mxubcast13(x_ref, s_ref, o_ref):
    # 13 DIFFERENT one-hot selectors from one (128,128) constant via
    # static row windows is wrong for dot; instead reuse the same s —
    # cost model only (issue rate of 13 chained-independent dots)
    def body(i, acc):
        w = x_ref[0, i & 63]
        outs = []
        for f in range(13):
            outs.append(jnp.dot(w + f32c(f), s_ref[...]))
        for o in outs:
            acc = acc + o
        return acc
    o_ref[...] = lax.fori_loop(
        0, N, body, jnp.zeros((8, 128), jnp.float32)).astype(I32)


def f32c(v):
    return jnp.float32(v)


def main3():
    print("--- v3: MXU broadcast ---", flush=True)
    import numpy as _np
    xb = jnp.asarray(_np.random.rand(1, 64, 8, 128), jnp.float32)
    s = jnp.asarray(_np.eye(128)[:, :128], jnp.float32)
    run("mxubcast", k_mxubcast, xb, s)
    run("mxubcast13", k_mxubcast13, xb, s)


if __name__ == "__main__" and os.environ.get("V3"):
    main3()


def k_lanegather13(x_ref, o_ref):
    # x: (1, 64, 8, 128) i32 seg blocks; per iteration ONE window load
    # + 13 constant-index lane gathers (field broadcasts, exact copies)
    def body(i, acc):
        w = x_ref[0, i & 63]
        outs = []
        for f in range(13):
            outs.append(
                jnp.take_along_axis(w, jnp.full((8, 128), f, I32), axis=1)
            )
        for o in outs:
            acc = acc + o
        return acc
    o_ref[...] = lax.fori_loop(0, N, body, jnp.zeros((8, 128), I32))


def main4():
    print("--- v4: lane-gather broadcast ---", flush=True)
    import numpy as _np
    xb = jnp.asarray(
        _np.arange(64 * 8 * 128).reshape(1, 64, 8, 128) % 97, I32)
    run("lanegather13", k_lanegather13, xb)


if __name__ == "__main__" and os.environ.get("V4"):
    main4()


def k_mxu13diff(x_ref, s_ref, o_ref):
    # 13 dots each against a DIFFERENT (128,128) selector window —
    # measures MXU weight-reload cost vs the stationary-weight case
    def body(i, acc):
        w = x_ref[0, i & 63]
        outs = []
        for f in range(13):
            outs.append(jnp.dot(w, s_ref[f * 128:(f + 1) * 128, :]))
        for o in outs:
            acc = acc + o
        return acc
    o_ref[...] = lax.fori_loop(
        0, N, body, jnp.zeros((8, 128), jnp.float32)).astype(I32)


def main5():
    print("--- v5: MXU 13 distinct selectors ---", flush=True)
    import numpy as _np
    xb = jnp.asarray(_np.random.rand(1, 64, 8, 128), jnp.float32)
    s = _np.zeros((13 * 128, 128), _np.float32)
    for f in range(13):
        s[f * 128 + f, :] = 1.0
    run("mxu13diff", k_mxu13diff, xb, jnp.asarray(s))


if __name__ == "__main__" and os.environ.get("V5"):
    main5()


def k_mxuexact(w_ref, s_ref, o_ref):
    # exactness: broadcast field f of w (8,128) f32 via one-hot dot;
    # output row-block j holds broadcast of field j (j < 8)
    for f in range(8):
        bc = jnp.dot(w_ref[...], s_ref[f * 128:(f + 1) * 128, :])
        o_ref[pl.ds(0, 8), :] = jnp.where(
            lax.broadcasted_iota(I32, (8, 128), 0) == f,
            lax.bitcast_convert_type(bc, I32)[0:1],  # row 0? no: need per-f
            o_ref[pl.ds(0, 8), :],
        )


def main6():
    print("--- v6: MXU broadcast exactness ---", flush=True)
    import numpy as _np
    rng = _np.random.default_rng(0)
    # f32 values: mix of normal floats (coords, slopes) incl. negatives
    wf = (rng.standard_normal((8, 128)) * 1e3).astype(_np.float32)
    # int values <= 2^24 as f32
    wi = rng.integers(-(1 << 24), 1 << 24, (8, 128)).astype(_np.float32)
    s = _np.zeros((8 * 128, 128), _np.float32)
    for f in range(8):
        s[f * 128 + f, :] = 1.0

    def kern(w_ref, s_ref, o_ref):
        # o rows 8*f..8*f+8 = broadcast of field f (all lanes)
        for f in range(8):
            bc = jnp.dot(w_ref[...], s_ref[f * 128:(f + 1) * 128, :])
            o_ref[pl.ds(f * 8, 8), :] = lax.bitcast_convert_type(bc, I32)

    f = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * 128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
        out_specs=pl.BlockSpec((64, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    for name, w in (("f32", wf), ("i24", wi)):
        out = _np.asarray(jax.jit(f)(jnp.asarray(w), jnp.asarray(s)))
        # rows f*8..f*8+8 should equal w[:, f] broadcast: build ref
        ref = _np.zeros((64, 128), _np.int32)
        for fidx in range(8):
            ref[fidx * 8:(fidx + 1) * 8, :] = (
                w[:, fidx].view(_np.int32)[:, None]
            )
        ok = (out == ref).all()
        nbad = int((out != ref).sum())
        print(f"mxuexact {name}: exact={bool(ok)} bad={nbad}", flush=True)


if __name__ == "__main__" and os.environ.get("V6"):
    main6()


def main7():
    print("--- v7: MXU exactness at HIGHEST precision ---", flush=True)
    import numpy as _np
    rng = _np.random.default_rng(0)
    wf = (rng.standard_normal((8, 128)) * 1e3).astype(_np.float32)
    wi = rng.integers(-(1 << 24), 1 << 24, (8, 128)).astype(_np.float32)
    s = _np.zeros((8 * 128, 128), _np.float32)
    for f in range(8):
        s[f * 128 + f, :] = 1.0

    def kern(w_ref, s_ref, o_ref):
        for f in range(8):
            bc = lax.dot_general(
                w_ref[...], s_ref[f * 128:(f + 1) * 128, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            o_ref[pl.ds(f * 8, 8), :] = lax.bitcast_convert_type(bc, I32)

    f = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * 128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
        out_specs=pl.BlockSpec((64, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    for name, w in (("f32", wf), ("i24", wi)):
        out = _np.asarray(jax.jit(f)(jnp.asarray(w), jnp.asarray(s)))
        ref = _np.zeros((64, 128), _np.int32)
        for fidx in range(8):
            ref[fidx * 8:(fidx + 1) * 8, :] = (
                w[:, fidx].view(_np.int32)[:, None]
            )
        ok = (out == ref).all()
        nbad = int((out != ref).sum())
        print(f"mxuexact-hi {name}: exact={bool(ok)} bad={nbad}", flush=True)
        if not ok:
            i, j = _np.argwhere(out != ref)[0]
            print(f"  sample [{i},{j}]: got {out[i,j]:08x} want "
                  f"{ref[i,j]:08x} (val {w[j if False else i % 8, i // 8]})",
                  flush=True)


if __name__ == "__main__" and os.environ.get("V7"):
    main7()


def k_mxu13hi(x_ref, s_ref, o_ref):
    # 13 distinct-selector dots at HIGHEST precision (the bit-exact
    # config from v7) — the real candidate's cost
    def body(i, acc):
        w = x_ref[0, i & 63]
        outs = []
        for f in range(13):
            outs.append(lax.dot_general(
                w, s_ref[f * 128:(f + 1) * 128, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            ))
        for o in outs:
            acc = acc + o
        return acc
    o_ref[...] = lax.fori_loop(
        0, N, body, jnp.zeros((8, 128), jnp.float32)).astype(I32)


def main8():
    print("--- v8: 13 distinct selectors, HIGHEST ---", flush=True)
    import numpy as _np
    xb = jnp.asarray(_np.random.rand(1, 64, 8, 128), jnp.float32)
    s = _np.zeros((13 * 128, 128), _np.float32)
    for f in range(13):
        s[f * 128 + f, :] = 1.0
    run("mxu13hi", k_mxu13hi, xb, jnp.asarray(s))


if __name__ == "__main__" and os.environ.get("V8"):
    main8()


def k_mxu48(x_ref, s_ref, o_ref):
    # (8,48) @ (48,128) HIGHEST dots, 13 distinct selectors, window
    # loaded from a [1,64,8,128] block's first 48 lanes
    def body(i, acc):
        w = x_ref[0, i & 63][:, :48]
        outs = []
        for f in range(13):
            outs.append(lax.dot_general(
                w, s_ref[f * 48:(f + 1) * 48, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            ))
        for o in outs:
            acc = acc + o
        return acc
    o_ref[...] = lax.fori_loop(
        0, N, body, jnp.zeros((8, 128), jnp.float32)).astype(I32)


def main9():
    print("--- v9: (8,48)@(48,128) HIGHEST ---", flush=True)
    import numpy as _np
    xb = jnp.asarray(_np.random.rand(1, 64, 8, 128), jnp.float32)
    s = _np.zeros((13 * 48, 128), _np.float32)
    for f in range(13):
        s[f * 48 + (f % 48), :] = 1.0
    run("mxu48hi", k_mxu48, xb, jnp.asarray(s))


if __name__ == "__main__" and os.environ.get("V9"):
    main9()


def k_mxu13cvt(x_ref, s_ref, o_ref):
    # 13 distinct-selector HIGHEST dots + f32->i32 astype on each
    # result (the paint kernel's int-field pattern)
    def body(i, acc):
        w = x_ref[0, i & 63][:, :48]
        outs = []
        for f in range(13):
            outs.append(lax.dot_general(
                w, s_ref[f * 48:(f + 1) * 48, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            ).astype(I32))
        for o in outs:
            acc = acc + o
        return acc
    o_ref[...] = lax.fori_loop(0, N, body, jnp.zeros((8, 128), I32))


def main10():
    print("--- v10: dots + i32 converts ---", flush=True)
    import numpy as _np
    xb = jnp.asarray(_np.random.rand(1, 64, 8, 128) * 100, jnp.float32)
    s = _np.zeros((13 * 48, 128), _np.float32)
    for f in range(13):
        s[f * 48 + (f % 48), :] = 1.0
    run("mxu13cvt", k_mxu13cvt, xb, jnp.asarray(s))


if __name__ == "__main__" and os.environ.get("V10"):
    main10()


def _mk_branchy(use_mxu):
    def kern(x_ref, s_ref, o_ref):
        def body(i, acc):
            if use_mxu:
                w = x_ref[0, i & 63][:, :48]
                vals = []
                for f in range(13):
                    vals.append(lax.dot_general(
                        w, s_ref[f * 48:(f + 1) * 48, :],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    ).astype(I32))
            else:
                vals = [
                    x_ref[0, i & 63, :, f].astype(I32)[:, None]
                    + jnp.zeros((8, 128), I32)
                    for f in range(13)
                ]
            live = (vals[0] + i > -1).any()

            @pl.when(live)
            def _():
                t = vals[1] + vals[2]
                for v in vals[3:]:
                    t = t + v
                o_ref[...] = o_ref[...] + t

            return acc
        o_ref[...] = jnp.zeros((8, 128), I32)
        lax.fori_loop(0, N, body, 0)
    return kern


def main11():
    print("--- v11: dots/loads + consuming branch ---", flush=True)
    import numpy as _np
    xb = jnp.asarray(_np.random.rand(1, 64, 8, 128) * 100, jnp.float32)
    s = _np.zeros((13 * 48, 128), _np.float32)
    for f in range(13):
        s[f * 48 + (f % 48), :] = 1.0
    run("branchy-mxu", _mk_branchy(True), xb, jnp.asarray(s))
    run("branchy-ld", _mk_branchy(False), xb, jnp.asarray(s))


if __name__ == "__main__" and os.environ.get("V11"):
    main11()
