#!/usr/bin/env python
"""Compare formulations of the per-(tile,block) seg compaction gather on
TPU: take_along_axis slice gather vs batched exact one-hot MXU dot.

Shapes: Bt=32 tiles, TB=8 cams, Gp=736 segs, NBW=3 blocks, F=48 f32.
Exactness: u16-half split (both halves exactly representable in f32;
one-hot rows have a single 1.0) — recombined output is bit-identical.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax import lax

Bt, TB, Gp, NBW, F = 32, 8, 736, 3, 48
NG = NBW * Gp
rng = np.random.default_rng(0)
svf = jnp.asarray(
    rng.standard_normal((Bt, Gp + 1, TB, F)).astype(np.float32))
comb = jnp.asarray(
    rng.integers(0, Gp + 1, (Bt, NG, TB)).astype(np.int32))

def tget(svf, comb):
    return jnp.take_along_axis(svf, comb[..., None], axis=1)

def onehot_dot(svf, comb):
    iv = lax.bitcast_convert_type(svf, jnp.int32)
    halves = jnp.concatenate(
        [(iv & 0xFFFF).astype(jnp.float32),
         ((iv >> 16) & 0xFFFF).astype(jnp.float32)], axis=-1
    )                                            # [Bt, Gp+1, TB, 2F]
    halves = halves.transpose(0, 2, 1, 3)        # [Bt, TB, Gp+1, 2F]
    oh = (comb.transpose(0, 2, 1)[..., None]
          == jnp.arange(Gp + 1, dtype=jnp.int32)).astype(jnp.float32)
    out = lax.dot_general(
        oh, halves,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )                                            # [Bt, TB, NG, 2F]
    lo = out[..., :F].astype(jnp.int32)
    hi = out[..., F:].astype(jnp.int32)
    return lax.bitcast_convert_type(
        (hi << 16) | lo, jnp.float32
    ).transpose(0, 2, 1, 3)                      # [Bt, NG, TB, F]

def bench(name, fn):
    f = jax.jit(fn)
    t0 = time.time()
    r = f(svf, comb)
    _ = float(np.asarray((lax.bitcast_convert_type(
        r, jnp.int32).astype(jnp.int64) % 1000).sum()))
    comp = time.time() - t0
    t0 = time.time(); n = 10
    for _i in range(n):
        r = f(svf, comb)
    cs = float(np.asarray((lax.bitcast_convert_type(
        r, jnp.int32).astype(jnp.int64) % 1000).sum()))
    print(f"{name:12s} {(time.time()-t0)/n*1000:8.2f} ms cs={cs}",
          flush=True)

bench("take_along", tget)
bench("onehot_dot", onehot_dot)
# bit-exactness cross-check on CPU shapes
a = np.asarray(jax.jit(tget)(svf, comb))
b = np.asarray(jax.jit(onehot_dot)(svf, comb))
print("bit-identical:", (a.view(np.int32) == b.view(np.int32)).all())

def onehot_bf16(svf, comb):
    iv = lax.bitcast_convert_type(svf, jnp.int32)
    quarters = jnp.concatenate(
        [((iv >> s) & 0xFF).astype(jnp.bfloat16) for s in (0, 8, 16, 24)],
        axis=-1,
    ).transpose(0, 2, 1, 3)                      # [Bt, TB, Gp+1, 4F]
    oh = (comb.transpose(0, 2, 1)[..., None]
          == jnp.arange(Gp + 1, dtype=jnp.int32)).astype(jnp.bfloat16)
    out = lax.dot_general(
        oh, quarters,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )                                            # [Bt, TB, NG, 4F]
    q = [out[..., i * F:(i + 1) * F].astype(jnp.int32) for i in range(4)]
    return lax.bitcast_convert_type(
        q[0] | (q[1] << 8) | (q[2] << 16) | (q[3] << 24), jnp.float32
    ).transpose(0, 2, 1, 3)

bench("onehot_bf16", onehot_bf16)
c = np.asarray(jax.jit(onehot_bf16)(svf, comb))
a = np.asarray(jax.jit(tget)(svf, comb))
print("bf16 bit-identical:", (a.view(np.int32) == c.view(np.int32)).all())
