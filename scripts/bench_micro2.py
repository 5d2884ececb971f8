#!/usr/bin/env python
"""Primitive-rate microbenchmarks on the TPU relay (perf roadmap r2).

Measures the candidate building blocks for the resolve/deferred redesign
at render-chunk scale ([256, 200, 320] per chunk, x8 chunks = B=2048):

  gather1       per-pixel 1-element gather (current unified texel fetch)
  gather1_coh   same, with column-coherent indices (wrap-free v ramp)
  gatherrow     per-(column,slot) row-slice gather -> [B,W,K,R]
  bmm_onehot    batched [H,R]x[R,K] one-hot MXU row select (fused LHS)
  matvec_onehot batched [H,R]x[R,2] (deferred-composite shape)
  vpu_chain     i32 elementwise chain on [B,H,W] (VPU baseline)
  cumsum_n      i32 cumsum along a 408-item axis (rank compaction)
  sort_g        argsort [B, 736] (BSP order baseline)

Timing discipline per PERF.md: host-fetch a dependent scalar.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 256, 200, 320
K = 16
R = 128
C = 8192  # atlas columns


def timeit(name, fn, *args, n=5, unit_count=None, unit="elem"):
    f = jax.jit(fn)
    t0 = time.time()
    out = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.time() - t0) / n
    rate = ""
    if unit_count:
        rate = f"  {unit_count / dt / 1e9:8.3f} G{unit}/s"
    print(f"{name:16s} {dt * 1000:9.2f} ms{rate}   (compile {compile_s:.0f}s)",
          flush=True)


def main():
    key = jax.random.PRNGKey(0)
    atlas1 = jnp.asarray(
        np.random.randint(0, 2 ** 24, C * R, np.int32))
    atlas2 = jnp.asarray(
        np.random.randint(0, 255, (C, R)).astype(np.float32)
    ).astype(jnp.bfloat16)

    npx = B * H * W

    # 1. per-pixel random gather
    idx = jnp.asarray(np.random.randint(0, C * R, (B, H, W), np.int32))
    timeit("gather1", lambda a, i: a[i].sum(), atlas1, idx,
           unit_count=npx, unit="idx")

    # 1b. column-coherent: v ramps down the column, same col id per column
    col = np.random.randint(0, C, (B, 1, W), np.int32) * R
    v = (np.arange(H, dtype=np.int32) % R)[None, :, None]
    idx_coh = jnp.asarray(col + v)
    timeit("gather1_coh", lambda a, i: a[i].sum(), atlas1, idx_coh,
           unit_count=npx, unit="idx")

    # 2. row-slice gather [B,W,K] -> [B,W,K,R]
    idx2 = jnp.asarray(np.random.randint(0, C, (B, W, K), np.int32))
    timeit("gatherrow", lambda a, i: a[i].sum(), atlas2, idx2,
           unit_count=B * W * K, unit="idx")

    # 3. batched one-hot MXU row select: per (b,x) [H,R] x [R,K]
    tyv = jnp.asarray(np.random.randint(0, R, (B, W, H), np.int32))
    texcols = jnp.asarray(
        np.random.randint(0, 255, (B, W, K, R)).astype(np.float32)
    ).astype(jnp.bfloat16)
    winner = jnp.asarray(np.random.randint(0, K, (B, W, H), np.int32))

    def bmm(tyv, texcols, winner):
        oh = (tyv[..., None] == jnp.arange(R, dtype=jnp.int32)).astype(
            jnp.bfloat16)                                   # [B,W,H,R]
        out = jax.lax.dot_general(
            oh, jnp.swapaxes(texcols, 2, 3),
            dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )                                                    # [B,W,H,K]
        sel = (winner[..., None] == jnp.arange(K, dtype=jnp.int32))
        return jnp.where(sel, out, 0.0).sum(-1).sum()

    timeit("bmm_onehot", bmm, tyv, texcols, winner,
           unit_count=npx * R * K, unit="MAC")

    # 3b. deferred-composite shape: [H,R] x [R,2] per (b,x)
    texcols2 = texcols[:, :, :2, :]

    def matvec(tyv, texcols2):
        oh = (tyv[..., None] == jnp.arange(R, dtype=jnp.int32)).astype(
            jnp.bfloat16)
        out = jax.lax.dot_general(
            oh, jnp.swapaxes(texcols2, 2, 3),
            dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )
        return out.sum()

    timeit("matvec_onehot", matvec, tyv, texcols2,
           unit_count=npx * R * 2, unit="MAC")

    # 4. VPU baseline
    x = jnp.asarray(np.random.randint(0, 1 << 20, (B, H, W), np.int32))

    def chain(x):
        for _ in range(16):
            x = (x >> 1) ^ (x + 7)
        return x.sum()

    timeit("vpu_chain16", chain, x, unit_count=npx * 16, unit="op")

    # 5. rank compaction cumsum
    pres = jnp.asarray(
        np.random.randint(0, 2, (B, 408, W), np.int32))
    timeit("cumsum_n", lambda p: jnp.cumsum(p, axis=1).sum(), pres,
           unit_count=B * 408 * W, unit="elem")

    # 6. argsort
    keys = jnp.asarray(np.random.randint(0, 1 << 20, (2048, 736), np.int32))
    timeit("sort_g", lambda k: jnp.argsort(k, axis=1).sum(), keys,
           unit_count=2048 * 736, unit="key")


if __name__ == "__main__":
    main()
