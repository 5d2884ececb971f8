#!/usr/bin/env python
"""Microbenchmarks of the primitives that bound the renderer's speed.

Timing discipline (PERF.md): every measurement forces a host fetch of a
scalar that depends on the computation; block_until_ready through the
axon relay can return early.  All arrays are jit arguments, never
closure constants (embedded constants degrade dispatch permanently).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = int(os.environ.get("B", 256))
H, W = 200, 320
PIX = B * H * W


def timeit(name, fn, *args, n=5, elems=None):
    f = jax.jit(fn)
    out = f(*args)
    _ = int(np.asarray(jax.tree_util.tree_leaves(out)[0].sum()))  # warm+sync
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    cs = int(np.asarray(jax.tree_util.tree_leaves(out)[0].sum()))
    dt = (time.time() - t0) / n
    rate = (elems or PIX) / dt / 1e9
    print(f"{name:44s} {dt * 1000:9.2f} ms   {rate:8.2f} G/s", flush=True)
    return dt


def main():
    print(f"backend={jax.default_backend()} B={B} PIX={PIX/1e6:.1f}M", flush=True)
    rng = np.random.default_rng(0)

    idx_hw = jnp.asarray(rng.integers(0, 256, (B, H, W)), jnp.int32)
    tab256 = jnp.asarray(rng.integers(0, 2**30, 256), jnp.int32)
    tab64k = jnp.asarray(rng.integers(0, 2**30, 65536), jnp.int32)
    tab2m = jnp.asarray(rng.integers(0, 2**30, 2_000_000), jnp.int32)
    idx64k = jnp.asarray(rng.integers(0, 65536, (B, H, W)), jnp.int32)
    idx2m = jnp.asarray(rng.integers(0, 2_000_000, (B, H, W)), jnp.int32)
    # coherent: nearly-constant along rows (span-like)
    base = rng.integers(0, 2_000_000, (B, 1, W))
    idx_coh = jnp.asarray(
        np.minimum(base + rng.integers(0, 64, (B, H, W)), 1_999_999), jnp.int32
    )

    timeit("elementwise f32 mul+add [B,H,W]",
           lambda x: x * 1.0001 + 2.0, jnp.asarray(rng.random((B, H, W)), jnp.float32))

    timeit("gather 256-table  random [B,H,W]", lambda t, i: t[i], tab256, idx_hw)
    timeit("gather 64k-table  random [B,H,W]", lambda t, i: t[i], tab64k, idx64k)
    timeit("gather 2M-table   random [B,H,W]", lambda t, i: t[i], tab2m, idx2m)
    timeit("gather 2M-table coherent [B,H,W]", lambda t, i: t[i], tab2m, idx_coh)

    tab2m_u8 = jnp.asarray(rng.integers(0, 255, 2_000_000), jnp.uint8)
    timeit("gather 2M-u8-table random [B,H,W]", lambda t, i: t[i], tab2m_u8, idx2m)

    # take_along_axis formulation on flattened-last-dim
    timeit("take_along_axis 64k [B, HW]",
           lambda t, i: jnp.take_along_axis(
               jnp.broadcast_to(t[None], (B, t.shape[0])), i.reshape(B, -1), axis=1
           ), tab64k, idx64k)

    # one-hot palette over 256 via MXU (bf16), per pixel
    pal = jnp.asarray(rng.integers(0, 255, (256, 8)), jnp.float32)
    def onehot256(i, p):
        oh = (i.reshape(B, H * W)[..., None] == jnp.arange(256, dtype=jnp.int32)
              ).astype(jnp.bfloat16)
        return lax.dot_general(oh, p.astype(jnp.bfloat16),
                               dimension_numbers=(((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    timeit("one-hot-256 MXU palette [B,HW]@[256,8]", onehot256, idx_hw, pal)

    # slice-gather: per-(b,w,k) texture column fetch, 128 rows each
    K = 48
    ROWS = 128
    C = 16384
    atlas = jnp.asarray(rng.integers(0, 255, (C, ROWS)), jnp.int8)
    colid = jnp.asarray(rng.integers(0, C, (B, W, K)), jnp.int32)
    timeit("column slice-gather [B,W,K] x 128 rows",
           lambda a, c: a[c], atlas, colid, elems=B * W * K * ROWS)

    # winner fold standalone: K selects over [B,H,W]
    spans = jnp.asarray(rng.integers(0, 2**20, (B, W, K)), jnp.int32)
    def fold(sp):
        yy = jnp.arange(H, dtype=jnp.int32)[None, :, None]
        acc = jnp.zeros((B, H, W), jnp.int32)
        for k in range(K):
            s = sp[:, :, k][:, None, :]
            cover = (yy >= (s & 255)) & (yy <= ((s >> 8) & 255))
            acc = jnp.where(cover, s, acc)
        return acc
    timeit(f"winner fold K={K} selects [B,H,W]", fold, spans)

    # fori_loop per-item composite (deferred-pass shape), 64 items
    items = jnp.asarray(rng.integers(0, 255, (B, 64, W)), jnp.int32)
    def composite(it):
        yy = jnp.arange(H, dtype=jnp.int32)[None, :, None]
        def body(i, acc):
            row = jnp.take_along_axis(
                it, jnp.full((B, 1, 1), i, jnp.int32), axis=1)[:, 0]
            cover = (yy >= (row[:, None, :] & 63)) & (yy <= 128)
            return jnp.where(cover, row[:, None, :], acc)
        return lax.fori_loop(0, 64, body, jnp.zeros((B, H, W), jnp.int32))
    timeit("fori 64-item composite [B,H,W]", composite, items,
           elems=64 * PIX)


if __name__ == "__main__":
    main()
