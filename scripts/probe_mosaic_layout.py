#!/usr/bin/env python
"""Probe which Mosaic layout idioms compile on the TPU relay.

The paint kernel's first TPU compile died with:
    vector.broadcast in_layout {0,128} -> out {*,128}: Invalid input layout
i.e. broadcasting a (1,128) value slice that carries a LANE offset of 128
(from slicing a (TILE_B, 384) value at columns [128:256]).  This script
compiles tiny kernels isolating each suspect idiom so the kernel rewrite
targets only what is actually broken.

Each probe prints ok/FAIL + the first error line.  Run on TPU.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32


def probe(name, kernel, x_shape=(8, 384), out_shape=(8, 128)):
    x = jnp.asarray(np.arange(np.prod(x_shape), dtype=np.int32).reshape(x_shape))
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.int32),
        )(x)
        s = int(np.asarray(out).sum())
        print(f"{name:28s} ok   (sum={s})", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        first = str(e).splitlines()[0][:110]
        print(f"{name:28s} FAIL {first}", flush=True)
        return False


def k_bcast_lane_off(x_ref, o_ref):
    # (1,128) slice at lane offset 128 -> broadcast to (8,128)  [expected FAIL]
    v = x_ref[...]
    o_ref[...] = jnp.broadcast_to(v[0:1, 128:256], (8, 128))


def k_bcast_sub_off(x_ref, o_ref):
    # (1,128) slice at sublane offset 3, lane offset 0 -> broadcast
    v = x_ref[...]
    o_ref[...] = jnp.broadcast_to(v[3:4, 0:128], (8, 128))


def k_bcast_clean(x_ref, o_ref):
    # (1,128) slice at offset (0,0) -> broadcast
    v = x_ref[...]
    o_ref[...] = jnp.broadcast_to(v[0:1, 0:128], (8, 128))


def k_gather_sub_const(x_ref, o_ref):
    # replicate sublane 3 via constant-index sublane dynamic_gather
    v = x_ref[:, 0:128]
    o_ref[...] = jnp.take_along_axis(v, jnp.full((8, 128), 3, I32), axis=0)


def k_ref_window_lane128(x_ref, o_ref):
    # aligned (8,128) ref window load at lane offset 128, then arithmetic
    o_ref[...] = x_ref[:, 128:256] + 1


def k_ref_window_then_gather(x_ref, o_ref):
    # aligned ref window load at lane offset 128 feeding a lane gather
    v = x_ref[:, 128:256]
    idx = lax.broadcasted_iota(I32, (8, 128), 1)
    o_ref[...] = jnp.take_along_axis(v, (idx * 7) % 128, axis=0 + 1)


def k_val_slice_lane128_arith(x_ref, o_ref):
    # VALUE slice at lane offset 128, plain arithmetic (no broadcast)
    v = x_ref[...]
    o_ref[...] = v[:, 128:256] * 2


def k_val_slice_gather_lane(x_ref, o_ref):
    # VALUE slice at lane offset 128 feeding a lane gather [suspect]
    v = x_ref[...]
    idx = lax.broadcasted_iota(I32, (8, 128), 1)
    o_ref[...] = jnp.take_along_axis(v[:, 128:256], (idx * 7) % 128, axis=1)


def k_dyn_sublane_window(x_ref, o_ref):
    # dynamic sublane-aligned window load (texq pattern)
    t = x_ref[pl.ds(pl.multiple_of((x_ref[0, 0] % 2) * 8, 8), 8), 0:128]
    o_ref[...] = t


def k_bcast_11_scalar(x_ref, o_ref):
    # (1,1) value slice used with implicit broadcast in arithmetic
    v = x_ref[...]
    o_ref[...] = v[:, 0:128] + v[3:4, 5:6]


def k_fori_carry_block(x_ref, o_ref):
    # fori over 8-row blocks with dynamic ds store (paint y-loop pattern)
    def body(yb, c):
        ys = pl.ds(pl.multiple_of(yb * 8, 8), 8)
        o_ref[ys, :] = x_ref[ys, 0:128] + yb
        return c

    lax.fori_loop(0, 1, body, 0)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    probe("bcast_lane_off128", k_bcast_lane_off)
    probe("bcast_sublane_off3", k_bcast_sub_off)
    probe("bcast_clean", k_bcast_clean)
    probe("gather_sub_const3", k_gather_sub_const)
    probe("ref_window_lane128", k_ref_window_lane128)
    probe("val_slice_lane128_arith", k_val_slice_lane128_arith)
    probe("val_slice_gather_lane128", k_val_slice_gather_lane)
    probe("dyn_sublane_window", k_dyn_sublane_window)
    probe("bcast_1x1_scalar_arith", k_bcast_11_scalar)
    probe("fori_ds_store", k_fori_carry_block, out_shape=(8, 128))


if __name__ == "__main__":
    main()
