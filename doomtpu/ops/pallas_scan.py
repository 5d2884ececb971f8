"""Pallas TPU kernel for the occlusion wall scan.

The XLA lax.scan formulation rewrites the whole [B, W, K] span pool in
HBM on every emission of every seg step; here the pool, the occlusion
arrays and the cursor stay resident in VMEM across the entire seg loop,
so emissions are pure VPU work (see PERF.md).

Grid = (camera tiles, segs): TPU grid steps run sequentially, the pool
outputs use a g-constant index map so they stay in VMEM until the seg
dimension completes, and the tiny per-seg parameter blocks are
auto-pipelined by Pallas.  Occlusion state lives in scratch, initialized
at g == 0.

The kernel reproduces doomtpu.render.walls.wall_scan's emission order
and data planes exactly; it is the fast path (plain f32 arithmetic —
Mosaic may contract mul+add, so boundary pixels can differ from the
strict-FP oracle, like any -ffast-math build).  Enable with
RenderConfig(use_pallas_scan=True).

flags bits: 0-3 piece active, 4 two_sided, 5 draw_ceiling, 6-9 draws,
10 floor-flat-is-sky, 11 ceiling-flat-is-sky.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from doomtpu.config import RenderConfig
from doomtpu.render.device import DeviceLevel
from doomtpu.render.jmath import I32, F32, as_i16, f32, smul, wrap_tex
from doomtpu.render.walls import (
    KIND_CEIL, KIND_FLOOR, KIND_MID, KIND_WALL, N_PLANES,
    SPAN_DC, SPAN_E2B, SPAN_E2T, SPAN_NODRAW, pack16, pack_span,
)

TILE_B = 8
SEG_UNROLL = 8   # segs per grid step (amortizes per-step overhead)


def _kernel(
    # inputs, blocks [1, U, 1|4, TILE_B] (dummy-axis layout: Mosaic
    # requires the last two block dims to equal the array dims)
    g_ref, x0_ref, x1_ref, flags_ref, lsx_ref, lex_ref, length_ref,
    soff_ref, offx_ref, light_ref,
    ybs_ref, ybd_ref, yts_ref, ytd_ref, offy_ref, texbase_ref, thw_ref,
    uy1_ref, pfl1_ref, pfl2_ref, pce1_ref, pce2_ref,
    # outputs, g-constant blocks
    spans_ref, d1_ref, d2_ref, d3_ref, d4_ref, d5_ref, d6_ref,
    cnt_ref, ovf_ref,
    # scratch
    hor_s, fo_s, co_s,
    *, W, H, K, TEX_POW2, U,
):
    gi = pl.program_id(1)

    @pl.when(gi == 0)
    def _init():
        hor_s[...] = jnp.zeros((TILE_B, W), I32)
        fo_s[...] = jnp.full((TILE_B, W), H, I32)
        co_s[...] = jnp.full((TILE_B, W), -1, I32)
        cnt_ref[...] = jnp.zeros((TILE_B, W), I32)
        ovf_ref[...] = jnp.zeros((TILE_B, 128), I32)
        spans_ref[...] = jnp.zeros((TILE_B, K, W), I32)
        for r in (d1_ref, d2_ref, d3_ref, d4_ref, d5_ref, d6_ref):
            r[...] = jnp.zeros((TILE_B, K, W), I32)

    xx = lax.broadcasted_iota(I32, (TILE_B, W), 1)
    k_iota = lax.broadcasted_iota(I32, (TILE_B, K, W), 1)

    def emit(mask, rec, data):
        # predicated: a seg rarely covers open columns for every camera
        # in the tile, so most emissions are skipped entirely
        @pl.when(mask.any())
        def _do_emit():
            cnt = cnt_ref[...]
            fits = cnt < K
            do = mask & fits
            write = do[:, None, :] & (k_iota == cnt[:, None, :])
            spans_ref[...] = jnp.where(write, rec[:, None, :], spans_ref[...])
            for r, d in zip(
                (d1_ref, d2_ref, d3_ref, d4_ref, d5_ref, d6_ref), data
            ):
                r[...] = jnp.where(write, d[:, None, :], r[...])
            cnt_ref[...] = cnt + do.astype(I32)
            ovf = (mask & ~fits).sum(axis=-1).astype(I32)
            ovf_ref[:, 0] = ovf_ref[:, 0] + ovf

    for u_ in range(U):
        _one_seg(
            u_, xx, k_iota, emit,
            g_ref, x0_ref, x1_ref, flags_ref, lsx_ref, lex_ref, length_ref,
            soff_ref, offx_ref, light_ref,
            ybs_ref, ybd_ref, yts_ref, ytd_ref, offy_ref, texbase_ref,
            thw_ref, uy1_ref, pfl1_ref, pfl2_ref, pce1_ref, pce2_ref,
            hor_s, fo_s, co_s, W=W, H=H, K=K, TEX_POW2=TEX_POW2,
        )


def _one_seg(
    u_, xx, k_iota, emit,
    g_ref, x0_ref, x1_ref, flags_ref, lsx_ref, lex_ref, length_ref,
    soff_ref, offx_ref, light_ref,
    ybs_ref, ybd_ref, yts_ref, ytd_ref, offy_ref, texbase_ref, thw_ref,
    uy1_ref, pfl1_ref, pfl2_ref, pce1_ref, pce2_ref,
    hor_s, fo_s, co_s, *, W, H, K, TEX_POW2,
):
    flags = flags_ref[0, u_, 0, :][:, None]
    x0 = x0_ref[0, u_, 0, :][:, None]
    x0i = as_i16(x0)
    x1i = as_i16(x1_ref[0, u_, 0, :][:, None])

    # skip the whole seg when no camera in the tile has an open,
    # covered column for any active piece (idempotence argument: a
    # solid seg whose covered columns are all already occluded would
    # only re-set hor/fo/co to the values they already hold)
    act_any = (flags & 15) != 0
    seg_live = (
        (xx >= x0i) & (xx <= x1i) & act_any & (hor_s[...] == 0)
    ).any()

    @pl.when(seg_live)
    def _seg_body():
        gval = g_ref[0, u_, 0, :]                            # [TILE_B]
        two_sided = (flags & 16) != 0
        draw_c = (flags & 32) != 0
        f_sky = (flags & 1024) != 0
        c_sky = (flags & 2048) != 0
        light = light_ref[0, u_, 0, :][:, None]
        g_bc = jnp.broadcast_to(gval[:, None], (TILE_B, W))

        pfl_d1 = jnp.broadcast_to(pfl1_ref[0, u_, 0, :][:, None], (TILE_B, W))
        pfl_d2 = jnp.broadcast_to(pfl2_ref[0, u_, 0, :][:, None], (TILE_B, W))
        pce_d1 = jnp.broadcast_to(pce1_ref[0, u_, 0, :][:, None], (TILE_B, W))
        pce_d2 = jnp.broadcast_to(pce2_ref[0, u_, 0, :][:, None], (TILE_B, W))
        zero = jnp.zeros((TILE_B, W), I32)

        one = f32(1.0)
        ax = f32(xx - x0) / f32(x1_ref[0, u_, 0, :][:, None] - x0)
        uz0 = lsx_ref[0, u_, 0, :][:, None]
        uz1 = lex_ref[0, u_, 0, :][:, None]
        inv0 = one / uz0
        inv1 = one / uz1
        denom = smul(one - ax, inv0) + smul(ax, inv1)
        u = (
            smul(one - ax, f32(0.0) / uz0)
            + smul(ax, length_ref[0, u_, 0, :][:, None] / uz1)
        ) / denom
        tx_base = (
            as_i16(u) + as_i16(soff_ref[0, u_, 0, :])[:, None]
            + offx_ref[0, u_, 0, :][:, None]
        )
        zdist = as_i16(((one - ax) + ax) / denom)

        for p in range(4):
            act = (flags & (1 << p)) != 0
            draws_p = (flags & (64 << p)) != 0
            hor = hor_s[...] != 0
            fo = fo_s[...]
            co = co_s[...]
            covered = (xx >= x0i) & (xx <= x1i) & act
            open_ = covered & ~hor

            by = as_i16(
                f32(ybs_ref[0, u_, p, :])[:, None]
                + smul(f32(xx - x0), ybd_ref[0, u_, p, :][:, None])
            )
            ty = as_i16(
                f32(yts_ref[0, u_, p, :])[:, None]
                + smul(f32(xx - x0), ytd_ref[0, u_, p, :][:, None])
            )
            cb = jnp.minimum(H - 1, jnp.minimum(fo, by))
            ct = jnp.maximum(0, jnp.maximum(co, ty))
            in_ver = (cb >= ct) & open_

            thw = thw_ref[0, u_, p, :][:, None]
            th = thw >> 16
            tw = thw & 0xFFFF
            tx = wrap_tex(tx_base, jnp.maximum(tw, 1), pow2=TEX_POW2)
            w_d1 = texbase_ref[0, u_, p, :][:, None] + tx
            w_d2 = pack16(by, ty)
            w_d3 = pack16(offy_ref[0, u_, p, :][:, None], th)
            w_d4 = pack16(light, zdist)
            w_d5 = jnp.broadcast_to(
                lax.bitcast_convert_type(uy1_ref[0, u_, p, :], I32)[:, None],
                (TILE_B, W),
            )
            wall_data = (w_d1, w_d2, w_d3, w_d4, w_d5, g_bc)

            if p == 0:
                solid = ~two_sided
                rec = pack_span(KIND_WALL, ct, cb) | SPAN_E2B | SPAN_E2T
                rec = jnp.where(draws_p, rec, rec | SPAN_NODRAW)
                emit(in_ver & solid, rec, wall_data)

                fl_keep = f_sky | (jnp.minimum(H - 1, fo) - cb > 1)
                fl_emit = in_ver & (cb < fo) & (cb != H - 1) & fl_keep
                emit(
                    fl_emit, pack_span(KIND_FLOOR, cb, fo),
                    (pfl_d1, pfl_d2, zero, zero, zero, g_bc),
                )
                ce_keep = c_sky | (
                    jnp.minimum(H - 1, ct) - jnp.maximum(0, co) > 1
                )
                ce_emit = in_ver & draw_c & (ct > co) & ce_keep
                emit(
                    ce_emit, pack_span(KIND_CEIL, co, ct),
                    (pce_d1, pce_d2, zero, zero, zero, g_bc),
                )

                gap = open_ & ~in_ver & (fo > co)
                keep_g = jnp.minimum(H - 1, fo) - jnp.maximum(0, co) > 1
                gap_b = gap & (by <= co)
                emit(
                    gap_b & (f_sky | keep_g),
                    pack_span(KIND_FLOOR, co, fo),
                    (pfl_d1, pfl_d2, zero, zero, zero, g_bc),
                )
                gap_t = gap & draw_c & (ty >= fo)
                emit(
                    gap_t & (c_sky | keep_g),
                    pack_span(KIND_CEIL, co, fo),
                    (pce_d1, pce_d2, zero, zero, zero, g_bc),
                )
                gap_occl = gap_b | gap_t

                occl_m = in_ver & two_sided
                fo = jnp.where(occl_m, cb, fo)
                co = jnp.where(occl_m & draw_c, ct, co)
                solid_occl = (covered & solid) | gap_occl
                hor_s[...] = (hor | solid_occl).astype(I32)
                fo_s[...] = jnp.where(solid_occl, H // 2, fo)
                co_s[...] = jnp.where(solid_occl, H // 2, co)
            elif p == 1:
                rec = pack_span(KIND_MID, ct, cb) | jnp.where(draw_c, SPAN_DC, 0)
                emit(in_ver, rec, wall_data)
            elif p == 2:
                rec = pack_span(KIND_WALL, ct, cb) | SPAN_E2B
                rec = jnp.where(draws_p, rec, rec | SPAN_NODRAW)
                emit(in_ver, rec, wall_data)
                fo_s[...] = jnp.where(in_ver, ct, fo)
            else:
                rec = pack_span(KIND_WALL, ct, cb) | SPAN_E2T
                rec = jnp.where(draws_p, rec, rec | SPAN_NODRAW)
                emit(in_ver, rec, wall_data)
                co_s[...] = jnp.where(in_ver, cb, co)


def wall_scan_pallas(level: DeviceLevel, cfg: RenderConfig, frame: dict, order,
                     interpret: bool = False):
    """Drop-in replacement for walls.wall_scan (fast path, TPU only).

    interpret=True runs the kernel program on CPU (tests/test_pallas.py
    asserts pool bit-equality vs walls.wall_scan there).
    """
    from doomtpu.render import jmath

    B, G = order.shape
    W, H, K = cfg.width, cfg.height, cfg.span_capacity
    TW = level.tex_pixels.shape[2]
    assert B % TILE_B == 0, f"batch {B} must be a multiple of {TILE_B}"
    # strict-FP smul lowers to f64 + reduce_precision — interpret only
    assert interpret or not jmath.strict_fp_enabled(), (
        "strict-FP mode is CPU/interpret-only for the scan kernel"
    )
    U = min(SEG_UNROLL, G)
    Gp = ((G + U - 1) // U) * U

    def ordered(x):
        if x.ndim == 2:
            return jnp.take_along_axis(x, order, axis=1)
        return jnp.take_along_axis(x, order[..., None], axis=1)

    def padg(x):
        """Pad the seg axis to a U multiple; padding has all-zero flags
        (no active piece), so the kernel's per-seg guard skips it."""
        if Gp == G:
            return x
        return jnp.pad(x, [(0, 0), (0, Gp - G)] + [(0, 0)] * (x.ndim - 2))

    active = ordered(frame["active"])
    draws = ordered(frame["draws"])
    flags = (
        active[..., 0].astype(I32)
        | (active[..., 1].astype(I32) << 1)
        | (active[..., 2].astype(I32) << 2)
        | (active[..., 3].astype(I32) << 3)
        | (ordered(frame["two_sided"]).astype(I32) << 4)
        | (ordered(frame["draw_ceiling"]).astype(I32) << 5)
        | (draws[..., 0].astype(I32) << 6)
        | (draws[..., 1].astype(I32) << 7)
        | (draws[..., 2].astype(I32) << 8)
        | (draws[..., 3].astype(I32) << 9)
        | (level.flat_is_sky[ordered(frame["floor_flat"])].astype(I32) << 10)
        | (level.flat_is_sky[ordered(frame["ceil_flat"])].astype(I32) << 11)
    )

    light = ordered(frame["light"])
    ffl = ordered(frame["floor_flat"])
    cfl = ordered(frame["ceil_flat"])
    f_sky = level.flat_is_sky[ffl].astype(I32)
    c_sky = level.flat_is_sky[cfl].astype(I32)
    pfl1 = (light << 22) | (ffl << 8) | (f_sky << 21)
    pfl2 = pack16(ordered(frame["floor_h_i"]), 0)
    pce1 = (light << 22) | (cfl << 8) | (c_sky << 21)
    pce2 = pack16(ordered(frame["ceil_h_i"]), 0)

    tex = ordered(frame["tex"])
    tex_safe = jnp.maximum(tex, 0)
    texbase = tex_safe * TW
    thw = (level.tex_h[tex_safe] << 16) | level.tex_w[tex_safe]

    def tile4(x):
        """[B, G(,4)] -> [B/T, Gp, 1|4, T] dummy-axis layout for Mosaic."""
        x = padg(x)
        if x.ndim == 2:
            return x.reshape(B // TILE_B, TILE_B, Gp).transpose(0, 2, 1)[
                :, :, None, :
            ]
        return x.reshape(B // TILE_B, TILE_B, Gp, 4).transpose(0, 2, 3, 1)

    inputs = [tile4(x) for x in (
        order.astype(I32),
        ordered(frame["x0"]), ordered(frame["x1"]), flags,
        ordered(frame["lsx"]), ordered(frame["lex"]),
        ordered(frame["length"]), ordered(frame["start_offset"]),
        ordered(frame["offset_x_total"]), light,
        ordered(frame["yb_s"]), ordered(frame["yb_d"]),
        ordered(frame["yt_s"]), ordered(frame["yt_d"]),
        ordered(frame["off_y"]), texbase, thw, ordered(frame["uy1"]),
        pfl1, pfl2, pce1, pce2,
    )]

    def in_spec(x):
        last = x.shape[2]  # 1 or 4
        return pl.BlockSpec(
            (1, U, last, TILE_B), lambda i, g: (i, g, 0, 0),
            memory_space=pltpu.VMEM,
        )

    pool_spec = pl.BlockSpec(
        (TILE_B, K, W), lambda i, g: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_shapes = (
        [jax.ShapeDtypeStruct((B, K, W), jnp.int32) for _ in range(7)]
        + [jax.ShapeDtypeStruct((B, W), jnp.int32),
           jax.ShapeDtypeStruct((B, 128), jnp.int32)]
    )
    out_specs = (
        [pool_spec for _ in range(7)]
        + [pl.BlockSpec((TILE_B, W), lambda i, g: (i, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((TILE_B, 128), lambda i, g: (i, 0),
                        memory_space=pltpu.VMEM)]
    )

    kernel = functools.partial(
        _kernel, W=W, H=H, K=K, TEX_POW2=level.tex_sizes_pow2, U=U
    )
    outs = pl.pallas_call(
        kernel,
        grid=(B // TILE_B, Gp // U),
        in_specs=[in_spec(x) for x in inputs],
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((TILE_B, W), jnp.int32),
            pltpu.VMEM((TILE_B, W), jnp.int32),
            pltpu.VMEM((TILE_B, W), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)
    spans, d1, d2, d3, d4, d5, d6, cnt, ovf = outs
    tr = lambda x: jnp.swapaxes(x, 1, 2)          # [B, K, W] -> [B, W, K]
    return (
        (tr(spans), [tr(d) for d in (d1, d2, d3, d4, d5, d6)]), cnt, ovf[:, 0]
    )
