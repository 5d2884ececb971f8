"""Pallas TPU kernel for the deferred ITEM composite (sprites + mids).

The XLA composite folds KI item-pool slots into the frame with one
one-hot MXU row-select per slot (~14 ms/slot at B=256: the [B,W,H,R]
one-hot operand is materialized in HBM and the [H,R]x[R,4] matmuls pad
their tiny N dim to the full MXU tile).  This kernel does the same fold
as pure VPU work in VMEM:

- XLA pre-gathers each slot's texture column as ONE 40-word row (32
  packed texel words, 4 rows per i32, ++ 8 opacity-bit words —
  `DeviceLevel.atlas_tmq`) — a cheap [B, W, KI]-indexed slice-gather
- in-kernel, per 8-row pixel block and slot: the texel row select is a
  per-element SUBLANE dynamic gather over the 4 word vregs (each lane
  holds its own screen column's texture words — no sublane-invariance
  caveat here, unlike the paint kernel's shared-texture gathers)
- opacity is a bit test in the mask words; the farthest -> nearest
  overwrite fold, the light-diminish shade of written pixels and the
  ld-word update all happen in the same pass
- with a clip pool present (KC > 0), the reference's sprite-vs-seg
  clip (renderer/map_objects.rs:127-166) also runs here: one (8,128)
  vreg holds all KI item slots' clip bounds (sublane = slot) and each
  clip-pool row tests against every slot at once — this replaced the
  deferred pass's [B, W, K, N] clip reductions entirely

Semantics mirror render/things.py's XLA composite loop exactly
(renderer/map_objects.rs:216-240 painter order; bitmap_render.rs:253-263
v interpolation; :190-208 diminish); parity-critical products go
through jmath.smul so the strict interpret-mode test is bit-exact by
construction (see ops/pallas_paint.py header).

Eligibility: `DeviceLevel.items_ok` (atlas rows <= 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from doomtpu.render.jmath import F32, I32, as_i16, f32, smul, wrap_tex
from doomtpu.render.walls import KIND_MID, SPAN_DC, SPAN_E2B, SPAN_E2T

LANES = 128

LD_WRITTEN = 1 << 24
LD_SKY = 1 << 25
SPR_MARK = 1 << 29   # keep in sync with render/things.py

# measurement only (scripts/probe_deferred_cuts "cut 5"): return after
# the XLA pre-gather + relayouts that feed the kernel, skipping the
# kernel itself — attributes the composite's cost between its input
# build and the in-VMEM fold.  Monkeypatched by the probe; deliberately
# no env-var path (see render/things._DEFER_ONLY).
_ITEMS_INPUTONLY = False

# k-outer fold with a dynamic per-camera occupancy bound (KC == 0 path
# only): the unrolled KI-inner fold runs all KI slots over all H//8
# y-blocks even though the per-(camera, column-block) occupancy max is
# far below KI at bench shapes (scripts/probe_item_blockmax).  The
# k-outer variant bounds the slot loop by max(cnt) per camera row and
# each slot's y-loop by its live [min ct, max cb] range, carrying the
# fold through two VMEM scratch planes.  Output-preserving A/B knob.
import os as _os

ITEMS_KOUTER = _os.environ.get("DOOMTPU_ITEMS_KOUTER", "1") != "0"


def _gather_sub(tab, idx):
    return jnp.take_along_axis(tab, idx, axis=0)


def _gather_lane(tab, idx):
    return jnp.take_along_axis(tab, idx, axis=1)


def _kernel(
    *refs,
    H, KI, TB, KC,
):
    # unpack: 6 pool planes, cnt, tmq (texel+mask words), 3 fb inputs,
    # palette, then (with KC > 0) vpx/vpy planes + 6 clip-pool planes +
    # clip cnt, then the 3 outputs
    (iw_ref, icb_ref, ibt_ref, iot_ref, ilz_ref, iy1_ref,
     cnt_ref, tmq_ref, idx_in, ld_in, rgb_in,
     pal_ref) = refs[:12]
    n_in = 12
    if KC > 0:
        (vpx_ref, vpy_ref, cspan_ref, cd2_ref,
         clsx_ref, clsy_ref, clex_ref, cley_ref, ccnt_ref) = refs[12:21]
        n_in = 21
    idx_out, ld_out, rgb_out = refs[n_in:n_in + 3]
    zero8 = jnp.zeros((8, LANES), I32)
    pal0 = _gather_sub(pal_ref[...], zero8)
    pal1 = _gather_sub(pal_ref[...], zero8 + 1)

    if KC > 0:
        from doomtpu.render.things import is_behind_vertex

    for b in range(TB):
        cnt_r = cnt_ref[0, b:b + 1, :]                       # (1, 128)

        # ---- in-VMEM sprite seg-clip (things.py clip reductions) ----
        # sublane s of (8,128) = item slot s; all KI slots clip at once
        if KC > 0:
            vpx8 = lax.bitcast_convert_type(vpx_ref[b], F32)
            vpy8 = lax.bitcast_convert_type(vpy_ref[b], F32)
            ccnt_r = ccnt_ref[0, b:b + 1, :]
            tsc8 = jnp.full((8, LANES), -1, I32)
            bsc8 = jnp.full((8, LANES), H, I32)
            for kc in range(KC):
                cw = cspan_ref[b, kc:kc + 1, :]
                ok_c = kc < ccnt_r
                is_mid = ((cw >> 29) & 3) == KIND_MID
                e2b = (cw & SPAN_E2B) != 0
                e2t = (cw & SPAN_E2T) != 0
                dc = ((cw & SPAN_DC) != 0) & is_mid
                y0 = ((cw >> 8) & 255) - 1
                y1 = (cw & 255) - 1
                cd2 = cd2_ref[b, kc:kc + 1, :]
                byf = cd2 >> 16
                tyf = (cd2 << 16) >> 16
                lsx = lax.bitcast_convert_type(clsx_ref[b, kc:kc + 1, :], F32)
                lsy = lax.bitcast_convert_type(clsy_ref[b, kc:kc + 1, :], F32)
                lex = lax.bitcast_convert_type(clex_ref[b, kc:kc + 1, :], F32)
                ley = lax.bitcast_convert_type(cley_ref[b, kc:kc + 1, :], F32)
                front = ok_c & ~is_behind_vertex(
                    lsx, lsy, lex, ley, vpx8, vpy8
                )
                tsc8 = jnp.maximum(
                    tsc8,
                    jnp.maximum(
                        jnp.where(front & e2t, y1, -1),
                        jnp.where(front & dc, tyf, -1),
                    ),
                )
                bsc8 = jnp.minimum(
                    bsc8,
                    jnp.minimum(
                        jnp.where(front & e2b, y0, H),
                        jnp.where(front & is_mid, byf, H),
                    ),
                )

        # per-slot rows (load once per b; (1,128) rows broadcast fine)
        rows = []
        for k in range(KI):
            word = iw_ref[b, k:k + 1, :]
            ct = ((word >> 16) & 0x1FF) - 1
            cb = ((word << 16) >> 16) - 1
            if KC > 0:
                spr = (word & SPR_MARK) != 0
                ct = jnp.where(spr, jnp.maximum(ct, tsc8[k:k + 1, :]), ct)
                cb = jnp.where(spr, jnp.minimum(cb, bsc8[k:k + 1, :]), cb)
            bt = ibt_ref[b, k:k + 1, :]
            by = bt >> 16
            ty = (bt << 16) >> 16
            ot = iot_ref[b, k:k + 1, :]
            off_y = ot >> 16
            th = (ot << 16) >> 16
            lz = ilz_ref[b, k:k + 1, :]
            light = lz >> 16
            zd = (lz << 16) >> 16
            uy1 = lax.bitcast_convert_type(iy1_ref[b, k:k + 1, :], F32)
            ok = (k < cnt_r)
            tv = [
                tmq_ref[b, k * 40 + j * 8:k * 40 + (j + 1) * 8, :]
                for j in range(4)
            ]
            mv = [
                jnp.broadcast_to(
                    tmq_ref[b, k * 40 + 32 + j:k * 40 + 32 + j + 1, :],
                    (8, LANES),
                )
                for j in range(4)
            ]
            rows.append((ct, cb, by, ty, off_y, th, light, zd, uy1, ok,
                         tv, mv))

        def yb_body(yb, carry, rows=rows, b=b):
            ys = pl.ds(pl.multiple_of(yb * 8, 8), 8)
            yy8 = lax.broadcasted_iota(I32, (8, LANES), 0) + yb * 8
            texel_v = jnp.zeros((8, LANES), I32)
            light_v = jnp.zeros((8, LANES), I32)
            zd_v = jnp.zeros((8, LANES), I32)
            touched = jnp.zeros((8, LANES), bool)
            # farthest (slot KI-1) -> nearest (slot 0): later (nearer)
            # writes overwrite, exactly like the XLA reversed-range fold
            for k in reversed(range(KI)):
                (ct, cb, by, ty, off_y, th, light, zd, uy1, ok,
                 tv, mv) = rows[k]
                cover = ok & (yy8 >= ct) & (yy8 <= cb)
                ay = f32(yy8 - ty) / f32(by - ty)
                tyv = as_i16(f32(th) + smul(ay, uy1)) + off_y
                tyv = wrap_tex(tyv, jnp.maximum(th, 1))
                word = _gather_sub(tv[0], (tyv >> 2) & 7)
                qh = tyv >> 5
                for j in range(1, 4):
                    word = jnp.where(
                        qh == j, _gather_sub(tv[j], (tyv >> 2) & 7), word
                    )
                texel = (word >> ((tyv & 3) * 8)) & 0xFF
                mword = mv[0]
                for j in range(1, 4):
                    mword = jnp.where(qh == j, mv[j], mword)
                opaque = ((mword >> (tyv & 31)) & 1) != 0
                write = cover & opaque
                texel_v = jnp.where(write, texel, texel_v)
                light_v = jnp.where(write, light, light_v)
                zd_v = jnp.where(write, zd, zd_v)
                touched = touched | write

            # shade written item pixels (bitmap_render.rs:190-208) and
            # merge over the background
            rgbw = jnp.where(
                texel_v >= LANES,
                _gather_lane(pal1, texel_v & (LANES - 1)),
                _gather_lane(pal0, texel_v & (LANES - 1)),
            )
            factor = f32(light_v) / f32(255.0) - smul(
                f32(zd_v), 1.0 / (16.0 * 256.0)
            )
            factor = jnp.maximum(factor, 0.0)
            packed = jnp.zeros((8, LANES), I32)
            for shift in (16, 8, 0):
                chan = f32((rgbw >> shift) & 0xFF)
                byte = jnp.clip(
                    jnp.trunc(chan * factor), 0.0, 255.0
                ).astype(I32)
                packed = packed | (byte << shift)
            ld_new = (
                (light_v << 16) | (zd_v & 0xFFFF) | LD_WRITTEN
            )
            idx_out[b, ys, :] = jnp.where(touched, texel_v, idx_in[b, ys, :])
            ld_out[b, ys, :] = jnp.where(touched, ld_new, ld_in[b, ys, :])
            rgb_out[b, ys, :] = jnp.where(touched, packed, rgb_in[b, ys, :])
            return carry

        lax.fori_loop(0, H // 8, yb_body, 0)


def _kernel_kouter(*refs, H, KI, TB):
    """Occupancy-bounded composite fold (KC == 0).

    Bit-identical to _kernel with KC=0: the farthest->nearest overwrite
    fold visits slots k = kimax_b-1 .. 0 (slots >= max(cnt) have
    ok=false on every lane of this (camera, block), so skipping them
    changes nothing) and each slot only the y-blocks intersecting its
    live [ct, cb] range (rows outside have cover=false).  The fold
    state (texel|touched-bit, light/zd word) lives in two VMEM scratch
    planes; a final pass shades + merges over the background exactly
    like _kernel's per-y-block epilogue.
    """
    (iw_ref, icb_ref, ibt_ref, iot_ref, ilz_ref, iy1_ref,
     cnt_ref, tmq_ref, idx_in, ld_in, rgb_in,
     pal_ref) = refs[:12]
    idx_out, ld_out, rgb_out = refs[12:15]
    sA, sB = refs[15:17]                         # (H, LANES) i32 scratch
    zero8 = jnp.zeros((8, LANES), I32)
    pal0 = _gather_sub(pal_ref[...], zero8)
    pal1 = _gather_sub(pal_ref[...], zero8 + 1)

    # per-camera occupancy maxes: issue every vector->scalar reduction
    # back to back so the sync stalls overlap (PERF.md lesson)
    cnts = [cnt_ref[0, b:b + 1, :] for b in range(TB)]
    kimaxs = [jnp.max(c) for c in cnts]

    for b in range(TB):
        cnt_r = cnts[b]
        kimax_b = jnp.minimum(kimaxs[b], KI)

        # only the touched bit (in sB) must be clean per camera; stale
        # sA values are masked by `touched` in the final pass
        sB[...] = jnp.zeros((H, LANES), I32)

        def k_body(kk, carry, b=b, cnt_r=cnt_r, kimax_b=kimax_b):
            k = kimax_b - 1 - kk                 # farthest slot first
            word = iw_ref[b, pl.ds(k, 1), :]
            ct = ((word >> 16) & 0x1FF) - 1
            cb = ((word << 16) >> 16) - 1
            bt = ibt_ref[b, pl.ds(k, 1), :]
            by = bt >> 16
            ty = (bt << 16) >> 16
            ot = iot_ref[b, pl.ds(k, 1), :]
            off_y = ot >> 16
            th = (ot << 16) >> 16
            lz = ilz_ref[b, pl.ds(k, 1), :]
            uy1 = lax.bitcast_convert_type(iy1_ref[b, pl.ds(k, 1), :], F32)
            ok = k < cnt_r
            tmw = tmq_ref[b, pl.ds(pl.multiple_of(k * 40, 8), 40), :]
            tv = [tmw[j * 8:(j + 1) * 8] for j in range(4)]
            mv = [jnp.broadcast_to(tmw[32 + j:33 + j], (8, LANES))
                  for j in range(4)]
            # live y-block range of this slot (two back-to-back
            # reductions; an all-dead slot yields lo >= hi -> no body)
            ylo = jnp.min(jnp.where(ok, jnp.maximum(ct, 0), H))
            yhi = jnp.max(jnp.where(ok, jnp.minimum(cb, H - 1), -1))
            yb_lo = ylo // 8
            yb_hi = yhi // 8 + 1

            def yb_body(yb, c2):
                ys = pl.ds(pl.multiple_of(yb * 8, 8), 8)
                yy8 = lax.broadcasted_iota(I32, (8, LANES), 0) + yb * 8
                cover = ok & (yy8 >= ct) & (yy8 <= cb)
                ay = f32(yy8 - ty) / f32(by - ty)
                tyv = as_i16(f32(th) + smul(ay, uy1)) + off_y
                tyv = wrap_tex(tyv, jnp.maximum(th, 1))
                word_t = _gather_sub(tv[0], (tyv >> 2) & 7)
                qh = tyv >> 5
                for j in range(1, 4):
                    word_t = jnp.where(
                        qh == j, _gather_sub(tv[j], (tyv >> 2) & 7), word_t
                    )
                texel = (word_t >> ((tyv & 3) * 8)) & 0xFF
                mword = mv[0]
                for j in range(1, 4):
                    mword = jnp.where(qh == j, mv[j], mword)
                opaque = ((mword >> (tyv & 31)) & 1) != 0
                write = cover & opaque
                sA[ys, :] = jnp.where(write, lz, sA[ys, :])
                sB[ys, :] = jnp.where(write, texel | 0x100, sB[ys, :])
                return c2

            lax.fori_loop(yb_lo, yb_hi, yb_body, 0)
            return carry

        lax.fori_loop(0, kimax_b, k_body, 0)

        def fin_body(yb, c2, b=b):
            ys = pl.ds(pl.multiple_of(yb * 8, 8), 8)
            a_blk = sA[ys, :]
            b_blk = sB[ys, :]
            touched = (b_blk & 0x100) != 0
            texel_v = b_blk & 0xFF
            light_v = a_blk >> 16
            zd_v = (a_blk << 16) >> 16
            rgbw = jnp.where(
                texel_v >= LANES,
                _gather_lane(pal1, texel_v & (LANES - 1)),
                _gather_lane(pal0, texel_v & (LANES - 1)),
            )
            factor = f32(light_v) / f32(255.0) - smul(
                f32(zd_v), 1.0 / (16.0 * 256.0)
            )
            factor = jnp.maximum(factor, 0.0)
            packed = jnp.zeros((8, LANES), I32)
            for shift in (16, 8, 0):
                chan = f32((rgbw >> shift) & 0xFF)
                byte = jnp.clip(
                    jnp.trunc(chan * factor), 0.0, 255.0
                ).astype(I32)
                packed = packed | (byte << shift)
            # a_blk IS the pack16(light, zd) pool word (light <= 255 so
            # bits 24+ are clear) -> ld_new = a_blk | LD_WRITTEN
            idx_out[b, ys, :] = jnp.where(
                touched, texel_v, idx_in[b, ys, :])
            ld_out[b, ys, :] = jnp.where(
                touched, a_blk | LD_WRITTEN, ld_in[b, ys, :])
            rgb_out[b, ys, :] = jnp.where(
                touched, packed, rgb_in[b, ys, :])
            return c2

        lax.fori_loop(0, H // 8, fin_body, 0)


def composite_items(level, cfg, ipool, icnt, idx, ld, rgb,
                    clip=None, vp=None, interpret: bool = False):
    """Fold the per-column item pool into (idx, ld, rgb) on device.

    ipool: 6 planes [B, W, KI] i32 (word, colbase, byty, offth, lightzd,
    uy1-bits) as built by things.deferred_pass; icnt [B, W]; idx/ld/rgb
    [B, H, W] from the paint kernel.  Returns updated (idx, ld, rgb).
    """
    from doomtpu.render import jmath

    assert level.items_ok, "atlas rows > 128: item kernel ineligible"
    assert interpret or not jmath.strict_fp_enabled(), (
        "strict-FP mode is CPU/interpret-only for the item kernel"
    )
    iword, icolbase, ibyty, ioffth, ilightzd, iuy1 = ipool
    B, W, KI = iword.shape
    H = cfg.height
    assert B % 4 == 0 and H % 8 == 0
    TB = 8 if B % 8 == 0 else 4
    NBW = (W + LANES - 1) // LANES
    Wp = NBW * LANES
    KIp = ((KI + 7) // 8) * 8
    KC = clip["span"].shape[2] if clip is not None else 0
    if KC > 0:
        # the in-kernel clip holds all item slots in one (8,128) vreg
        assert KI <= 8, "in-kernel clip supports item_capacity <= 8"
        assert vp is not None

    # XLA pre-gather: ONE 40-word row per slot (32 packed texture words
    # ++ 8 opacity-bit words, DeviceLevel.atlas_tmq) — one slice-gather
    # + one relayout where split colsq/maskq tables cost two of each
    C = level.atlas_tmq.shape[0]
    safe = jnp.clip(icolbase, 0, C - 1)
    tmqi = level.atlas_tmq[safe]                         # [B, W, KI, 40]

    def to_kw(x, n):
        """[B, W, KI, n] -> [B, KIp*n, Wp] (slot-major rows)."""
        x = jnp.swapaxes(x, 1, 3)                        # [B, n, KI, W]
        x = jnp.swapaxes(x, 1, 2)                        # [B, KI, n, W]
        if KIp != KI:
            x = jnp.pad(x, ((0, 0), (0, KIp - KI), (0, 0), (0, 0)))
        x = x.reshape(B, KIp * n, W)
        if Wp != W:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, Wp - W)))
        return x

    def plane_kw(x):
        """[B, W, KI] -> [B, KIp, Wp]."""
        return to_kw(x[..., None], 1)

    def fb_pad(x):
        if Wp == W:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, Wp - W)))

    inputs = [
        plane_kw(iword), plane_kw(icolbase), plane_kw(ibyty),
        plane_kw(ioffth), plane_kw(ilightzd), plane_kw(iuy1),
        jnp.pad(icnt, ((0, 0), (0, Wp - W))).reshape(B // TB, TB, Wp),
        to_kw(tmqi, 40),
        fb_pad(idx), fb_pad(ld), fb_pad(rgb),
        level.palette_words,
    ]
    KCp = ((KC + 7) // 8) * 8

    def clip_kw(x):
        """[B, W, KC] -> [B, KCp, Wp]."""
        x = jnp.swapaxes(x, 1, 2)
        if KCp != KC:
            x = jnp.pad(x, ((0, 0), (0, KCp - KC), (0, 0)))
        if Wp != W:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, Wp - W)))
        return x

    if KC > 0:
        inputs += [plane_kw(vp[0]), plane_kw(vp[1])]
        inputs += [clip_kw(clip[f]) for f in
                   ("span", "d2", "lsx", "lsy", "lex", "ley")]
        inputs += [
            jnp.pad(clip["cnt"], ((0, 0), (0, Wp - W)))
            .reshape(B // TB, TB, Wp)
        ]

    def pool_spec(n):
        return pl.BlockSpec(
            (TB, KIp * n, LANES), lambda i, w: (i, 0, w),
            memory_space=pltpu.VMEM,
        )

    fb_spec = pl.BlockSpec(
        (TB, H, LANES), lambda i, w: (i, 0, w), memory_space=pltpu.VMEM
    )
    cnt_spec = pl.BlockSpec(
        (1, TB, LANES), lambda i, w: (i, 0, w), memory_space=pltpu.VMEM
    )
    in_specs = (
        [pool_spec(1)] * 6
        + [cnt_spec]
        + [pool_spec(40)]
        + [fb_spec] * 3
        + [pl.BlockSpec((8, 128), lambda i, w: (0, 0),
                        memory_space=pltpu.VMEM)]
    )
    if KC > 0:
        clip_spec = pl.BlockSpec(
            (TB, KCp, LANES), lambda i, w: (i, 0, w),
            memory_space=pltpu.VMEM,
        )
        in_specs += [pool_spec(1)] * 2 + [clip_spec] * 6 + [cnt_spec]
    out_shapes = [jax.ShapeDtypeStruct((B, H, Wp), jnp.int32)] * 3
    out_specs = [fb_spec] * 3

    if _ITEMS_INPUTONLY == 2:
        # gather-only cut: consume the pregathered rows BEFORE the
        # to_kw relayout, attributing pregather cost between the
        # slice-gather and the slot-major transpose
        return idx | (tmqi.sum() & 1), ld, rgb
    if _ITEMS_INPUTONLY:
        s = inputs[0].sum()
        for x in inputs[1:8] + (inputs[12:] if KC > 0 else []):
            s = s + x.sum()
        return idx | (s & 1), ld, rgb

    kouter = ITEMS_KOUTER and KC == 0
    if kouter:
        kernel = functools.partial(_kernel_kouter, H=H, KI=KI, TB=TB)
        scratch = [pltpu.VMEM((H, LANES), jnp.int32)] * 2
    else:
        kernel = functools.partial(_kernel, H=H, KI=KI, TB=TB, KC=KC)
        scratch = []
    outs = pl.pallas_call(
        kernel,
        grid=(B // TB, NBW),
        in_specs=in_specs,
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # honest bench pools (KC=56, KI=24) put the scoped stack at
            # ~18 MB — past Mosaic's 16 MB default but nowhere near the
            # v5e's 128 MB physical VMEM (sweep #6 OOM, 2026-08-19)
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    return tuple(o[:, :, :W] for o in outs)
