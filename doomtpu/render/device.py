"""Device-resident level data for the JAX renderer.

One `DeviceLevel` per loaded map: every camera-independent quantity the
vectorized renderer needs, precomputed on host and uploaded once
(SURVEY §7.1-2: flattened map tables + texture atlases + static piece
metadata).  The renderer treats these as constants under jit.

Piece model: every seg expands to 4 potential draw pieces, indexed

    0 primary — solid wall (draws + occludes) or portal occlusion pass
    1 two-sided middle (deferred, masked)
    2 lower portal wall
    3 upper portal wall

mirroring the reference's process_sidedef call sequence
(renderer/segs.rs:493-589).  Span records carry the seg index in a full
i32 G-buffer plane (doomtpu.render.walls), so seg counts are unbounded,
matching the reference (src/map/segs.rs:17-42).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from doomtpu.assets.bundle import LevelAssets
from doomtpu.config import RenderConfig
from doomtpu.info.tables import InfoTables
from doomtpu.level.tables import MapTables

def _j(x, dtype=None):
    return jnp.asarray(x, dtype=dtype)


def _seg_local(seg_sub: np.ndarray) -> np.ndarray:
    """Per-seg rank within its subsector (#same-subsector segs with a
    lower index) — the tie-break a stable argsort on subsector rank
    applies, precomputed statically for the counting-sort seg order."""
    order = np.argsort(seg_sub, kind="stable")
    g = len(seg_sub)
    starts = np.r_[0, np.flatnonzero(np.diff(seg_sub[order])) + 1]
    sizes = np.diff(np.r_[starts, g])
    ranks = np.arange(g, dtype=np.int64) - np.repeat(starts, sizes)
    local = np.empty(g, np.int32)
    local[order] = ranks.astype(np.int32)
    return local


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceLevel:
    # --- seg geometry ------------------------------------------------
    seg_v1: jnp.ndarray        # [G,2] f32
    seg_v2: jnp.ndarray        # [G,2] f32
    seg_offset: jnp.ndarray    # [G] i32 (distance along linedef)
    seg_sub: jnp.ndarray       # [G] i32
    seg_front_side: jnp.ndarray    # [G] i32 (-1 = none)
    seg_front_sector: jnp.ndarray  # [G] i32 (-1)
    seg_back_sector: jnp.ndarray   # [G] i32 (-1)
    seg_two_sided: jnp.ndarray     # [G] bool
    seg_unpeg_top: jnp.ndarray     # [G] bool
    seg_unpeg_bottom: jnp.ndarray  # [G] bool
    seg_xoff: jnp.ndarray      # [G] i32  sidedef x offset (as i16)
    seg_yoff: jnp.ndarray      # [G] i32
    seg_mid_tex: jnp.ndarray   # [G] i32 (-1 = none)
    seg_low_tex: jnp.ndarray   # [G] i32
    seg_up_tex: jnp.ndarray    # [G] i32
    seg_draw_ceiling: jnp.ndarray  # [G] bool (sky-hack, static per seg)
    seg_sky_hack: jnp.ndarray      # [G] bool

    # --- BSP traversal -------------------------------------------------
    node_xy: jnp.ndarray       # [N,2] f32
    node_dxy: jnp.ndarray      # [N,2] f32
    sub_path_nodes: jnp.ndarray  # [SS,D] i32
    sub_path_left: jnp.ndarray   # [SS,D] i32 (1 = left child)
    sub_depth: jnp.ndarray       # [SS] i32
    sub_sector: jnp.ndarray      # [SS] i32
    node_child: jnp.ndarray      # [N,2] i32 (raw, bit15 = subsector)
    sub_nseg: jnp.ndarray        # [SS] i32  segs per subsector
    seg_local: jnp.ndarray       # [G] i32  seg's rank within its
    #   subsector (= #same-subsector segs with a lower index); with
    #   sub_nseg this makes camera.seg_order a counting sort on the
    #   [B, SS] subsector ranks instead of a [B, G] argsort

    # --- sector static attributes ---------------------------------------
    sector_floor_h: jnp.ndarray   # [SEC] i32
    sector_ceil_h: jnp.ndarray    # [SEC] i32
    sector_light0: jnp.ndarray    # [SEC] i32 (initial light)
    sector_floor_flat: jnp.ndarray  # [SEC] i32
    sector_ceil_flat: jnp.ndarray   # [SEC] i32

    # --- assets ----------------------------------------------------------
    palette: jnp.ndarray       # [256,3] f32
    flat_pixels: jnp.ndarray   # [F,64,64] i32
    flat_is_sky: jnp.ndarray   # [F] bool
    flat_anim_base: jnp.ndarray  # [F] i32
    flat_anim_len: jnp.ndarray   # [F] i32
    tex_pixels: jnp.ndarray    # [T,TH,TW] i32
    tex_mask: jnp.ndarray      # [T,TH,TW] bool
    tex_w: jnp.ndarray         # [T] i32
    tex_h: jnp.ndarray         # [T] i32
    sky_tex: jnp.ndarray       # scalar i32
    spr_pixels: jnp.ndarray    # [P,PH,PW] i32
    spr_mask: jnp.ndarray      # [P,PH,PW] bool
    spr_w: jnp.ndarray         # [P] i32
    spr_h: jnp.ndarray         # [P] i32
    spr_top: jnp.ndarray       # [P] i32
    spr_table: jnp.ndarray     # [NSPR, MAXFRAME, 8] i32

    # --- info tables ---------------------------------------------------
    state_sprite: jnp.ndarray      # [NS] i32
    state_frame: jnp.ndarray       # [NS] i32
    state_full_bright: jnp.ndarray # [NS] bool
    state_tics: jnp.ndarray        # [NS] i32
    state_next: jnp.ndarray        # [NS] i32

    # --- map objects (static placement; state lives in sim) ---------------
    mobj_pos: jnp.ndarray      # [MO,2] f32
    mobj_angle: jnp.ndarray    # [MO] f32
    mobj_sector: jnp.ndarray   # [MO] i32
    mobj_info: jnp.ndarray     # [MO] i32 index into info tables
    mobj_spawn_state: jnp.ndarray  # [MO] i32
    mobj_death_state: jnp.ndarray  # [MO] i32
    mobj_xdeath_state: jnp.ndarray # [MO] i32

    # --- static piece metadata (for the deferred masked-mid draw) ---------
    dseg_ix: jnp.ndarray       # [D] i32 segs with drawable two-sided mids

    # column-major sampling atlases, [C(, ROWS)] with C spanning
    # [wall texture columns | flat columns | sprite columns]:
    # - atlas_cols: bf16, palette index (bf16-exact) or -1 when
    #   transparent; feeds MXU one-hot texel sampling (see PERF.md)
    # - atlas_cm: flattened i32 copy, texel | opaque << 8, for per-pixel
    #   gathers (index = colid * ROWS + row)
    atlas_cols: jnp.ndarray
    atlas_cm: jnp.ndarray
    palette_packed: jnp.ndarray  # [256] i32 0xRRGGBB

    # packed tables for the Pallas paint kernel (ops/pallas_paint.py):
    # texel rows packed 4-per-word; see build()
    atlas_cols4: jnp.ndarray   # [C, ROWS, 4] bf16 (idx, r, g, b)
    tex_q: jnp.ndarray       # [T*32, 128] i32
    flat_q: jnp.ndarray      # [F*16, 128] i32
    sky_q: jnp.ndarray       # [32, 256] i32
    palette_words: jnp.ndarray  # [8, 128] i32 (256 packed 0xRRGGBB rows)
    # packed per-COLUMN table for the item-composite kernel
    # (ops/pallas_items.py): same C axis as atlas_cols.  One 40-word
    # row = 32 texel words (rows 4-per-word) ++ 8 opacity-bit words
    # (bit r%32 of word 32 + r//32) so the kernel's XLA pregather is
    # ONE [B, W, KI]-indexed slice-gather + ONE relayout instead of two
    atlas_tmq: jnp.ndarray     # [C, 40] i32
    # unified per-PICTURE packed tables for the IN-KERNEL item paint
    # (ops/pallas_paint.py item pass), id space [textures | sprites]:
    # unified id u (mid tex t -> u = t; sprite pic p -> u = T + p) maps
    # to 32 packed texel-word rows (item_q, tex_q packing discipline)
    # and 8 opacity-bit rows (item_mq, bit r%32 of word r//32)
    item_q: jnp.ndarray        # [(T+P)*32, 128] i32
    item_mq: jnp.ndarray       # [(T+P)*8, 128] i32

    # static (non-pytree) metadata
    sky_is_opaque: bool = True
    tex_sizes_pow2: bool = False  # all wall texture dims are powers of two
    # every texture used on a solid/lower/upper wall piece is fully
    # opaque (vanilla-asset invariant; guarantees the resolve winner-fold
    # is exact — see build() and resolve.py)
    wall_tex_all_opaque: bool = True
    # static eligibility for the Pallas paint kernel (wall-piece texture
    # dims <= 256 x 128, opaque wall pieces + opaque sky)
    paint_ok: bool = False
    # tex_q is 256 lanes wide (some wall-piece texture is > 128 wide);
    # the kernel then uses the sky-style two-half lane select
    texq_wide: bool = False
    # static eligibility for the item-composite kernel: every atlas
    # column fits the 128-row packed tables
    items_ok: bool = False
    # static eligibility for the in-kernel item paint (sprites + mids
    # drawn inside the paint kernel): every sprite picture and every
    # drawable-mid texture fits 128x128
    itempaint_ok: bool = False

    _STATIC_FIELDS = (
        "sky_is_opaque", "tex_sizes_pow2", "wall_tex_all_opaque",
        "paint_ok", "texq_wide", "items_ok", "itempaint_ok",
    )

    def tree_flatten(self):
        from dataclasses import fields

        names = tuple(
            f.name for f in fields(self) if f.name not in self._STATIC_FIELDS
        )
        aux = (names, tuple(
            (n, getattr(self, n)) for n in self._STATIC_FIELDS
        ))
        return tuple(getattr(self, n) for n in names), aux

    @classmethod
    def tree_unflatten(cls, aux, values):
        names, static = aux
        kw = dict(zip(names, values))
        kw.update(dict(static))
        return cls(**kw)

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls, tables: MapTables, assets: LevelAssets, info: InfoTables
    ) -> "DeviceLevel":
        t, a = tables, assets
        if t.sub_path_nodes.shape[1] > 62:
            # traversal_rank packs one path bit per BSP level into two
            # i32 words (31 bits each); the reference has no depth limit
            # (map/nodes.rs:45-83) but 62 levels covers any real map.
            raise NotImplementedError(
                f"BSP depth {t.sub_path_nodes.shape[1]} > 62; widen the "
                "two-word rank in camera.traversal_rank"
            )
        lines = t.seg_line
        front_side = t.line_sides[lines, t.seg_dir]
        back_side = t.line_sides[lines, 1 - t.seg_dir]
        front_sector = np.where(
            front_side >= 0, t.side_sector[np.maximum(front_side, 0)], -1
        )
        back_sector = np.where(
            back_side >= 0, t.side_sector[np.maximum(back_side, 0)], -1
        )
        flags = t.line_flags[lines]

        # sky hack is static: both sectors' ceiling flats are SKY
        # (segs.rs:459-477)
        front_sky = np.array(
            ["SKY" in t.sector_ceil_flat[s] if s >= 0 else False
             for s in front_sector]
        )
        back_sky = np.array(
            ["SKY" in t.sector_ceil_flat[s] if s >= 0 else False
             for s in back_sector]
        )
        sky_hack = (back_side >= 0) & front_sky & back_sky
        draw_ceiling = ~sky_hack

        fs_safe = np.maximum(front_side, 0)

        # mobjs: one per THINGS entry except player/deathmatch starts
        # (map_objects.rs:30-47)
        dn = info.mobj_index_by_doomednum()
        keep = ~(
            ((t.thing_type >= 1) & (t.thing_type <= 4)) | (t.thing_type == 11)
        )
        ids = np.nonzero(keep)[0]
        mobj_info_ix = np.array(
            [dn[int(t.thing_type[i])] for i in ids], np.int32
        )
        mobj_pos = t.thing_pos[ids]
        mobj_sector = np.array(
            [t.sector_at(float(p[0]), float(p[1])) for p in mobj_pos], np.int32
        )

        i16c = lambda x: np.clip(np.trunc(x), -32768, 32767).astype(np.int32)

        two_sided_np = (flags & 4) != 0
        dseg_ix = np.nonzero(
            two_sided_np & (np.asarray(a.side_middle_tex[fs_safe]) >= 0)
        )[0].astype(np.int32)

        # Textures drawn as NON-masked wall pieces (solid mids, lowers,
        # uppers).  When all of them are fully opaque — true for every
        # vanilla asset set; transparency lives on two-sided mid textures,
        # which take the exact per-texel deferred path — the resolve
        # winner-fold is bit-exact (see resolve.py).  A transparent texel
        # on one of these pieces deviates from the reference only at
        # 1-pixel span-boundary overlaps (bitmap_render.rs:265 skips and
        # keeps the earlier wall's pixel); flag it loudly at load time.
        mid_np = np.asarray(a.side_middle_tex[fs_safe])
        low_np = np.asarray(a.side_lower_tex[fs_safe])
        up_np = np.asarray(a.side_upper_tex[fs_safe])
        wall_piece_tex = np.unique(np.concatenate([
            mid_np[~two_sided_np], low_np, up_np
        ]))
        wall_piece_tex = wall_piece_tex[wall_piece_tex >= 0]
        tex_opaque = np.array([
            bool(a.tex_mask[ti, : a.tex_h[ti], : a.tex_w[ti]].all())
            for ti in wall_piece_tex
        ])
        wall_tex_all_opaque = bool(tex_opaque.all())
        if not wall_tex_all_opaque:
            import warnings

            bad = wall_piece_tex[~tex_opaque]
            warnings.warn(
                "level uses texture(s) with transparent texels on "
                f"solid/lower/upper wall pieces (tex ids {bad.tolist()}): "
                "pixels where multiple drawn wall spans overlap (span "
                "boundaries) may show black instead of the earlier wall "
                "(reference skip behavior, bitmap_render.rs:265)",
                stacklevel=2,
            )

        # column-major sampling atlas (walls | flats | sprites)
        T_, TH_, TW_ = a.tex_pixels.shape
        F_ = a.flat_pixels.shape[0]
        P_, PH_, PW_ = a.spr_pixels.shape
        rows = max(TH_, 64, PH_)
        tex_cols = np.full((T_ * TW_, rows), -1.0, np.float32)
        tcols = np.where(a.tex_mask, a.tex_pixels.astype(np.float32), -1.0)
        tex_cols[:, :TH_] = tcols.transpose(0, 2, 1).reshape(T_ * TW_, TH_)
        flat_cols = np.full((F_ * 64, rows), -1.0, np.float32)
        flat_cols[:, :64] = (
            a.flat_pixels.astype(np.float32).transpose(0, 2, 1).reshape(-1, 64)
        )
        spr_cols = np.full((P_ * PW_, rows), -1.0, np.float32)
        scols = np.where(a.spr_mask, a.spr_pixels.astype(np.float32), -1.0)
        spr_cols[:, :PH_] = scols.transpose(0, 2, 1).reshape(P_ * PW_, PH_)
        atlas_cols = np.concatenate([tex_cols, flat_cols, spr_cols], 0)
        atlas_cm = np.where(
            atlas_cols >= 0, atlas_cols.astype(np.int32) | (1 << 8), 0
        ).reshape(-1)
        # 4-plane atlas for the paint-path deferred composite: palette
        # index + the three palette rgb bytes per texel (each <= 255, so
        # bf16-exact); lets one one-hot contraction yield idx AND rgb
        pal_u8 = a.palette.astype(np.int64)
        safe_ix = np.maximum(atlas_cols.astype(np.int64), 0)
        atlas_cols4 = np.stack(
            [
                atlas_cols,
                np.where(atlas_cols >= 0, pal_u8[safe_ix, 0], 0),
                np.where(atlas_cols >= 0, pal_u8[safe_ix, 1], 0),
                np.where(atlas_cols >= 0, pal_u8[safe_ix, 2], 0),
            ],
            axis=-1,
        ).astype(np.float32)

        # ---- packed sampling tables for the Pallas paint kernel --------
        # Texel rows packed 4-per-i32 word (byte j = row 4q+j) so the
        # in-kernel 2D lookup needs only 4 sublane-gathers per 8-row
        # pixel block (see ops/pallas_paint.py).  Requires texture dims
        # <= 128; `paint_ok` gates the fast path statically.
        def pack_rows4(img_u8):
            """[h, w] u8 -> [ceil(h/4), w] i32 with 4 rows per word."""
            h, w = img_u8.shape
            hp = (h + 3) & ~3
            p = np.zeros((hp, w), np.int64)
            p[:h] = img_u8
            p = p.reshape(hp // 4, 4, w)
            return (
                p[:, 0] | (p[:, 1] << 8) | (p[:, 2] << 16) | (p[:, 3] << 24)
            ).astype(np.uint32).astype(np.int64).astype(np.int32)

        QT = 32  # q-rows per texture (128 rows / 4)
        # the paint kernel draws only wall-piece textures (mids/sprites
        # take the deferred path, sky has its own table), so eligibility
        # depends on THOSE textures' dims, not the atlas padding.  Wall
        # textures up to 256 wide (stock doom1/doom2 use some) get a
        # 256-lane table + the sky-style two-half lane select in-kernel
        # (texq_wide); narrow levels keep the cheap 128-lane path.
        texq_wide = any(a.tex_w[ti] > 128 for ti in wall_piece_tex)
        TWQ = 256 if texq_wide else 128
        tex_q = np.zeros((T_ * QT, TWQ), np.int32)
        paint_ok = bool(wall_tex_all_opaque) and all(
            a.tex_w[ti] <= TWQ and a.tex_h[ti] <= 128
            for ti in wall_piece_tex
        )
        for ti in range(T_):
            win = a.tex_pixels[ti][:128, :TWQ].astype(np.uint8)
            q = pack_rows4(win)
            tex_q[ti * QT : ti * QT + q.shape[0], : win.shape[1]] = q
        QF = 16  # 64 flat rows / 4
        flat_q = np.zeros((F_ * QF, 128), np.int32)
        for fi in range(F_):
            flat_q[fi * QF : (fi + 1) * QF, :64] = pack_rows4(
                a.flat_pixels[fi].astype(np.uint8)
            )
        # sky: [128, 256] rows packed -> [32, 256]
        sky_np = np.asarray(a.tex_pixels[a.sky_tex], np.uint8)
        sky_q = np.zeros((32, 256), np.int32)
        sh, sw = min(sky_np.shape[0], 128), min(sky_np.shape[1], 256)
        sky_q[: (sh + 3) // 4, :sw] = pack_rows4(sky_np[:sh, :sw])
        paint_ok = paint_ok and bool(a.tex_mask[a.sky_tex].all())
        pal_words = np.zeros((8, 128), np.int32)
        pal_words.reshape(-1)[:256] = (
            (a.palette[:, 0].astype(np.int64) << 16)
            | (a.palette[:, 1].astype(np.int64) << 8)
            | a.palette[:, 2].astype(np.int64)
        ).astype(np.int32)

        # ---- per-COLUMN packed table for the item-composite kernel ----
        # (ops/pallas_items.py): atlas column id -> ONE 40-word row:
        # 32 packed texel words (rows 4-per-word) ++ 8 opacity-bit words
        # (row r = bit r%32 of word 32 + r//32; 4 words cover 128 rows,
        # padded to 8 for sublane alignment).  Same column space as
        # atlas_cols; merged so the pregather is one gather.
        items_ok = rows <= 128
        C_ = atlas_cols.shape[0]
        cq = pack_rows4(
            np.where(atlas_cols >= 0, atlas_cols, 0)
            .astype(np.uint8).T[:min(rows, 128)]
        ).T                                                  # [C, <=32]
        atlas_tmq = np.zeros((C_, 40), np.int32)
        atlas_tmq[:, : cq.shape[1]] = cq
        bits = (atlas_cols >= 0)[:, :min(rows, 128)]         # [C, R]
        maskw = np.zeros((C_, 8), np.int64)
        for r in range(bits.shape[1]):
            maskw[:, r // 32] |= bits[:, r].astype(np.int64) << (r % 32)
        atlas_tmq[:, 32:] = (
            maskw.astype(np.uint64) & 0xFFFFFFFF
        ).astype(np.uint32).astype(np.int64).astype(np.int32)

        # ---- per-PICTURE tables for the in-kernel item paint ----------
        # (ops/pallas_paint.py item pass): dynamic-row-indexed like tex_q
        def pack_maskrows(mask_bool):
            """[h, w] bool -> [8, w] i32, bit r%32 of word r//32."""
            h, w = mask_bool.shape
            m = np.zeros((8, w), np.int64)
            for r in range(min(h, 128)):
                m[r // 32] |= mask_bool[r].astype(np.int64) << (r % 32)
            return (
                m.astype(np.uint64) & 0xFFFFFFFF
            ).astype(np.uint32).astype(np.int64).astype(np.int32)

        U_ = T_ + P_
        item_q = np.zeros((U_ * QT, 128), np.int32)
        # item paint only ever fetches mid textures (<= 128 wide, gated
        # by itempaint_ok), so the narrow half of a wide tex_q suffices
        item_q[: T_ * QT] = tex_q[:, :128]
        item_mq = np.zeros((U_ * 8, 128), np.int32)
        for ti in range(T_):
            item_mq[ti * 8 : (ti + 1) * 8, :] = pack_maskrows(
                a.tex_mask[ti][:128, :128]
            )
        for pi in range(P_):
            ui = T_ + pi
            win = a.spr_pixels[pi][:128, :128].astype(np.uint8)
            q = pack_rows4(win)
            item_q[ui * QT : ui * QT + q.shape[0], : win.shape[1]] = q
            mwin = a.spr_mask[pi][:128, :128]
            item_mq[ui * 8 : (ui + 1) * 8, : mwin.shape[1]] = pack_maskrows(
                mwin
            )
        mid_tex = np.unique(mid_np[two_sided_np])
        mid_tex = mid_tex[mid_tex >= 0]
        itempaint_ok = (
            items_ok
            and bool(np.all(a.spr_w <= 128))
            and bool(np.all(a.spr_h <= 128))
            and all(
                a.tex_w[ti] <= 128 and a.tex_h[ti] <= 128 for ti in mid_tex
            )
        )

        return cls(
            item_q=_j(item_q, jnp.int32),
            item_mq=_j(item_mq, jnp.int32),
            itempaint_ok=itempaint_ok,
            tex_q=_j(tex_q, jnp.int32),
            flat_q=_j(flat_q, jnp.int32),
            sky_q=_j(sky_q, jnp.int32),
            palette_words=_j(pal_words, jnp.int32),
            atlas_tmq=_j(atlas_tmq, jnp.int32),
            paint_ok=paint_ok,
            texq_wide=texq_wide,
            items_ok=items_ok,
            seg_v1=_j(t.vertexes[t.seg_v[:, 0]], jnp.float32),
            seg_v2=_j(t.vertexes[t.seg_v[:, 1]], jnp.float32),
            seg_offset=_j(t.seg_offset, jnp.int32),
            seg_sub=_j(t.seg_sub, jnp.int32),
            seg_front_side=_j(front_side, jnp.int32),
            seg_front_sector=_j(front_sector, jnp.int32),
            seg_back_sector=_j(back_sector, jnp.int32),
            seg_two_sided=_j((flags & 4) != 0),
            seg_unpeg_top=_j((flags & 8) != 0),
            seg_unpeg_bottom=_j((flags & 16) != 0),
            seg_xoff=_j(i16c(t.side_offset[fs_safe, 0]), jnp.int32),
            seg_yoff=_j(i16c(t.side_offset[fs_safe, 1]), jnp.int32),
            seg_mid_tex=_j(a.side_middle_tex[fs_safe], jnp.int32),
            seg_low_tex=_j(a.side_lower_tex[fs_safe], jnp.int32),
            seg_up_tex=_j(a.side_upper_tex[fs_safe], jnp.int32),
            seg_draw_ceiling=_j(draw_ceiling),
            seg_sky_hack=_j(sky_hack),
            node_xy=_j(t.node_xy, jnp.float32),
            node_dxy=_j(t.node_dxy, jnp.float32),
            sub_path_nodes=_j(np.maximum(t.sub_path_nodes, 0), jnp.int32),
            sub_path_left=_j(t.sub_path_left, jnp.int32),
            sub_depth=_j(t.sub_depth, jnp.int32),
            sub_sector=_j(t.sub_sector, jnp.int32),
            node_child=_j(t.node_child, jnp.int32),
            sub_nseg=_j(
                np.bincount(
                    np.asarray(t.seg_sub),
                    minlength=t.sub_path_nodes.shape[0],
                ),
                jnp.int32,
            ),
            # robust to non-contiguous subsector seg ranges: counts
            # same-subsector predecessors, not i - first_seg
            seg_local=_j(_seg_local(np.asarray(t.seg_sub)), jnp.int32),
            sector_floor_h=_j(t.sector_floor_h, jnp.int32),
            sector_ceil_h=_j(t.sector_ceil_h, jnp.int32),
            sector_light0=_j(t.sector_light, jnp.int32),
            sector_floor_flat=_j(a.sector_floor_flat, jnp.int32),
            sector_ceil_flat=_j(a.sector_ceil_flat, jnp.int32),
            palette=_j(a.palette, jnp.float32),
            flat_pixels=_j(a.flat_pixels, jnp.int32),
            flat_is_sky=_j(a.flat_is_sky),
            flat_anim_base=_j(a.flat_anim_base, jnp.int32),
            flat_anim_len=_j(a.flat_anim_len, jnp.int32),
            tex_pixels=_j(a.tex_pixels, jnp.int32),
            tex_mask=_j(a.tex_mask),
            tex_w=_j(a.tex_w, jnp.int32),
            tex_h=_j(a.tex_h, jnp.int32),
            sky_tex=_j(a.sky_tex, jnp.int32),
            spr_pixels=_j(a.spr_pixels, jnp.int32),
            spr_mask=_j(a.spr_mask),
            spr_w=_j(a.spr_w, jnp.int32),
            spr_h=_j(a.spr_h, jnp.int32),
            spr_top=_j(a.spr_top, jnp.int32),
            spr_table=_j(a.spr_table, jnp.int32),
            state_sprite=_j(info.state_sprite, jnp.int32),
            state_frame=_j(info.state_frame, jnp.int32),
            state_full_bright=_j(info.state_full_bright),
            state_tics=_j(info.state_tics, jnp.int32),
            state_next=_j(info.state_next, jnp.int32),
            mobj_pos=_j(mobj_pos, jnp.float32),
            mobj_angle=_j(t.thing_angle[ids], jnp.float32),
            mobj_sector=_j(mobj_sector, jnp.int32),
            mobj_info=_j(mobj_info_ix, jnp.int32),
            mobj_spawn_state=_j(info.mobj_spawn[mobj_info_ix], jnp.int32),
            mobj_death_state=_j(info.mobj_death[mobj_info_ix], jnp.int32),
            mobj_xdeath_state=_j(info.mobj_xdeath[mobj_info_ix], jnp.int32),
            dseg_ix=_j(dseg_ix, jnp.int32),
            atlas_cols=_j(atlas_cols, jnp.bfloat16),
            atlas_cols4=_j(atlas_cols4, jnp.bfloat16),
            atlas_cm=_j(atlas_cm, jnp.int32),
            palette_packed=_j(
                (a.palette[:, 0].astype(np.int32) << 16)
                | (a.palette[:, 1].astype(np.int32) << 8)
                | a.palette[:, 2].astype(np.int32),
                jnp.int32,
            ),
            sky_is_opaque=bool(a.tex_mask[a.sky_tex].all()),
            wall_tex_all_opaque=wall_tex_all_opaque,
            tex_sizes_pow2=bool(
                np.all((a.tex_w & (a.tex_w - 1)) == 0)
                and np.all((a.tex_h & (a.tex_h - 1)) == 0)
            ),
        )

    @property
    def num_segs(self) -> int:
        return self.seg_v1.shape[0]

    @property
    def num_sectors(self) -> int:
        return self.sector_floor_h.shape[0]

    @property
    def num_mobjs(self) -> int:
        return self.mobj_pos.shape[0]

    @property
    def atlas_rows(self) -> int:
        return self.atlas_cols.shape[1]

    @property
    def col_flat_off(self) -> int:
        """First flat column in atlas_cols."""
        return self.tex_pixels.shape[0] * self.tex_pixels.shape[2]

    @property
    def col_spr_off(self) -> int:
        """First sprite column in atlas_cols."""
        return self.col_flat_off + self.flat_pixels.shape[0] * 64
