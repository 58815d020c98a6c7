"""Tile-binned Pallas rasterizer (the TPU fast path).

TPU-native replacement for the reference's per-(batch, triangle) CUDA
rasterizer with its packed ``atomicMin`` z-buffer
(`src/rasterize/rasterize_kernel.cu:43-168` in facebookresearch/DRTK).

Design (SURVEY.md §7.1/§7.3):

* **Phase A — setup + sorted segments (XLA).** Reuses
  :func:`drtk_tpu.ops.rasterize.triangle_setup` (canonical vertex-ordered
  edge functions, top-left fill rule, near-plane/canvas/degenerate culls),
  then builds per-tile work lists for 32x128-pixel tiles:

  - each triangle's tile span is enumerated into (tile, triangle) pairs
    (at most ``MAX_SPAN`` tiles per triangle);
  - ONE packed-key sort orders the pairs by tile, and ONE row gather puts
    the 16-float setup rows into sorted order. Each tile's work list is
    then a **contiguous segment** ``[start[t], start[t]+count[t])`` of the
    sorted arrays — exact-sized, no per-tile capacity, no overflow. (An
    earlier design gathered fixed-capacity dense bins ``[T, CAP, 16]``;
    the gather lane-padded 8x in HBM and bin overflow flooded a global
    list that every tile had to march — the dense-scene cliff. Segments
    remove both failure modes.)
  - triangles spanning more than ``MAX_SPAN`` tiles bin **hierarchically**
    against a ``SUPER x SUPER``-tile coarse grid (segments ``n_tiles + s``
    of the same sorted arrays, marched by every tile inside supertile
    ``s``), so even a mesh of large triangles costs each tile only its
    supertile's share; only triangles spanning more than ``MAX_SPAN``
    supertiles (~>=1k-px extents) go to the per-batch **global list**
    processed by every tile. The z-test is idempotent, so duplicated
    triangles are harmless (SURVEY.md §7.3.6).

* **Phase B — per-tile resolve (Pallas).** One program per (batch, tile).
  Each tile streams its segment from HBM in ``CHUNK``-pair slabs through
  SMEM (chunk origins aligned to the (8, 128) tiling so Mosaic can prove
  the dynamic DMA offsets; the in-chunk range ``[lo, hi)`` is exact, so
  alignment slack is fetched but never processed). The packed-``atomicMin``
  trick becomes a sequential masked minimum over the segment, with the
  running (inverse-depth, id) z-buffer living in registers/VMEM. DRTK's
  deterministic tie-break is preserved: larger inverse depth wins, exact
  ties go to the smaller triangle id (the id sits in the low bits of the
  reference's packed key, rasterize_kernel.cu:155-161).

Outputs match the reference contract exactly: int32 ``index_img`` with -1
background, float depth with 0 background (unpack_kernel, :402-415). The
kernel is validated against the portable XLA path in
tests/test_rasterize_pallas.py: index images must match exactly except at
FMA-contraction depth ties, depth to ulps (see CLAUDE.md invariants).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drtk_tpu.ops.math import epsclamp
from drtk_tpu.ops.rasterize import _canvas_cull, triangle_setup

__all__ = ["rasterize_pallas", "rasterize_lines_pallas"]

TILE_H = 32
TILE_W = 128
MAX_SPAN = 4  # max grid cells a binned triangle may cover at either level
SUPER = 4  # supertile = SUPER x SUPER tiles (hierarchical binning, level 2)
_INT32_MAX = jnp.iinfo(jnp.int32).max
_NEG_INF = float("-inf")

# Segment-streaming granularity: CHUNK pairs = (CHUNK*16/128) f32 rows and
# (CHUNK/128) id rows per DMA. 1024 pairs makes BOTH row offsets provable
# multiples of 8 (the f32/int32 sublane tile), the smallest chunk for which
# that holds for the id array.
_CHUNK = 1024
_SEG_ROWS = _CHUNK * 16 // 128  # 128 setup rows per chunk
_SID_ROWS = _CHUNK // 128  # 8 id rows per chunk

_GCHUNK = 512  # global-list triangles per DMA chunk


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def _out_struct(shape, dtype, *refs):
    """ShapeDtypeStruct whose varying-manual-axes set is the union of the
    refs' — required by pallas_call under shard_map (check_vma); plain
    ShapeDtypeStruct elsewhere / on older jax."""
    try:
        vma = set()
        for r in refs:
            vma |= set(jax.typeof(r).vma)
        return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset(vma))
    except (AttributeError, TypeError):  # pragma: no cover - older jax
        return jax.ShapeDtypeStruct(shape, dtype)


# --------------------------------------------------------------------------
# Phase A: setup + sorted segments (XLA, per batch element — vmapped)
# --------------------------------------------------------------------------


def _pack_setup(setup, valid):
    """[F, 16] float32 rows: ea(3), eb(3), ec(3), q(3), tlpack(1),
    ymin(1), ymax(1), valid(1).

    The three topleft flags ride one field as tl0 + 2*tl1 + 4*tl2 (exact
    small ints in f32; the kernel decodes them with three scalar
    compares), freeing two fields for the triangle's GLOBAL pixel-row
    bbox — the kernel predicates its 8-row group evaluation on it, so a
    ~8-px-tall triangle costs 1-2 (8, 128) VREG evaluations instead of
    the whole 32-row tile (~60 % of the resolve kernel's VPU work on the
    51k-tri 1024^2 scene was rows the triangle could never cover)."""
    tl = setup.topleft.astype(jnp.float32)
    tlpack = tl[..., 0] + 2.0 * tl[..., 1] + 4.0 * tl[..., 2]
    return jnp.concatenate(
        [
            setup.ea,
            setup.eb,
            setup.ec,
            setup.q,
            tlpack[..., None],
            setup.bbox[..., 1:2].astype(jnp.float32),  # ymin (global rows)
            setup.bbox[..., 3:4].astype(jnp.float32),  # ymax
            valid.astype(jnp.float32)[..., None],
        ],
        axis=-1,
    )


def _sort_pairs(flat_tile, n_tiles):
    """Stable sort of (tile, pair-index) pairs by tile.

    Single packed-key sort (tile in the high bits, pair index in the low
    bits): one lax.sort, no permutation gathers. Stability comes from the
    embedded index, so within a tile entries stay in ascending pair (and
    therefore triangle) order. Picks the narrowest key type that fits
    (tile <= n_tiles sentinel, index < P); falls back to a stable argsort
    for huge problems. Returns (sorted_tile, sorted_pair_index), int32.
    """
    p_total = flat_tile.shape[0]
    shift = _next_pow2(p_total)
    key_max = (n_tiles + 1) * shift + p_total
    if key_max < 2**31:
        packed = jax.lax.sort(
            flat_tile * shift + jax.lax.iota(jnp.int32, p_total)
        )
        return packed // shift, packed % shift
    if key_max < 2**32:
        packed = jax.lax.sort(
            flat_tile.astype(jnp.uint32) * jnp.uint32(shift)
            + jax.lax.iota(jnp.uint32, p_total)
        )
        return (
            (packed // jnp.uint32(shift)).astype(jnp.int32),
            (packed % jnp.uint32(shift)).astype(jnp.int32),
        )
    order = jnp.argsort(flat_tile, stable=True)
    return flat_tile[order], order.astype(jnp.int32)


def _segment_pairs(setup_rows, bbox, valid, n_tx, n_ty, tile_h=TILE_H):
    """Sorted-segment work lists for ONE batch element — two-level
    hierarchical binning.

    Triangles spanning <= MAX_SPAN tiles bin against the fine tile grid;
    larger ones bin against a SUPER x SUPER-tile coarse grid (segment ids
    n_tiles + s, marched by every tile inside supertile s); only triangles
    spanning > MAX_SPAN supertiles (>= ~1k px extents at the default tile)
    fall to the global list every tile marches. This removes the dense
    large-triangle cliff: a mesh of ~64-tile-span triangles costs each tile
    its supertile's segment (~1/16th of the old every-tile global march).

    Returns (seg_rows [P, 16] f32 — setup rows in segment-sorted pair order,
             seg_ids [P] i32 — triangle ids in the same order,
             starts [T + TS] i32, counts [T + TS] i32 — fine tiles then
             supertiles, each a contiguous segment of the sorted arrays,
             gmask [F] bool, gcount [1] — the big-span global set).

    Dead pairs (beyond a triangle's span, culled, or global) sort to the
    tail via the sentinel; their gathered rows are garbage but no segment's
    exact [start, start+count) range ever reaches them.
    """
    f_cnt = setup_rows.shape[0]
    n_tiles = n_tx * n_ty
    n_sx = -(-n_tx // SUPER)
    n_sy = -(-n_ty // SUPER)
    n_super = n_sx * n_sy
    n_segs = n_tiles + n_super

    tx0 = jnp.clip(jnp.floor(bbox[:, 0] / TILE_W).astype(jnp.int32), 0, n_tx - 1)
    ty0 = jnp.clip(jnp.floor(bbox[:, 1] / tile_h).astype(jnp.int32), 0, n_ty - 1)
    tx1 = jnp.clip(jnp.floor(bbox[:, 2] / TILE_W).astype(jnp.int32), 0, n_tx - 1)
    ty1 = jnp.clip(jnp.floor(bbox[:, 3] / tile_h).astype(jnp.int32), 0, n_ty - 1)
    sx = tx1 - tx0 + 1
    sy = ty1 - ty0 + 1
    span = sx * sy
    fine = span <= MAX_SPAN

    # Supertile coords derived from the (clipped) tile coords.
    stx0, sty0 = tx0 // SUPER, ty0 // SUPER
    stx1, sty1 = tx1 // SUPER, ty1 // SUPER
    ssx = stx1 - stx0 + 1
    ssy = sty1 - sty0 + 1
    sspan = ssx * ssy
    coarse = (~fine) & (sspan <= MAX_SPAN)
    big = (~fine) & (~coarse)

    # Enumerate (segment, tri) pairs: fine triangles against tile cells,
    # coarse ones against supertile cells — MAX_SPAN slots either way.
    k = jnp.arange(MAX_SPAN, dtype=jnp.int32)  # [S]
    w_eff = jnp.where(fine, sx, ssx)[:, None]
    dx = k[None, :] % w_eff
    dy = k[None, :] // w_eff
    fine_seg = (ty0[:, None] + dy) * n_tx + (tx0[:, None] + dx)
    coarse_seg = n_tiles + (sty0[:, None] + dy) * n_sx + (stx0[:, None] + dx)
    pair_seg = jnp.where(fine[:, None], fine_seg, coarse_seg)  # [F, S]
    pair_ok = (
        (k[None, :] < jnp.where(fine, span, sspan)[:, None])
        & valid[:, None]
        & (~big[:, None])
    )
    pair_seg = jnp.where(pair_ok, pair_seg, n_segs)  # sentinel -> sorts last

    flat_seg = pair_seg.reshape(-1)  # [P]
    sorted_seg, sorted_pair = _sort_pairs(flat_seg, n_segs)
    del sorted_seg
    seg_ids = sorted_pair // MAX_SPAN  # triangle id per sorted pair

    counts = (
        jnp.zeros((n_segs + 1,), jnp.int32).at[flat_seg].add(1)[:n_segs]
    )
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )

    # ONE row gather into sorted order; the [P, 16] lane-padded result is a
    # single transient feeding the kernel-layout reshape.
    seg_rows = setup_rows[seg_ids]  # [P, 16]

    gmask = big & valid
    gcount = jnp.sum(gmask).astype(jnp.int32)
    return seg_rows, seg_ids, starts, counts, gmask, gcount[None]


# --------------------------------------------------------------------------
# Phase B: the per-tile Pallas kernel
# --------------------------------------------------------------------------


def _tile_kernel(
    starts_ref,  # [N, T] int32 (scalar prefetch)
    counts_ref,  # [N, T] int32 (scalar prefetch)
    gcounts_ref,  # [N, 1] int32 (scalar prefetch)
    yoff_ref,  # [1] int32 (scalar prefetch) — viewport row offset
    seg_hbm,  # [N, (P+CHUNK)*16//128, 128] ANY/HBM f32 (full array)
    sid_hbm,  # [N, (P+CHUNK)//128, 128] ANY/HBM int32 (full array)
    gbins_hbm,  # [N, F*16//128, 128] ANY/HBM f32 (full array)
    gids_hbm,  # [N, F//128, 128] ANY/HBM int32 (full array)
    di_ref,  # (1, TILE_H, TILE_W) out
    id_ref,  # (1, TILE_H, TILE_W) out
    seg_scr,  # SMEM (_SEG_ROWS, 128) f32 scratch
    sid_scr,  # SMEM (_SID_ROWS, 128) int32 scratch
    gsetup_scr,  # SMEM (GCHUNK*16//128, 128) f32 scratch
    gids_scr,  # SMEM (GCHUNK//128, 128) int32 scratch
    sem0,
    sem1,
    sem2,
    sem3,
    *,
    n_tx: int,
    n_ty: int,
    tile_h: int,
):
    n = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    tile = ty * n_tx + tx

    # Per 8-row group pixel grids: one (8, 128) VREG each. The x iota is
    # row-invariant; y adds the group's global row base at use sites.
    n_groups = tile_h // 8
    px8 = (
        jax.lax.broadcasted_iota(jnp.int32, (8, TILE_W), 1) + tx * TILE_W
    ).astype(jnp.float32)
    py8 = jax.lax.broadcasted_iota(jnp.int32, (8, TILE_W), 0).astype(
        jnp.float32
    )
    # Global pixel rows: the viewport offset keeps the per-pixel float math
    # identical to the full-frame evaluation (bit-exact row tiles).
    row_base = (ty * tile_h + yoff_ref[0]).astype(jnp.float32)

    def make_body(read_field, read_id, lo, hi):
        # Unrolled x4: amortizes per-iteration loop/sync overhead over four
        # triangles; slots outside the exact [lo, hi) range are skipped via
        # the scalar live flag (alignment slack and neighbouring tiles'
        # pairs are fetched but never scored).
        def one(k, groups):
            live = (k >= lo) & (k < hi)
            base = k * 16
            ea0 = read_field(base + 0)
            ea1 = read_field(base + 1)
            ea2 = read_field(base + 2)
            eb0 = read_field(base + 3)
            eb1 = read_field(base + 4)
            eb2 = read_field(base + 5)
            ec0 = read_field(base + 6)
            ec1 = read_field(base + 7)
            ec2 = read_field(base + 8)
            q0 = read_field(base + 9)
            q1 = read_field(base + 10)
            q2 = read_field(base + 11)
            tlp = read_field(base + 12)
            ymin = read_field(base + 13)
            ymax = read_field(base + 14)
            tri_id = read_id(k)
            # Decode the packed topleft flags (tl0 + 2*tl1 + 4*tl2, exact
            # small ints): three scalar compares.
            tl2 = tlp >= 4.0
            rem = tlp - jnp.where(tl2, 4.0, 0.0)
            tl1 = rem >= 2.0
            tl0 = (rem - jnp.where(tl1, 2.0, 0.0)) >= 1.0

            def hit(g, di, best):
                py = py8 + (row_base + 8.0 * g)
                e0 = ea0 * px8 + eb0 * py + ec0
                e1 = ea1 * px8 + eb1 * py + ec1
                e2 = ea2 * px8 + eb2 * py + ec2
                keep = (
                    ((e0 > 0) | ((e0 == 0) & tl0))
                    & ((e1 > 0) | ((e1 == 0) & tl1))
                    & ((e2 > 0) | ((e2 == 0) & tl2))
                )
                di_tri = e0 * q0 + e1 * q1 + e2 * q2
                better = (di_tri > di) | ((di_tri == di) & (tri_id < best))
                upd = keep & better
                return (
                    jnp.where(upd, di_tri, di),
                    jnp.where(upd, tri_id, best),
                )

            out = []
            for g, (di, best) in enumerate(groups):
                # Evaluate ONLY row groups the triangle's y-bbox touches
                # (same conservative bound the tile binning already uses,
                # at 8-row instead of tile_h granularity) — a real branch,
                # so skipped groups cost nothing.
                g0 = row_base + 8.0 * g
                pred = live & (ymax >= g0) & (ymin <= g0 + 7.0)
                out.append(
                    jax.lax.cond(
                        pred,
                        lambda di=di, best=best, g=g: hit(g, di, best),
                        lambda di=di, best=best: (di, best),
                    )
                )
            return tuple(out)

        def body(c, carry):
            k = c * 4
            carry = one(k, carry)
            carry = one(k + 1, carry)
            carry = one(k + 2, carry)
            carry = one(k + 3, carry)
            return carry

        return body

    groups0 = tuple(
        (
            jnp.full((8, TILE_W), _NEG_INF, jnp.float32),
            jnp.full((8, TILE_W), _INT32_MAX, jnp.int32),
        )
        for _ in range(n_groups)
    )

    def march_segment(seg, carry):
        """Stream segment ``seg`` of the sorted pair arrays through SMEM in
        CHUNK-pair slabs and fold it into the z-buffer carry."""
        start = starts_ref[n, seg]
        cnt = counts_ref[n, seg]
        cbase = start // jnp.int32(_CHUNK)  # first chunk touched
        k0 = start - cbase * jnp.int32(_CHUNK)  # in-chunk segment offset
        nch = jnp.where(
            cnt > 0,
            (k0 + cnt + jnp.int32(_CHUNK - 1)) // jnp.int32(_CHUNK),
            jnp.int32(0),
        )

        def seg_chunk(c, carry):
            cp0 = pltpu.make_async_copy(
                seg_hbm.at[n, pl.ds((cbase + c) * _SEG_ROWS, _SEG_ROWS), :],
                seg_scr,
                sem0,
            )
            cp1 = pltpu.make_async_copy(
                sid_hbm.at[n, pl.ds((cbase + c) * _SID_ROWS, _SID_ROWS), :],
                sid_scr,
                sem1,
            )
            cp0.start()
            cp1.start()
            cp0.wait()
            cp1.wait()
            lo = jnp.maximum(k0 - c * jnp.int32(_CHUNK), 0)
            hi = jnp.minimum(k0 + cnt - c * jnp.int32(_CHUNK), jnp.int32(_CHUNK))
            return jax.lax.fori_loop(
                lo // jnp.int32(4),
                (hi + jnp.int32(3)) // jnp.int32(4),
                make_body(
                    lambda i: seg_scr[i // 128, i % 128],
                    lambda k: sid_scr[k // 128, k % 128],
                    lo,
                    hi,
                ),
                carry,
            )

        return jax.lax.fori_loop(0, nch, seg_chunk, carry)

    # --- The tile's own contiguous segment, then the enclosing supertile's
    # (hierarchical binning level 2: triangles too big for the fine grid).
    groups = march_segment(tile, groups0)
    n_tiles = n_tx * n_ty
    n_sx = -(-n_tx // SUPER)
    stile = (ty // SUPER) * n_sx + (tx // SUPER)
    groups = march_segment(n_tiles + stile, groups)

    # --- Global list: stream SMEM-sized chunks from HBM. The DMA per chunk
    # is the same for every tile; the z-test is idempotent so order is free.
    gcount = gcounts_ref[n, 0]
    rows_f = _GCHUNK * 16 // 128
    rows_i = _GCHUNK // 128

    def chunk_body(c, carry):
        cp0 = pltpu.make_async_copy(
            gbins_hbm.at[n, pl.ds(c * rows_f, rows_f), :], gsetup_scr, sem2
        )
        cp1 = pltpu.make_async_copy(
            gids_hbm.at[n, pl.ds(c * rows_i, rows_i), :], gids_scr, sem3
        )
        cp0.start()
        cp1.start()
        cp0.wait()
        cp1.wait()
        cnt_g = jnp.minimum(gcount - c * jnp.int32(_GCHUNK), jnp.int32(_GCHUNK))
        return jax.lax.fori_loop(
            0,
            (cnt_g + jnp.int32(3)) // jnp.int32(4),
            make_body(
                lambda i: gsetup_scr[i // 128, i % 128],
                lambda k: gids_scr[k // 128, k % 128],
                jnp.int32(0),
                cnt_g,
            ),
            carry,
        )

    n_gchunks = (gcount + jnp.int32(_GCHUNK - 1)) // jnp.int32(_GCHUNK)
    groups = jax.lax.fori_loop(0, n_gchunks, chunk_body, groups)

    for g in range(n_groups):
        di_ref[0, g * 8 : (g + 1) * 8, :] = groups[g][0]
        id_ref[0, g * 8 : (g + 1) * 8, :] = groups[g][1]


# --------------------------------------------------------------------------
# Public entry
# --------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "interpret", "tile_h", "full_height"),
)
def rasterize_pallas(
    v: jnp.ndarray,
    vi: jnp.ndarray,
    height: int,
    width: int,
    interpret: bool = False,
    tile_h: int = TILE_H,
    y_offset=0,
    full_height: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tile-binned rasterization. Same contract as the XLA path:
    returns (depth_img [N, H, W] f32, index_img [N, H, W] i32).

    ``y_offset``/``full_height`` select a row-tile viewport (rows
    [y_offset, y_offset + height) of the full frame) bit-exactly, as in
    rasterize._rasterize_xla: binning happens against viewport-local tile
    rows while every per-pixel edge evaluation uses global coordinates, so
    the per-shard result equals the corresponding rows of the full-frame
    kernel. ``y_offset`` may be a traced per-device value (shard_map)."""
    n, f_cnt = vi.shape[0], vi.shape[1]
    n_ty = -(-height // tile_h)
    n_tx = -(-width // TILE_W)
    n_tiles = n_ty * n_tx
    y_off = jnp.asarray(y_offset, jnp.int32).reshape(())

    setup = triangle_setup(v.astype(jnp.float32), vi)
    valid = _canvas_cull(setup, full_height or height, width)
    if full_height is not None:
        # Viewport cull (conservative, hence bit-exact): a pixel row y can
        # only be covered when bbox_min_y <= y <= bbox_max_y, so triangles
        # strictly outside [y_offset, y_offset + height) never bin.
        yof = y_off.astype(setup.bbox.dtype)
        valid = valid & (setup.bbox[..., 3] >= yof) & (
            setup.bbox[..., 1] <= yof + (height - 1)
        )
    setup_rows = _pack_setup(setup, valid)  # [N, F, 16]

    # Pad F to the global-chunk granularity for aligned DMA slices. (F*16
    # and F are then also multiples of 128, as the reshapes below need.)
    f_pad = -f_cnt % _GCHUNK
    if f_pad:
        setup_rows = jnp.pad(setup_rows, ((0, 0), (0, f_pad), (0, 0)))
        bbox_p = jnp.pad(setup.bbox, ((0, 0), (0, f_pad), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, f_pad)))
    else:
        bbox_p = setup.bbox
    f_tot = f_cnt + f_pad
    p_tot = f_tot * MAX_SPAN

    # Binning runs in viewport-local rows (bbox shifted by y_offset); the
    # kernel shifts its pixel grid back to global coordinates.
    bbox_local = bbox_p - jnp.stack(
        [jnp.int32(0), y_off, jnp.int32(0), y_off]
    ).astype(bbox_p.dtype)

    seg_rows, seg_ids, starts, counts, gmask, gcounts = jax.vmap(
        lambda rows, bbox, val: _segment_pairs(
            rows, bbox, val, n_tx, n_ty, tile_h
        )
    )(setup_rows, bbox_local, valid)

    # Global-list construction (sort + row gather) is skipped at runtime
    # when no triangle went global — the common case for real meshes. The
    # python batch loop keeps lax.cond a true runtime branch.
    gshift = _next_pow2(f_tot)

    def build_globals(args):
        gmask_b, rows_b = args
        gpacked = jax.lax.sort(
            jnp.where(gmask_b, 0, gshift) + jax.lax.iota(jnp.int32, f_tot)
        )
        gids_b = (gpacked % gshift).astype(jnp.int32)  # globals first
        return gids_b, rows_b[gids_b]

    def empty_globals(args):
        gmask_b, rows_b = args
        # vary_like: under shard_map both branches must agree on manual-axis
        # varying-ness (the taken branch's gids depend on per-shard data).
        from drtk_tpu.ops.math import vary_like

        return vary_like(jax.lax.iota(jnp.int32, f_tot), gmask_b), rows_b

    per_b = [
        jax.lax.cond(
            gcounts[b, 0] > 0,
            build_globals,
            empty_globals,
            (gmask[b], setup_rows[b]),
        )
        for b in range(n)
    ]
    gids = jnp.stack([p[0] for p in per_b])
    gbins = jnp.stack([p[1] for p in per_b])

    # Kernel HBM layouts. Dynamic DMA offsets must be provably (8, 128)-
    # tile-aligned, hence the CHUNK granularity; one extra zero chunk pads
    # the tail so the last tile's chunk fetch stays in bounds (the exact
    # [lo, hi) range never *processes* the slack).
    seg_rows = jnp.pad(seg_rows, ((0, 0), (0, _CHUNK), (0, 0)))
    seg_ids = jnp.pad(seg_ids, ((0, 0), (0, _CHUNK)))
    seg_rows = seg_rows.reshape(n, (p_tot + _CHUNK) * 16 // 128, 128)
    seg_ids = seg_ids.reshape(n, (p_tot + _CHUNK) // 128, 128)
    gbins = gbins.reshape(n, f_tot * 16 // 128, 128)
    gids = gids.reshape(n, f_tot // 128, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # starts, counts, gcounts, yoff
        grid=(n, n_ty, n_tx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # seg rows stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # seg ids stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # gbins stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # gids stay in HBM
        ],
        scratch_shapes=[
            pltpu.SMEM((_SEG_ROWS, 128), jnp.float32),
            pltpu.SMEM((_SID_ROWS, 128), jnp.int32),
            pltpu.SMEM((_GCHUNK * 16 // 128, 128), jnp.float32),
            pltpu.SMEM((_GCHUNK // 128, 128), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        out_specs=[
            pl.BlockSpec(
                (1, tile_h, TILE_W),
                lambda n_, ty, tx, *_: (n_, ty, tx),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_h, TILE_W),
                lambda n_, ty, tx, *_: (n_, ty, tx),
                memory_space=pltpu.VMEM,
            ),
        ],
    )

    di_img, id_img = pl.pallas_call(
        functools.partial(_tile_kernel, n_tx=n_tx, n_ty=n_ty, tile_h=tile_h),
        grid_spec=grid_spec,
        out_shape=[
            _out_struct(
                (n, n_ty * tile_h, n_tx * TILE_W), jnp.float32,
                starts, seg_rows, y_off,
            ),
            _out_struct(
                (n, n_ty * tile_h, n_tx * TILE_W), jnp.int32,
                starts, seg_rows, y_off,
            ),
        ],
        interpret=interpret,
    )(starts, counts, gcounts, y_off[None], seg_rows, seg_ids, gbins, gids)

    di_img = di_img[:, :height, :width]
    id_img = id_img[:, :height, :width]

    covered = id_img != _INT32_MAX
    index_img = jnp.where(covered, id_img, -1)
    depth_img = jnp.where(covered, 1.0 / epsclamp(di_img), 0.0).astype(v.dtype)
    return depth_img, index_img


# --------------------------------------------------------------------------
# Wireframe (diamond-exit) mode — rasterize_lines_kernel (kernel.cu:220-399)
# --------------------------------------------------------------------------

# Wireframe rows carry vertex positions and flags on top of the edge setup,
# so they are 32 floats wide. The triangle id rides IN the row as two
# 14-bit halves (fields 25/26, exact in f32 up to the 2^28 face-count
# contract), which removes the separate id array and lets the chunk shrink
# to 512 pairs while keeping every DMA offset a multiple of 8 rows.
_LINE_FIELDS = 32
_LCHUNK = 512
_LSEG_ROWS = _LCHUNK * _LINE_FIELDS // 128  # 128 rows per segment chunk
_LGCHUNK = 512
_ID_SPLIT = 16384  # 2^14


def _pack_setup_lines(setup, v, vi):
    """[F, 32] float32 wireframe rows.

    Layout: ea(0:3), eb(3:6), ec(6:9), topleft(9:12), p0/p1/p2 xy(12:18),
    d_inv(18:21), inv_den(21), vis flags(22:25), id_hi(25), id_lo(26),
    pad(27:32). Mirrors the operands of rasterize_lines_kernel
    (kernel.cu:330-399)."""
    from drtk_tpu.ops.rasterize import _gather_faces

    n, f_cnt = vi.shape[0], vi.shape[1]
    flags = (vi[..., 0].astype(jnp.uint32) >> jnp.uint32(28)).astype(jnp.int32)
    vis = jnp.stack(
        [(flags & 1) != 0, (flags & 2) != 0, (flags & 4) != 0], axis=-1
    ).astype(jnp.float32)

    vi0 = (vi[..., 0].astype(jnp.uint32) & jnp.uint32(0x0FFFFFFF)).astype(
        jnp.int32
    )
    vi_m = jnp.stack([vi0, vi[..., 1], vi[..., 2]], axis=-1)
    fverts = _gather_faces(v.astype(jnp.float32), vi_m)  # [N, F, 3, 3]
    p = fverts[..., :2].reshape(n, f_cnt, 6)  # p0x p0y p1x p1y p2x p2y
    z = fverts[..., 2]
    d_inv = 1.0 / epsclamp(z)

    p0, p1, p2 = fverts[..., 0, :2], fverts[..., 1, :2], fverts[..., 2, :2]
    v01 = p1 - p0
    v02 = p2 - p0
    den_abs = jnp.abs(v01[..., 0] * v02[..., 1] - v01[..., 1] * v02[..., 0])
    inv_den = 1.0 / jnp.where(den_abs == 0, 1.0, den_abs)

    tri = jnp.arange(f_cnt, dtype=jnp.int32)[None]
    id_hi = (tri // _ID_SPLIT).astype(jnp.float32)
    id_lo = (tri % _ID_SPLIT).astype(jnp.float32)
    id_hi = jnp.broadcast_to(id_hi, (n, f_cnt))
    id_lo = jnp.broadcast_to(id_lo, (n, f_cnt))

    return jnp.concatenate(
        [
            setup.ea,
            setup.eb,
            setup.ec,
            setup.topleft.astype(jnp.float32),
            p,
            d_inv,
            inv_den[..., None],
            vis,
            id_hi[..., None],
            id_lo[..., None],
            jnp.zeros((n, f_cnt, 5), jnp.float32),
        ],
        axis=-1,
    )


def _lines_tile_kernel(
    starts_ref,  # [N, T] int32 (scalar prefetch)
    counts_ref,  # [N, T] int32 (scalar prefetch)
    gcounts_ref,  # [N, 1] int32 (scalar prefetch)
    yoff_ref,  # [1] int32 (scalar prefetch) — viewport row offset
    seg_hbm,  # [N, (P+LCHUNK)*32//128, 128] ANY/HBM f32
    gbins_hbm,  # [N, F*32//128, 128] ANY/HBM f32
    di_ref,  # (1, TILE_H, TILE_W) out
    id_ref,  # (1, TILE_H, TILE_W) out
    seg_scr,  # SMEM (_LSEG_ROWS, 128) f32 scratch
    gsetup_scr,  # SMEM (LGCHUNK*32//128, 128) f32 scratch
    sem0,
    sem1,
    *,
    n_tx: int,
    n_ty: int,
    height: int,  # FULL canvas height (the border test is global)
    width: int,
):
    n = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    tile = ty * n_tx + tx

    pxi = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) + tx * TILE_W
    pyi = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
        + ty * TILE_H
        + yoff_ref[0]
    )
    px = pxi.astype(jnp.float32)
    py = pyi.astype(jnp.float32)
    # Frame-border pixels are never written (kernel.cu:337-339).
    border_ok = (
        (pxi >= 1) & (pxi <= width - 2) & (pyi >= 1) & (pyi <= height - 2)
    )
    half = jnp.float32(0.5)

    def make_body(read_field, lo, hi):
        def diamond_cross(p1x, p1y, p2x, p2y):
            # is_crossing_dimond (kernel.cu:220-259); p1/p2 scalar,
            # pixel-grid vectorized. Expressions mirror
            # rasterize._diamond_crossing exactly for parity.
            a0 = p1y - p2y
            b0 = p2x - p1x
            c0 = p1x * p2y - p2x * p1y

            def in_seg(ax, ay, bx, by, cx, cy):
                return (
                    (((bx >= cx) & (cx >= ax)) | ((bx <= cx) & (cx <= ax)))
                    & (((by >= cy) & (cy >= ay)) | ((by <= cy) & (cy <= ay)))
                )

            def seg_cross(s0x, s0y, s1x, s1y):
                a2 = s0y - s1y
                b2 = s1x - s0x
                c2 = s0x * s1y - s1x * s0y
                d = a0 * b2 - a2 * b0
                big = jnp.float32(jnp.finfo(jnp.float32).max)
                safe_d = jnp.where(d == 0, 1.0, d)
                cx = jnp.where(d == 0, big, (b0 * c2 - b2 * c0) / safe_d)
                cy = jnp.where(d == 0, big, (a2 * c0 - a0 * c2) / safe_d)
                return in_seg(s0x, s0y, s1x, s1y, cx, cy) & in_seg(
                    p1x, p1y, p2x, p2y, cx, cy
                )

            hit = seg_cross(px, py - half, px + half, py)
            hit |= seg_cross(px + half, py, px, py + half)
            hit |= seg_cross(px, py + half, px - half, py)
            hit |= seg_cross(px - half, py, px, py - half)
            return hit

        def one(k, di, best):
            live = (k >= lo) & (k < hi)
            base = k * _LINE_FIELDS
            ea0 = read_field(base + 0)
            ea1 = read_field(base + 1)
            ea2 = read_field(base + 2)
            eb0 = read_field(base + 3)
            eb1 = read_field(base + 4)
            eb2 = read_field(base + 5)
            ec0 = read_field(base + 6)
            ec1 = read_field(base + 7)
            ec2 = read_field(base + 8)
            tl0 = read_field(base + 9)
            tl1 = read_field(base + 10)
            tl2 = read_field(base + 11)
            p0x = read_field(base + 12)
            p0y = read_field(base + 13)
            p1x = read_field(base + 14)
            p1y = read_field(base + 15)
            p2x = read_field(base + 16)
            p2y = read_field(base + 17)
            di0 = read_field(base + 18)
            di1 = read_field(base + 19)
            di2 = read_field(base + 20)
            inv_den = read_field(base + 21)
            vis0 = read_field(base + 22) > 0
            vis1 = read_field(base + 23) > 0
            vis2 = read_field(base + 24) > 0
            tri_id = read_field(base + 25).astype(jnp.int32) * jnp.int32(
                _ID_SPLIT
            ) + read_field(base + 26).astype(jnp.int32)

            e0 = ea0 * px + eb0 * py + ec0
            e1 = ea1 * px + eb1 * py + ec1
            e2 = ea2 * px + eb2 * py + ec2
            ke0 = ((e0 > 0) | ((e0 == 0) & (tl0 > 0))) | (e0 != 0)
            ke1 = ((e1 > 0) | ((e1 == 0) & (tl1 > 0))) | (e1 != 0)
            ke2 = ((e2 > 0) | ((e2 == 0) & (tl2 > 0))) | (e2 != 0)
            inside = (
                (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & ke0 & ke1 & ke2
            )

            # Mask with & rather than jnp.where: a select on i1 vectors is
            # an arith.select Mosaic cannot legalize (found by
            # bench.py --parity on the real compiler — interpret mode
            # accepts it silently).
            crossing = diamond_cross(p0x, p0y, p1x, p1y) & vis0
            crossing |= diamond_cross(p1x, p1y, p2x, p2y) & vis1
            crossing |= diamond_cross(p0x, p0y, p2x, p2y) & vis2

            write = (inside | crossing) & border_ok & live

            # bary_i = clip(e_i / |den|, 0, 1), renormalised
            # (kernel.cu:377-380).
            b0_ = jnp.clip(e0 * inv_den, 0.0, 1.0)
            b1_ = jnp.clip(e1 * inv_den, 0.0, 1.0)
            b2_ = jnp.clip(e2 * inv_den, 0.0, 1.0)
            bs = b0_ + b1_ + b2_
            di_tri = (b0_ * di0 + b1_ * di1 + b2_ * di2) / bs

            di_tri = jnp.where(write, di_tri, _NEG_INF)
            # Non-crossing interior pixels write id 2^31-1: they occlude by
            # depth but never produce an index (kernel.cu:387-389).
            ids = jnp.where(crossing & write, tri_id, _INT32_MAX)

            better = (di_tri > di) | ((di_tri == di) & (ids < best))
            upd = write & better
            return jnp.where(upd, di_tri, di), jnp.where(upd, ids, best)

        def body(c, carry):
            di, best = carry
            k = c * 2
            di, best = one(k, di, best)
            di, best = one(k + 1, di, best)
            return di, best

        return body

    di0 = jnp.full((TILE_H, TILE_W), _NEG_INF, jnp.float32)
    id0 = jnp.full((TILE_H, TILE_W), _INT32_MAX, jnp.int32)

    def march_segment(seg, carry):
        start = starts_ref[n, seg]
        cnt = counts_ref[n, seg]
        cbase = start // jnp.int32(_LCHUNK)
        k0 = start - cbase * jnp.int32(_LCHUNK)
        nch = jnp.where(
            cnt > 0,
            (k0 + cnt + jnp.int32(_LCHUNK - 1)) // jnp.int32(_LCHUNK),
            jnp.int32(0),
        )

        def seg_chunk(c, carry):
            cp = pltpu.make_async_copy(
                seg_hbm.at[n, pl.ds((cbase + c) * _LSEG_ROWS, _LSEG_ROWS), :],
                seg_scr,
                sem0,
            )
            cp.start()
            cp.wait()
            lo = jnp.maximum(k0 - c * jnp.int32(_LCHUNK), 0)
            hi = jnp.minimum(
                k0 + cnt - c * jnp.int32(_LCHUNK), jnp.int32(_LCHUNK)
            )
            return jax.lax.fori_loop(
                lo // jnp.int32(2),
                (hi + jnp.int32(1)) // jnp.int32(2),
                make_body(lambda i: seg_scr[i // 128, i % 128], lo, hi),
                carry,
            )

        return jax.lax.fori_loop(0, nch, seg_chunk, carry)

    # Fine segment, then the enclosing supertile's (hierarchical binning).
    di, best = march_segment(tile, (di0, id0))
    n_tiles = n_tx * n_ty
    n_sx = -(-n_tx // SUPER)
    stile = (ty // SUPER) * n_sx + (tx // SUPER)
    di, best = march_segment(n_tiles + stile, (di, best))

    gcount = gcounts_ref[n, 0]
    rows_g = _LGCHUNK * _LINE_FIELDS // 128

    def gchunk(c, carry):
        cp = pltpu.make_async_copy(
            gbins_hbm.at[n, pl.ds(c * rows_g, rows_g), :], gsetup_scr, sem1
        )
        cp.start()
        cp.wait()
        cnt_g = jnp.minimum(
            gcount - c * jnp.int32(_LGCHUNK), jnp.int32(_LGCHUNK)
        )
        return jax.lax.fori_loop(
            0,
            (cnt_g + jnp.int32(1)) // jnp.int32(2),
            make_body(
                lambda i: gsetup_scr[i // 128, i % 128], jnp.int32(0), cnt_g
            ),
            carry,
        )

    n_gchunks = (gcount + jnp.int32(_LGCHUNK - 1)) // jnp.int32(_LGCHUNK)
    di, best = jax.lax.fori_loop(0, n_gchunks, gchunk, (di, best))

    di_ref[0] = di
    id_ref[0] = best


@functools.partial(
    jax.jit, static_argnames=("height", "width", "interpret", "full_height")
)
def rasterize_lines_pallas(
    v: jnp.ndarray,
    vi: jnp.ndarray,
    height: int,
    width: int,
    interpret: bool = False,
    y_offset=0,
    full_height: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tile-binned wireframe rasterization (same contract as
    rasterize._rasterize_lines_impl): depth written on interior AND
    diamond-crossing pixels, index only on crossing pixels.
    ``y_offset``/``full_height``: bit-exact row-tile viewport (see
    :func:`rasterize_pallas`)."""
    n, f_cnt = vi.shape[0], vi.shape[1]
    n_ty = -(-height // TILE_H)
    n_tx = -(-width // TILE_W)
    y_off = jnp.asarray(y_offset, jnp.int32).reshape(())

    setup = triangle_setup(v.astype(jnp.float32), vi)
    valid = _canvas_cull(setup, full_height or height, width)
    if full_height is not None:
        # Conservative viewport cull — wireframe covers at most one pixel
        # beyond the bbox through the half-extent diamond test, hence the
        # one-row slack on both sides.
        yof = y_off.astype(setup.bbox.dtype)
        valid = valid & (setup.bbox[..., 3] >= yof - 1) & (
            setup.bbox[..., 1] <= yof + jnp.asarray(height, setup.bbox.dtype)
        )
    rows = _pack_setup_lines(setup, v, vi)  # [N, F, 32]

    f_pad = -f_cnt % _LGCHUNK
    if f_pad:
        rows = jnp.pad(rows, ((0, 0), (0, f_pad), (0, 0)))
        bbox_p = jnp.pad(setup.bbox, ((0, 0), (0, f_pad), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, f_pad)))
    else:
        bbox_p = setup.bbox
    f_tot = f_cnt + f_pad
    p_tot = f_tot * MAX_SPAN

    # Bin against the viewport-local, half-pixel-expanded bbox: the diamond
    # test can mark a pixel whose center lies up to 0.5 px outside the
    # segment bbox, so expansion keeps boundary crossings in the right tile.
    yf = y_off.astype(bbox_p.dtype)
    half = jnp.asarray(0.5, bbox_p.dtype)
    bbox_local = bbox_p + jnp.stack([-half, -half - yf, half, half - yf])

    seg_rows, _seg_ids, starts, counts, gmask, gcounts = jax.vmap(
        lambda r, b, vl: _segment_pairs(r, b, vl, n_tx, n_ty)
    )(rows, bbox_local, valid)

    gshift = _next_pow2(f_tot)

    def build_globals(args):
        gmask_b, rows_b = args
        gpacked = jax.lax.sort(
            jnp.where(gmask_b, 0, gshift) + jax.lax.iota(jnp.int32, f_tot)
        )
        gids_b = (gpacked % gshift).astype(jnp.int32)
        return rows_b[gids_b]

    def empty_globals(args):
        _, rows_b = args
        return rows_b

    gbins = jnp.stack(
        [
            jax.lax.cond(
                gcounts[b, 0] > 0,
                build_globals,
                empty_globals,
                (gmask[b], rows[b]),
            )
            for b in range(n)
        ]
    )

    seg_rows = jnp.pad(seg_rows, ((0, 0), (0, _LCHUNK), (0, 0)))
    seg_rows = seg_rows.reshape(
        n, (p_tot + _LCHUNK) * _LINE_FIELDS // 128, 128
    )
    gbins = gbins.reshape(n, f_tot * _LINE_FIELDS // 128, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # starts, counts, gcounts, yoff
        grid=(n, n_ty, n_tx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.SMEM((_LSEG_ROWS, 128), jnp.float32),
            pltpu.SMEM((_LGCHUNK * _LINE_FIELDS // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        out_specs=[
            pl.BlockSpec(
                (1, TILE_H, TILE_W),
                lambda n_, ty, tx, *_: (n_, ty, tx),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TILE_H, TILE_W),
                lambda n_, ty, tx, *_: (n_, ty, tx),
                memory_space=pltpu.VMEM,
            ),
        ],
    )

    di_img, id_img = pl.pallas_call(
        functools.partial(
            _lines_tile_kernel,
            n_tx=n_tx,
            n_ty=n_ty,
            height=full_height or height,
            width=width,
        ),
        grid_spec=grid_spec,
        out_shape=[
            _out_struct(
                (n, n_ty * TILE_H, n_tx * TILE_W), jnp.float32,
                starts, seg_rows, y_off,
            ),
            _out_struct(
                (n, n_ty * TILE_H, n_tx * TILE_W), jnp.int32,
                starts, seg_rows, y_off,
            ),
        ],
        interpret=interpret,
    )(starts, counts, gcounts, y_off[None], seg_rows, gbins)

    di_img = di_img[:, :height, :width]
    id_img = id_img[:, :height, :width]

    covered = jnp.isfinite(di_img) & (di_img != _NEG_INF)
    index_img = jnp.where(covered & (id_img != _INT32_MAX), id_img, -1)
    depth_img = jnp.where(covered, 1.0 / epsclamp(di_img), 0.0).astype(v.dtype)
    return depth_img, index_img
