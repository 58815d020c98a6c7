"""Pixel-to-face row accumulation (the backward-pass scatter), TPU-native.

Every VJP in the pipeline ends with the same reduction: per-pixel rows
accumulated into per-face rows by ``index_img`` (the reference does this
with ``fastAtomicAdd`` / warp-segmented sums, interpolate_kernel.cu:205-280).
A plain XLA scatter-add of a million rows is the TPU's slowest primitive;
this module replaces it with a **binned matmul**:

1. Derive per-tile candidate-face bins from ``index_img`` alone
   (:func:`_range_bins` — R min-anchored id ranges per 32x128 tile, a few
   tile reductions, no sort and no geometry). Ids a tile's ranges miss
   raise a residual flag that routes the whole batch to the plain scatter,
   so the fast path is never wrong. (An earlier design re-derived the
   rasterizer's geometry bins for CSE with the forward; the forward now
   builds sorted segments instead, and the index-derived bins are cheaper
   than the shared subgraph ever was.)
2. A Pallas kernel computes, per tile, ``partials = onehot^T @ rows`` on
   the MXU, where ``onehot[p, s] = (index_img[p] == bin_ids[s])`` is built
   on the fly in VMEM — a segment reduction as a 4096x128x K matmul.
3. One scatter of the bin partials (T*CAP rows, ~8x fewer than pixels)
   finishes the job.

Ids that fall outside every range flip a residual flag, so the fast path
is only taken when the bins cover the index image exactly; a runtime
``lax.cond`` falls back to the plain scatter otherwise (never wrong, just
slower on pathological scenes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drtk_tpu.ops.window_accum import bf16_split3

# Accumulation tile: 32x128 px = 4096-lane MXU dots per id slab. Decoupled
# from the rasterizer's resolve tile (whose height is tuned separately).
TILE_H = 32
TILE_W = 128

__all__ = ["scatter_rows_to_faces", "gather_rows_by_index"]


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def _bin_capacity(num_faces: int, num_tiles: int) -> int:
    """Static per-tile candidate capacity: ~8x the mean face density per
    tile, clamped to [128, 512] (the MXU one-hot slabs come in 128s)."""
    mean = max(1, (num_faces * 4) // max(1, num_tiles))
    return min(512, max(128, _next_pow2(8 * mean)))


_RANGE_WIDTH = 32


def _range_bins(index_img, f_cnt, height, width):
    """Per-tile candidate bins derived from ``index_img`` alone.

    Greedy min-anchored construction: R = CAP/32 id ranges of width 32 per
    tile — take the tile's smallest face id, cover [m, m + 32), remove,
    repeat. Narrow ranges compose: a dense id cluster wider than 32 is
    covered by consecutive ranges (the greedy min re-anchors right after
    the previous range), while scattered clusters each get their own — so
    any per-tile id set that fits in CAP/32 clusters-of-32 (after splitting
    wide clusters) is covered exactly. Spatially coherent meshes are,
    including multi-block topologies like the a/b-half grid layout, whose
    32x128-px tiles cut ~2x5 grid rows = up to ~12 clusters (4 wide ranges
    missed those and silently fell back — a 17% end-to-end regression). A
    per-element residual flag reports uncovered ids so the caller can fall
    back to the plain scatter. Costs R tile-reductions — no sort, no
    geometry, and no dependence on the rasterizer's internals.

    Two coverage tiers: (bins1 [N, T, CAP], ok1) after CAP/32 greedy
    ranges, and (bins2 [N, T, 2*CAP], ok2) after twice as many — scenes
    whose tiles cut more id clusters than CAP/32 ranges can anchor (e.g.
    the 8-view ring cameras: ~12 grid-row clusters x ~1.7 ranges each)
    escalate to the double-capacity kernel instead of all the way to the
    plain scatter, which cost inverse8 ~25% end-to-end. Empty slots are
    -2.
    """
    n = index_img.shape[0]
    n_ty = -(-height // TILE_H)
    n_tx = -(-width // TILE_W)
    n_tiles = n_ty * n_tx
    cap = _bin_capacity(f_cnt, n_tiles)
    wd = _RANGE_WIDTH
    n_ranges = cap // wd
    hp, wp = n_ty * TILE_H, n_tx * TILE_W
    idx = index_img
    if (hp, wp) != (height, width):
        idx = jnp.pad(
            idx, ((0, 0), (0, hp - height), (0, wp - width)),
            constant_values=-1,
        )
    tiles = (
        idx.reshape(n, n_ty, TILE_H, n_tx, TILE_W)
        .transpose(0, 1, 3, 2, 4)
        .reshape(n, n_tiles, -1)
    )
    big = jnp.int32(2**30)
    ids = jnp.where(tiles >= 0, tiles, big)
    starts = []
    rem = ids
    ok1 = None
    for i in range(2 * n_ranges):
        m = jnp.min(rem, axis=-1)  # [N, T]
        starts.append(m)
        rem = jnp.where(rem < (m + wd)[..., None], big, rem)
        if i == n_ranges - 1:
            ok1 = jnp.all(jnp.min(rem, axis=-1) == big, axis=-1)  # [N]
    ok2 = jnp.all(jnp.min(rem, axis=-1) == big, axis=-1)  # [N]
    lane = jnp.arange(wd, dtype=jnp.int32)
    bins2 = jnp.concatenate(
        [s[..., None] + lane for s in starts], axis=-1
    )  # [N, T, 2*CAP]
    bins2 = jnp.where(bins2 < f_cnt, bins2, -2)
    return bins2[..., :cap], ok1, bins2, ok2


def _accumulate_kernel(rows_ref, idx_ref, ids_ref, out_ref, *, cap, k_dim):
    """partials[:, s] = sum over tile pixels p of rows[p] * (idx[p]==ids[s]).

    rows_ref: (1, K, PIX) VMEM (tile pixels pre-flattened in XLA; the pixel
        axis stays the lane dimension everywhere to avoid lane padding);
    idx_ref: (1, 1, PIX) VMEM i32;
    ids_ref: (1, CAP, 1) VMEM i32 (slots past the count pre-masked to -2);
    out_ref: (1, K, CAP) VMEM f32 — K on the sublane axis; a [CAP, K]
        layout would lane-pad K=12 -> 128 in HBM (10x the partials buffer,
        ~1 GB at 4K frames).
    """
    idx_row = idx_ref[0]  # (1, PIX)
    rows = rows_ref[0]  # (K, PIX)
    # The one-hot factor is EXACT in bf16 (0/1), so a three-term bf16 split
    # of the rows makes the dot f32-accurate to <= 4 ulp (~2.4e-7 relative;
    # see window_accum.bf16_split3 + its pinned test) — 3 single-pass MXU
    # dots instead of the 6 passes Precision.HIGHEST issues for f32 x f32.
    # A two-term split's ~2^-17 relative per-product error broke the 1e-4
    # parity contract on cancellation-heavy scenes.
    rows_terms = bf16_split3(rows)
    for c in range(cap // 128):
        ids_col = ids_ref[0, pl.ds(c * 128, 128), :]  # (128, 1)
        onehot = (ids_col == idx_row).astype(jnp.bfloat16)  # [128, PIX]
        dims = (((1,), (1,)), ((), ()))
        # precision pinned: an ambient default_matmul_precision("highest")
        # would stamp an fp32 contract precision Mosaic rejects for bf16
        # operands ("Bad lhs type"); DEFAULT is exact here (bf16 products
        # vs an exact 0/1 factor, f32 accumulate).
        out_ref[0, :, pl.ds(c * 128, 128)] = sum(
            jax.lax.dot_general(
                rt,
                onehot,
                dimension_numbers=dims,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            for rt in rows_terms
        )


def _binned_partials(rows_img, index_img, bin_ids_masked, n_ty, n_tx, cap,
                     interpret):
    """rows_img [H, W, K], index_img [H, W], bin_ids_masked [T, CAP]
    -> per-tile bin partials [T, K, CAP] (single batch element)."""
    h, w = index_img.shape
    k_dim = rows_img.shape[-1]
    hp, wp = n_ty * TILE_H, n_tx * TILE_W
    if (hp, wp) != (h, w):
        rows_img = jnp.pad(rows_img, ((0, hp - h), (0, wp - w), (0, 0)))
        index_img = jnp.pad(
            index_img, ((0, hp - h), (0, wp - w)), constant_values=-1
        )

    # Flatten tiles in XLA (Mosaic cannot shape-cast inside the kernel).
    pix = TILE_H * TILE_W
    n_tiles = n_ty * n_tx
    rows_t = (
        rows_img.astype(jnp.float32)
        .reshape(n_ty, TILE_H, n_tx, TILE_W, k_dim)
        .transpose(0, 2, 4, 1, 3)
        .reshape(n_tiles, k_dim, pix)
    )
    idx_t = (
        index_img.reshape(n_ty, TILE_H, n_tx, TILE_W)
        .transpose(0, 2, 1, 3)
        .reshape(n_tiles, 1, pix)
    )

    return pl.pallas_call(
        functools.partial(_accumulate_kernel, cap=cap, k_dim=k_dim),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, k_dim, pix), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, pix), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, cap, 1), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, k_dim, cap), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, k_dim, cap), jnp.float32),
        interpret=interpret,
    )(rows_t, idx_t, bin_ids_masked[:, :, None])


def scatter_rows_to_faces(
    rows: jnp.ndarray,
    index_img: jnp.ndarray,
    v: jnp.ndarray,
    vi: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Accumulate per-pixel rows into per-face rows by ``index_img``.

    Args:
        rows: [N, H, W, K] contributions (background pixels must already be
            zeroed — they are dropped by the fast path and added to face 0
            by the fallback, matching the callers' masking convention).
        index_img: [N, H, W] int32.
        v / vi: the geometry that produced ``index_img``. Only
            ``vi.shape[1]`` (the face count) is consulted; candidate bins
            are derived from ``index_img`` alone (:func:`_range_bins`), so
            ``v=None`` is fine — e.g. interpolate's default
            attribute-gradient path has no geometry at all.
        interpret: run the Pallas kernel in interpreter mode (CPU tests).

    Returns:
        [N, F, K] float32 accumulated rows.
    """
    n, h, w = index_img.shape
    f_cnt = vi.shape[1]
    k_dim = rows.shape[-1]

    def _plain_scatter(ids_flat, vals_flat, dtype):
        """K-batched 1-D scatters, [N, P] ids + [N, P, K] vals -> [N, F, K].

        NOT a [P, K] row scatter: that layout's minor K dim gets
        (8, 128)-lane-padded in HBM (K=9 -> 128 is a 14x expansion — an
        8 GB temp at 4K frames, allocated even when a surrounding
        lax.cond takes the other branch). Batching the K channels on the
        sublane axis instead puts the big P/F axes minor: zero padding.
        """
        vals_t = jnp.moveaxis(vals_flat, -1, 1)  # [N, K, P]

        def one(ids_b, vals_b):
            return jax.vmap(
                lambda col: jnp.zeros((f_cnt,), dtype).at[ids_b].add(
                    col, mode="promise_in_bounds"
                )
            )(vals_b.astype(dtype))

        return jnp.moveaxis(jax.vmap(one)(ids_flat, vals_t), 1, -1)

    def _varying(x):
        try:
            return bool(jax.typeof(x).vma)
        except AttributeError:  # pragma: no cover - older jax
            return False

    if rows.dtype == jnp.float64 or _varying(rows) or _varying(index_img):
        # float64 (oracle mode): the MXU path accumulates in f32; keep the
        # dtype-preserving scatter instead.
        # shard_map (varying) mode: index_img is a row *block* of the frame
        # while v is global geometry — the full-frame tile binning would be
        # misaligned, so use the plain scatter there too.
        safe = jnp.maximum(index_img, 0).reshape(n, -1)
        return _plain_scatter(safe, rows.reshape(n, -1, k_dim), rows.dtype)

    del v  # index-derived bins need no geometry
    n_ty = -(-h // TILE_H)
    n_tx = -(-w // TILE_W)
    cap = _bin_capacity(f_cnt, n_ty * n_tx)
    bins1, ok1, bins2, ok2 = _range_bins(index_img, f_cnt, h, w)

    safe_idx = jnp.maximum(index_img, 0)

    # One runtime branch for the WHOLE batch (a per-element python loop of
    # conds serializes N small kernel launches — it halved throughput at
    # batch 8). Tiered: CAP bins, then 2*CAP bins (tiles cutting more id
    # clusters than CAP/32 ranges — e.g. ring-camera views), then the
    # plain scatter; mixed batches take the weakest member's tier.
    def fast_with(bins_a, cap_a):
        def fast(args):
            rows_a, idx_a = args
            partials = jax.vmap(
                lambda r, i, bn: _binned_partials(
                    r, i, bn, n_ty, n_tx, cap_a, interpret
                )
            )(rows_a, idx_a, bins_a)  # [N, T, K, CAP]
            # Partials -> face table: scatter of T*CAP K-slot entries (~8x
            # fewer than pixels), K-batched on sublanes (see
            # _plain_scatter's layout rationale). Empty bin slots (-2)
            # produce all-zero partials (the one-hot never matches them),
            # so clamping them to face 0 adds zeros.
            rows_p = jnp.moveaxis(partials, 2, -1).reshape(n, -1, k_dim)
            flat_ids = jnp.maximum(bins_a.reshape(n, -1), 0)
            return _plain_scatter(flat_ids, rows_p, jnp.float32)

        return fast

    def slow(args):
        rows_a, _ = args
        return _plain_scatter(
            safe_idx.reshape(n, -1), rows_a.reshape(n, -1, k_dim),
            jnp.float32,
        )

    out = jax.lax.cond(
        jnp.all(ok1),
        fast_with(bins1, cap),
        lambda args: jax.lax.cond(
            jnp.all(ok2), fast_with(bins2, 2 * cap), slow, args
        ),
        (rows, index_img),
    )
    return out.astype(rows.dtype)


# --------------------------------------------------------------------------
# The forward twin: per-pixel row gather as a binned one-hot matmul
# --------------------------------------------------------------------------


def _trunc_bf16(x):
    """Truncate f32 to its top 8 significant bits — exactly representable
    in bf16 (mask the low 16 mantissa bits; round-to-nearest casts can
    carry across the split and lose exactness)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(u, jnp.float32).astype(jnp.bfloat16)


def bf16_split3_exact(x):
    """f32 -> three bf16 terms with hi + mid + lo == x EXACTLY (normal
    range): truncating splits leave residuals of <= 16 then <= 8
    significant bits, each bf16-representable, and the f32 re-sum of the
    three aligned terms rounds to the original value. This is what makes
    the one-hot gather dot bit-exact (the matched slot contributes
    hi*1 + mid*1 + lo*1; every other slot contributes exact zeros)."""
    hi = _trunc_bf16(x)
    r1 = x - hi.astype(jnp.float32)
    mid = _trunc_bf16(r1)
    lo = _trunc_bf16(r1 - mid.astype(jnp.float32))
    return hi, mid, lo


def _gather_kernel(slab_ref, idx_ref, ids_ref, out_ref, *, cap, k_dim):
    """rows[k, p] = slab[k, s(p)] for the slot s(p) with ids[s] == idx[p].

    slab_ref: (1, 3K, CAP) VMEM bf16 — the three exact bf16 terms of the
        tile's candidate rows, stacked along the sublane axis so ONE MXU
        pass serves all three (a [3K, 128] x [128, PIX] dot costs the
        same padded-M cycles as a [K, 128] one — the bf16x3 layout rides
        the padding for free).
    idx_ref: (1, 1, PIX) VMEM i32 tile pixels; ids_ref: (1, CAP, 1) i32.
    out_ref: (1, K, PIX) f32.
    """
    idx_row = idx_ref[0]  # (1, PIX)
    acc = None
    for c in range(cap // 128):
        ids_col = ids_ref[0, pl.ds(c * 128, 128), :]  # (128, 1)
        onehot = (ids_col == idx_row).astype(jnp.bfloat16)  # (128, PIX)
        slab_c = slab_ref[0, :, pl.ds(c * 128, 128)]  # (3K, 128)
        dims = (((1,), (0,)), ((), ()))
        # precision pinned: ambient "highest" stamps an fp32 contract
        # Mosaic rejects for bf16 operands (see _accumulate_kernel).
        part = jax.lax.dot_general(
            slab_c, onehot, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # (3K, PIX)
        acc = part if acc is None else acc + part
    # hi + mid + lo: exact f32 reconstruction of the gathered rows.
    out_ref[0] = (
        acc[:k_dim] + acc[k_dim : 2 * k_dim] + acc[2 * k_dim :]
    )


def _binned_gather(slab3, idx_t, ids, n_ty, n_tx, cap, k_dim, interpret):
    """slab3 [T, 3K, CAP] bf16, idx_t [T, 1, PIX] i32, ids [T, CAP] i32
    -> [T, K, PIX] f32 (single batch element)."""
    n_tiles = n_ty * n_tx
    pix = TILE_H * TILE_W
    return pl.pallas_call(
        functools.partial(_gather_kernel, cap=cap, k_dim=k_dim),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, 3 * k_dim, cap), lambda t: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, pix), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, cap, 1), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, k_dim, pix), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, k_dim, pix), jnp.float32),
        interpret=interpret,
    )(slab3, idx_t, ids[:, :, None])


def gather_rows_by_index(
    table: jnp.ndarray,
    index_img: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-pixel row fetch ``table[n, index_img[n, y, x], :]`` as a binned
    one-hot MXU matmul — the forward twin of :func:`scatter_rows_to_faces`.

    XLA lowers a [H*W]-index row gather to an element-rate loop (~2
    elements/cycle; the three per-pixel face gathers were 13.5 ms of the
    57 ms 1024² textured step, running at 10-30 GiB/s of an 800 GiB/s
    part). Here each 32x128-px tile instead fetches its <= CAP candidate
    rows (``_range_bins`` — same bins as the backward scatter, so XLA CSEs
    the bin construction) and reconstitutes per-pixel rows with one
    predicated one-hot dot per 128 candidates. Values are BIT-EXACT: the
    slab rides as three truncating bf16 terms stacked on the M axis
    (:func:`bf16_split3_exact`), so the single matching slot reconstructs
    the f32 row exactly and non-matching slots contribute exact zeros —
    the runtime fallback (plain gather, taken when the bins miss an id)
    therefore produces identical bits, not merely close ones.

    Args:
        table: [N, F, K] float32 rows, K <= 42 (3K must fit one MXU
            sublane block).
        index_img: [N, H, W] int32; negative entries (background) yield
            all-zero rows.
        interpret: run the Pallas kernel in interpreter mode (CPU tests).

    Returns:
        [N, H, W, K] float32 — image-major, so the plain fallback is
        layout-free (a channel-leading return forced a [P, K] transpose
        pair that cost more than the gather at 8x512^2). NOT
        differentiable (used inside custom-VJP ops only); gradients would
        need a transpose rule for the Pallas call.
    """
    n, f_cnt, k_dim = table.shape
    _, h, w = index_img.shape

    def _varying(x):
        try:
            return bool(jax.typeof(x).vma)
        except AttributeError:  # pragma: no cover - older jax
            return False

    def plain(args):
        table_a, idx_a = args[:2]
        safe = jnp.maximum(idx_a, 0).reshape(n, -1)
        rows = jax.vmap(lambda t, ii: t[ii])(table_a, safe)  # [N, P, K]
        rows = jnp.where((idx_a >= 0).reshape(n, -1)[..., None], rows, 0.0)
        return rows.reshape(n, h, w, k_dim)

    if (
        table.dtype != jnp.float32
        or 3 * k_dim > 128
        or _varying(table)
        or _varying(index_img)
    ):
        # float64 (oracle mode): dtype-preserving plain gather. K > 42:
        # the 3K bf16 slab would overflow one MXU sublane block.
        # shard_map row blocks: full-frame tile bins would be misaligned
        # (same dispatch rule as scatter_rows_to_faces).
        return plain((table, index_img))

    n_ty = -(-h // TILE_H)
    n_tx = -(-w // TILE_W)
    cap = _bin_capacity(f_cnt, n_ty * n_tx)
    bins1, ok1, bins2, ok2 = _range_bins(index_img, f_cnt, h, w)

    def fast_with(bins_a, cap):
        return lambda args: fast(args, bins_a, cap)

    def fast(args, bins_a, cap):
        table_a, idx_a = args
        # Candidate slabs: [N, T, CAP] ids -> [N, T, CAP, K] rows (a small
        # gather — T*CAP ~ 8x fewer rows than pixels), split into the
        # three exact bf16 terms stacked channel-leading [N, T, 3K, CAP]
        # (CAP minor: a K-minor HBM layout would lane-pad K to 128).
        safe_bins = jnp.maximum(bins_a, 0)
        slab = jax.vmap(lambda t, b: t[b.reshape(-1)])(
            table_a, safe_bins
        ).reshape(n, -1, cap, k_dim)
        hi, mid, lo = bf16_split3_exact(slab)
        slab3 = jnp.concatenate([hi, mid, lo], axis=-1)  # [N, T, CAP, 3K]
        slab3 = jnp.moveaxis(slab3, -1, 2)  # [N, T, 3K, CAP]

        hp, wp = n_ty * TILE_H, n_tx * TILE_W
        idx_p = idx_a
        if (hp, wp) != (h, w):
            idx_p = jnp.pad(
                idx_a, ((0, 0), (0, hp - h), (0, wp - w)),
                constant_values=-1,
            )
        pix = TILE_H * TILE_W
        idx_t = (
            idx_p.reshape(n, n_ty, TILE_H, n_tx, TILE_W)
            .transpose(0, 1, 3, 2, 4)
            .reshape(n, n_ty * n_tx, 1, pix)
        )
        out_t = jax.vmap(
            lambda s3, it, bn: _binned_gather(
                s3, it, bn, n_ty, n_tx, cap, k_dim, interpret
            )
        )(slab3, idx_t, bins_a)  # [N, T, K, PIX]
        out = (
            out_t.reshape(n, n_ty, n_tx, k_dim, TILE_H, TILE_W)
            .transpose(0, 1, 4, 2, 5, 3)
            .reshape(n, hp, wp, k_dim)
        )
        return out[:, :h, :w]

    return jax.lax.cond(
        jnp.all(ok1),
        fast_with(bins1, cap),
        lambda args: jax.lax.cond(
            jnp.all(ok2), fast_with(bins2, 2 * cap), plain, args
        ),
        (table, index_img),
    )
