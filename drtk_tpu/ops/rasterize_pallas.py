"""Tile-binned Pallas rasterizer (the TPU fast path).

TPU-native replacement for the reference's per-(batch, triangle) CUDA
rasterizer with its packed ``atomicMin`` z-buffer
(`src/rasterize/rasterize_kernel.cu:43-168` in facebookresearch/DRTK).

Design (SURVEY.md §7.1/§7.3):

* **Phase A — setup + binning (XLA).** Reuses
  :func:`drtk_tpu.ops.rasterize.triangle_setup` (canonical vertex-ordered
  edge functions, top-left fill rule, near-plane/canvas/degenerate culls),
  then bins triangles into 32x128-pixel tiles:

  - each triangle's tile span is enumerated into (tile, triangle) pairs
    (at most ``MAX_SPAN`` tiles per triangle);
  - pairs are sorted by tile and gathered into dense fixed-capacity bins
    ``[T, CAP]`` (gather, not scatter — cheaper on TPU);
  - triangles spanning more than ``MAX_SPAN`` tiles, and pairs overflowing
    a tile's ``CAP``, are routed to a per-batch **global list** processed
    by every tile. The z-test is idempotent, so duplicated triangles are
    harmless (SURVEY.md §7.3.6).

* **Phase B — per-tile resolve (Pallas).** One program per (batch, tile).
  The packed-``atomicMin`` trick becomes a sequential masked minimum over
  the tile's own bin, with the running (inverse-depth, id) z-buffer living
  in registers/VMEM. DRTK's deterministic tie-break is preserved: larger
  inverse depth wins, exact ties go to the smaller triangle id (the id
  sits in the low bits of the reference's packed key,
  rasterize_kernel.cu:155-161).

Outputs match the reference contract exactly: int32 ``index_img`` with -1
background, float depth with 0 background (unpack_kernel, :402-415). The
kernel is validated against the portable XLA path in
tests/test_rasterize_pallas.py: index images must match exactly, depth to
FMA-contraction ulps.
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

__all__ = ["rasterize_pallas"]

TILE_H = 32
TILE_W = 128
MAX_SPAN = 4  # max tiles a binned triangle may cover (else -> global list)
_INT32_MAX = jnp.iinfo(jnp.int32).max
_NEG_INF = float("-inf")


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def _bin_capacity(num_faces: int, num_tiles: int) -> int:
    """Static per-tile bin capacity: ~8x the mean pair density, clamped.

    The upper clamp trades SMEM block size against global-list pressure:
    every bin-overflow triangle is marched by EVERY tile, so dense scenes
    (few tiles, many triangles) degrade fast once bins overflow."""
    mean = max(1, (num_faces * 4) // max(1, num_tiles))
    return min(512, max(128, _next_pow2(8 * mean)))


# --------------------------------------------------------------------------
# Phase A: setup + binning (XLA, per batch element — vmapped)
# --------------------------------------------------------------------------


def _pack_setup(setup, valid):
    """[F, 16] float32 rows: ea(3), eb(3), ec(3), q(3), topleft(3), valid."""
    return jnp.concatenate(
        [
            setup.ea,
            setup.eb,
            setup.ec,
            setup.q,
            setup.topleft.astype(jnp.float32),
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


def _bin_triangles(setup_rows, bbox, valid, n_tx, n_ty, cap):
    """Build dense per-tile bins + the global list for ONE batch element.

    Returns (bins [T, CAP, 16], bin_ids [T, CAP], counts [T],
             gmask [F] bool, gcount [1]). The global set is F-sized (never
    drops work): every triangle whose tile span exceeds MAX_SPAN plus every
    triangle that overflowed a tile bin. The caller materializes the sorted
    list + rows lazily behind a runtime cond (most scenes have none).
    """
    f_cnt = setup_rows.shape[0]
    n_tiles = n_tx * n_ty

    tx0 = jnp.clip(jnp.floor(bbox[:, 0] / TILE_W).astype(jnp.int32), 0, n_tx - 1)
    ty0 = jnp.clip(jnp.floor(bbox[:, 1] / TILE_H).astype(jnp.int32), 0, n_ty - 1)
    tx1 = jnp.clip(jnp.floor(bbox[:, 2] / TILE_W).astype(jnp.int32), 0, n_tx - 1)
    ty1 = jnp.clip(jnp.floor(bbox[:, 3] / TILE_H).astype(jnp.int32), 0, n_ty - 1)
    sx = tx1 - tx0 + 1
    sy = ty1 - ty0 + 1
    span = sx * sy
    big = span > MAX_SPAN

    # Enumerate the (tile, tri) pairs of small-span triangles.
    k = jnp.arange(MAX_SPAN, dtype=jnp.int32)  # [S]
    dx = k[None, :] % sx[:, None]
    dy = k[None, :] // sx[:, None]
    pair_tile = (ty0[:, None] + dy) * n_tx + (tx0[:, None] + dx)  # [F, S]
    pair_ok = (k[None, :] < span[:, None]) & valid[:, None] & (~big[:, None])
    pair_tile = jnp.where(pair_ok, pair_tile, n_tiles)  # sentinel -> sorts last
    pair_tri = jnp.broadcast_to(
        jnp.arange(f_cnt, dtype=jnp.int32)[:, None], pair_tile.shape
    )

    flat_tile = pair_tile.reshape(-1)  # [P]
    sorted_tile, sorted_pair = _sort_pairs(flat_tile, n_tiles)
    p_total = flat_tile.shape[0]
    sorted_tri = sorted_pair // MAX_SPAN

    # Per-tile starts/counts via bincount + exclusive cumsum (searchsorted
    # lowers poorly on TPU).
    counts_all = (
        jnp.zeros((n_tiles + 1,), jnp.int32).at[flat_tile].add(1)[:n_tiles]
    )
    start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts_all)[:-1]]
    )
    counts = jnp.minimum(counts_all, cap).astype(jnp.int32)

    # Dense bins by gather.
    slot = jnp.arange(cap, dtype=jnp.int32)
    bin_pos = jnp.minimum(start[:, None] + slot[None, :], p_total - 1)
    bin_tri = sorted_tri[bin_pos]  # [T, CAP]
    bins = setup_rows[bin_tri]  # [T, CAP, 16]

    # Global list: big-span triangles + per-tile overflow pairs.
    rank = jax.lax.iota(jnp.int32, p_total) - jnp.where(
        sorted_tile < n_tiles, start[jnp.minimum(sorted_tile, n_tiles - 1)], 0
    )
    overflow = (sorted_tile < n_tiles) & (rank >= cap)
    overflow_tri = (
        jnp.zeros((f_cnt,), jnp.int32)
        .at[sorted_tri]
        .add(overflow.astype(jnp.int32))
    )
    gmask = (big & valid) | (overflow_tri > 0)
    gcount = jnp.sum(gmask).astype(jnp.int32)
    return bins, bin_tri, counts, gmask, gcount[None]


# --------------------------------------------------------------------------
# Phase B: the per-tile Pallas kernel
# --------------------------------------------------------------------------


_GCHUNK = 512  # global-list triangles per DMA chunk


def _tile_kernel(
    counts_ref,  # [N, T] int32 (scalar prefetch)
    gcounts_ref,  # [N, 1] int32 (scalar prefetch)
    bins_ref,  # (1, 1, CAP//8, 128) SMEM f32 (flat idx = k*16+field)
    ids_ref,  # (1, 1, CAP//128, 128) SMEM int32
    gbins_hbm,  # [N, F*16//128, 128] ANY/HBM f32 (full array)
    gids_hbm,  # [N, F//128, 128] ANY/HBM int32 (full array)
    di_ref,  # (1, TILE_H, TILE_W) out
    id_ref,  # (1, TILE_H, TILE_W) out
    gsetup_scr,  # SMEM (GCHUNK*16//128, 128) f32 scratch
    gids_scr,  # SMEM (GCHUNK//128, 128) int32 scratch
    sem0,
    sem1,
    *,
    n_tx: int,
):
    n = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    tile = ty * n_tx + tx

    px = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
        + tx * TILE_W
    ).astype(jnp.float32)
    py = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
        + ty * TILE_H
    ).astype(jnp.float32)

    def make_body(read_field, read_id, count):
        # Unrolled x4: amortizes per-iteration loop/sync overhead over four
        # triangles; slots past `count` are masked via the scalar live flag
        # (bins and the global list only ever contain valid triangles, so
        # the packed valid field is not consulted).
        def one(k, di, best):
            live = k < count
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
            tl0 = read_field(base + 12)
            tl1 = read_field(base + 13)
            tl2 = read_field(base + 14)
            tri_id = read_id(k)

            e0 = ea0 * px + eb0 * py + ec0
            e1 = ea1 * px + eb1 * py + ec1
            e2 = ea2 * px + eb2 * py + ec2
            keep = (
                ((e0 > 0) | ((e0 == 0) & (tl0 > 0)))
                & ((e1 > 0) | ((e1 == 0) & (tl1 > 0)))
                & ((e2 > 0) | ((e2 == 0) & (tl2 > 0)))
                & live
            )
            di_tri = e0 * q0 + e1 * q1 + e2 * q2
            better = (di_tri > di) | ((di_tri == di) & (tri_id < best))
            upd = keep & better
            return jnp.where(upd, di_tri, di), jnp.where(upd, tri_id, best)

        def body(c, carry):
            di, best = carry
            k = c * 4
            di, best = one(k, di, best)
            di, best = one(k + 1, di, best)
            di, best = one(k + 2, di, best)
            di, best = one(k + 3, di, best)
            return di, best

        return body

    di0 = jnp.full((TILE_H, TILE_W), _NEG_INF, jnp.float32)
    id0 = jnp.full((TILE_H, TILE_W), _INT32_MAX, jnp.int32)

    count = counts_ref[n, tile]
    di, best = jax.lax.fori_loop(
        0,
        (count + jnp.int32(3)) // jnp.int32(4),
        make_body(
            lambda i: bins_ref[0, 0, i // 128, i % 128],
            lambda k: ids_ref[0, 0, k // 128, k % 128],
            count,
        ),
        (di0, id0),
    )
    # Global list: stream SMEM-sized chunks from HBM. The DMA per chunk is
    # the same for every tile; the z-test is idempotent so order is free.
    gcount = gcounts_ref[n, 0]
    rows_f = _GCHUNK * 16 // 128
    rows_i = _GCHUNK // 128

    def chunk_body(c, carry):
        cp0 = pltpu.make_async_copy(
            gbins_hbm.at[n, pl.ds(c * rows_f, rows_f), :], gsetup_scr, sem0
        )
        cp1 = pltpu.make_async_copy(
            gids_hbm.at[n, pl.ds(c * rows_i, rows_i), :], gids_scr, sem1
        )
        cp0.start()
        cp1.start()
        cp0.wait()
        cp1.wait()
        cnt = jnp.minimum(gcount - c * jnp.int32(_GCHUNK), jnp.int32(_GCHUNK))
        return jax.lax.fori_loop(
            0,
            (cnt + jnp.int32(3)) // jnp.int32(4),
            make_body(
                lambda i: gsetup_scr[i // 128, i % 128],
                lambda k: gids_scr[k // 128, k % 128],
                cnt,
            ),
            carry,
        )

    n_gchunks = (gcount + jnp.int32(_GCHUNK - 1)) // jnp.int32(_GCHUNK)
    di, best = jax.lax.fori_loop(0, n_gchunks, chunk_body, (di, best))

    di_ref[0] = di
    id_ref[0] = best


# --------------------------------------------------------------------------
# Public entry
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("height", "width", "interpret"))
def rasterize_pallas(
    v: jnp.ndarray,
    vi: jnp.ndarray,
    height: int,
    width: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tile-binned rasterization. Same contract as the XLA path:
    returns (depth_img [N, H, W] f32, index_img [N, H, W] i32)."""
    n, f_cnt = vi.shape[0], vi.shape[1]
    n_ty = -(-height // TILE_H)
    n_tx = -(-width // TILE_W)
    n_tiles = n_ty * n_tx
    cap = _bin_capacity(f_cnt, n_tiles)

    setup = triangle_setup(v.astype(jnp.float32), vi)
    valid = _canvas_cull(setup, height, width)
    setup_rows = _pack_setup(setup, valid)  # [N, F, 16]

    # Pad F to the global-chunk granularity for aligned DMA slices.
    f_pad = -f_cnt % _GCHUNK
    if f_pad:
        setup_rows = jnp.pad(setup_rows, ((0, 0), (0, f_pad), (0, 0)))
        bbox_p = jnp.pad(setup.bbox, ((0, 0), (0, f_pad), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, f_pad)))
    else:
        bbox_p = setup.bbox
    f_tot = f_cnt + f_pad

    bins, bin_ids, counts, gmask, gcounts = jax.vmap(
        lambda rows, bbox, val: _bin_triangles(
            rows, bbox, val, n_tx, n_ty, cap
        )
    )(setup_rows, bbox_p, valid)

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
        _, rows_b = args
        return jax.lax.iota(jnp.int32, f_tot), rows_b

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
    # Dynamic per-triangle indexing must land on the sublane axis (the lane
    # axis requires 128-aligned indices): flatten the 16 setup fields into
    # the sublane dim and keep a trailing unit lane dim.
    bins = bins.reshape(n, n_tiles, cap // 8, 128)
    gbins = gbins.reshape(n, f_tot * 16 // 128, 128)
    bin_ids = bin_ids.reshape(n, n_tiles, cap // 128, 128)
    gids = gids.reshape(n, f_tot // 128, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # counts, gcounts
        grid=(n, n_ty, n_tx),
        in_specs=[
            pl.BlockSpec(
                (1, 1, cap // 8, 128),
                lambda n_, ty, tx, *_: (n_, ty * n_tx + tx, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, cap // 128, 128),
                lambda n_, ty, tx, *_: (n_, ty * n_tx + tx, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # gbins stay in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # gids stay in HBM
        ],
        scratch_shapes=[
            pltpu.SMEM((_GCHUNK * 16 // 128, 128), jnp.float32),
            pltpu.SMEM((_GCHUNK // 128, 128), jnp.int32),
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
        functools.partial(_tile_kernel, n_tx=n_tx),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, n_ty * TILE_H, n_tx * TILE_W), jnp.float32),
            jax.ShapeDtypeStruct((n, n_ty * TILE_H, n_tx * TILE_W), jnp.int32),
        ],
        interpret=interpret,
    )(counts, gcounts, bins, bin_ids, gbins, gids)

    di_img = di_img[:, :height, :width]
    id_img = id_img[:, :height, :width]

    covered = id_img != _INT32_MAX
    index_img = jnp.where(covered, id_img, -1)
    depth_img = jnp.where(covered, 1.0 / epsclamp(di_img), 0.0).astype(v.dtype)
    return depth_img, index_img
