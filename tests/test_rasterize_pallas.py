"""Parity tests: the tile-binned Pallas rasterizer (interpret mode on CPU)
must match the portable XLA rasterizer bit-for-bit — same index image, same
depth — across mesh shapes that exercise binning, the global list
(oversized triangles), bin overflow, and batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drtk_tpu.ops.rasterize import _rasterize_xla
from drtk_tpu.ops.rasterize_pallas import rasterize_pallas
from tests.utils import random_mesh, two_triangles_scene


def assert_match(v, vi, h, w):
    vi = jnp.broadcast_to(vi[None], (v.shape[0],) + vi.shape) if vi.ndim == 2 else vi
    d_ref, i_ref = jax.jit(
        lambda v, vi: _rasterize_xla(v, vi, h, w)
    )(v.astype(jnp.float32), vi)
    d_pal, i_pal = rasterize_pallas(
        v.astype(jnp.float32), vi, h, w, interpret=True
    )
    i_ref = np.asarray(i_ref)
    i_pal = np.asarray(i_pal)
    d_ref = np.asarray(d_ref)
    d_pal = np.asarray(d_pal)
    # Index winners may flip only where two triangles interpenetrate at
    # (near-)equal depth: FMA-contraction ulps decide the z-test there.
    mism = i_ref != i_pal
    if mism.any():
        assert mism.mean() < 1e-3, f"{mism.sum()} index mismatches"
        near_tie = np.abs(d_ref - d_pal) <= 1e-4 * np.abs(d_ref) + 1e-6
        assert near_tie[mism].all(), "index mismatch at non-tied depth"
    # Depth may differ by FMA-contraction ulps between the two lowerings.
    np.testing.assert_allclose(d_ref, d_pal, rtol=1e-4, atol=1e-6)


def test_two_triangles():
    v, vi, _ = two_triangles_scene(h=128, w=256)
    assert_match(v, vi, 128, 256)


def test_random_mesh():
    v, vi = random_mesh(jax.random.PRNGKey(0), n=1, num_v=96, num_f=160,
                        h=96, w=160)
    assert_match(v, vi, 96, 160)


def test_batched():
    v, vi = random_mesh(jax.random.PRNGKey(1), n=3, num_v=64, num_f=96,
                        h=64, w=128)
    assert_match(v, vi, 64, 128)


def test_nonaligned_size():
    # h, w not multiples of the tile size.
    v, vi = random_mesh(jax.random.PRNGKey(2), n=1, num_v=48, num_f=64,
                        h=70, w=130)
    assert_match(v, vi, 70, 130)


def test_huge_triangles_use_global_list():
    # Triangles covering most of the canvas exceed MAX_SPAN fine tiles;
    # with hierarchical binning they land in the supertile tier at this
    # canvas size (the TRUE global list is covered by
    # test_true_global_list_tall_canvas).
    rng = np.random.RandomState(3)
    h = w = 256
    xy = rng.uniform(-0.5, 1.5, (1, 30, 2)).astype(np.float32) * [w, h]
    z = rng.uniform(2.0, 8.0, (1, 30, 1)).astype(np.float32)
    v = jnp.asarray(np.concatenate([xy, z], -1))
    vi = jnp.asarray(rng.randint(0, 30, (40, 3)).astype(np.int32))
    assert_match(v, vi, h, w)


def test_bin_overflow_routes_to_global():
    # Hundreds of tiny triangles crammed into one tile: counts > CAP force
    # the overflow path.
    rng = np.random.RandomState(4)
    h, w = 64, 128
    num_f = 600
    centers = rng.uniform([10, 10], [60, 24], (num_f, 2)).astype(np.float32)
    offs = rng.uniform(-2, 2, (num_f, 3, 2)).astype(np.float32)
    pts = (centers[:, None] + offs).reshape(-1, 2)
    z = rng.uniform(2, 9, (pts.shape[0], 1)).astype(np.float32)
    v = jnp.asarray(np.concatenate([pts, z], -1)[None])
    vi = jnp.asarray(np.arange(num_f * 3, dtype=np.int32).reshape(num_f, 3))
    assert_match(v, vi, h, w)


def test_degenerate_and_culled():
    v, vi = random_mesh(jax.random.PRNGKey(5), n=1, num_v=32, num_f=48,
                        h=64, w=128)
    vi = np.array(vi)
    vi[:8] = 0  # degenerate padding faces
    v = np.array(v)
    v[0, 1:5, 2] = -1.0  # behind the camera -> near-plane cull
    assert_match(jnp.asarray(v), jnp.asarray(vi), 64, 128)


def test_empty_scene():
    v = jnp.zeros((1, 3, 3), jnp.float32)
    vi = jnp.zeros((1, 1, 3), jnp.int32)
    d, i = rasterize_pallas(v, vi, 64, 128, interpret=True)
    assert int(jnp.sum(i != -1)) == 0
    assert float(jnp.abs(d).max()) == 0.0


def test_sort_pairs_key_widths():
    # The three packed-key branches (int32 / uint32 / argsort fallback) must
    # agree; the 4K config overflows int32 keys (regression for a TPU fault).
    from drtk_tpu.ops.rasterize_pallas import _sort_pairs

    rng = np.random.RandomState(0)
    flat = jnp.asarray(rng.randint(0, 300, 4096).astype(np.int32))
    ref_tile, ref_pair = _sort_pairs(flat, 300)  # int32 branch
    for fake_tiles in [2**19 - 1, 2**25]:  # uint32 branch, argsort branch
        t, p = _sort_pairs(flat, fake_tiles)
        np.testing.assert_array_equal(np.asarray(t), np.asarray(ref_tile))
        np.testing.assert_array_equal(np.asarray(p), np.asarray(ref_pair))


def test_fuzz_random_meshes():
    # Broad seed sweep: binning, overflow, and tie behavior across random
    # scene shapes.
    for seed in range(6):
        v, vi = random_mesh(
            jax.random.PRNGKey(100 + seed),
            n=1,
            num_v=40 + 7 * seed,
            num_f=50 + 11 * seed,
            h=64,
            w=128,
            zmin=2.0 + 0.5 * seed,
            zmax=9.0,
        )
        assert_match(v, vi, 64, 128)


# --------------------------------------------------------------------------
# Wireframe (diamond-exit) kernel parity
# --------------------------------------------------------------------------


def assert_lines_match(v, vi, h, w):
    from drtk_tpu.ops.rasterize import _rasterize_lines_impl
    from drtk_tpu.ops.rasterize_pallas import rasterize_lines_pallas

    vi = jnp.broadcast_to(vi[None], (v.shape[0],) + vi.shape) if vi.ndim == 2 else vi
    d_ref, i_ref = jax.jit(
        lambda v, vi: _rasterize_lines_impl(v, vi, h, w)
    )(v.astype(jnp.float32), vi)
    d_pal, i_pal = rasterize_lines_pallas(
        v.astype(jnp.float32), vi, h, w, interpret=True
    )
    i_ref = np.asarray(i_ref)
    i_pal = np.asarray(i_pal)
    d_ref = np.asarray(d_ref)
    d_pal = np.asarray(d_pal)
    mism = i_ref != i_pal
    if mism.any():
        assert mism.mean() < 1e-3, f"{mism.sum()} index mismatches"
        near_tie = np.abs(d_ref - d_pal) <= 1e-4 * np.abs(d_ref) + 1e-6
        assert near_tie[mism].all(), "index mismatch at non-tied depth"
    np.testing.assert_allclose(d_ref, d_pal, rtol=1e-4, atol=1e-6)


def _with_wire_flags(vi, flags=0x7):
    vi = np.array(vi)
    packed = (vi[..., 0].astype(np.uint32) | np.uint32(flags << 28)).astype(
        np.int64
    )
    packed = np.where(packed >= 2**31, packed - 2**32, packed)
    vi[..., 0] = packed.astype(np.int32)
    return jnp.asarray(vi)


def test_wireframe_two_triangles():
    v, vi, _ = two_triangles_scene(h=128, w=256)
    assert_lines_match(v, _with_wire_flags(vi), 128, 256)


def test_wireframe_random_mesh():
    v, vi = random_mesh(jax.random.PRNGKey(7), n=2, num_v=48, num_f=72,
                        h=96, w=160)
    assert_lines_match(v, _with_wire_flags(vi), 96, 160)


def test_wireframe_partial_edge_flags():
    # Only some edges visible per face (the per-edge visibility nibble).
    v, vi = random_mesh(jax.random.PRNGKey(8), n=1, num_v=32, num_f=48,
                        h=64, w=128)
    vi_f = np.array(vi)
    flags = (np.arange(vi_f.shape[0]) % 7 + 1).astype(np.uint32)
    vi_f[:, 0] = (vi_f[:, 0].astype(np.uint32) | (flags << 28)).astype(np.int32)
    assert_lines_match(v, jnp.asarray(vi_f), 64, 128)


def test_wireframe_huge_triangles_global_list():
    rng = np.random.RandomState(9)
    h = w = 256
    xy = rng.uniform(-0.5, 1.5, (1, 24, 2)).astype(np.float32) * [w, h]
    z = rng.uniform(2.0, 8.0, (1, 24, 1)).astype(np.float32)
    v = jnp.asarray(np.concatenate([xy, z], -1))
    vi = jnp.asarray(rng.randint(0, 24, (30, 3)).astype(np.int32))
    assert_lines_match(v, _with_wire_flags(vi), h, w)


# ---------------------------------------------------------------------------
# Row-tile viewports (the sharded path, VERDICT r2 item 3): each tile must
# equal the corresponding rows of the full-frame Pallas result bit-for-bit
# (same kernel, same float math — only the binning window moves).
# ---------------------------------------------------------------------------


def _viewport_scene(h=128, w=256):
    v, vi = random_mesh(jax.random.PRNGKey(11), num_v=64, num_f=96, h=h, w=w)
    v = v.astype(jnp.float32)
    if vi.ndim == 2:
        vi = jnp.broadcast_to(vi[None], (v.shape[0],) + vi.shape)
    return v, vi


def test_viewport_row_tiles_bit_exact():
    h, w, hb = 128, 256, 32
    v, vi = _viewport_scene(h, w)
    d_full, i_full = rasterize_pallas(v, vi, h, w, interpret=True)
    for y0 in (0, 32, 64, 96):
        d_t, i_t = rasterize_pallas(
            v, vi, hb, w, interpret=True, y_offset=y0, full_height=h
        )
        np.testing.assert_array_equal(
            np.asarray(i_t), np.asarray(i_full)[:, y0 : y0 + hb]
        )
        np.testing.assert_array_equal(
            np.asarray(d_t), np.asarray(d_full)[:, y0 : y0 + hb]
        )


def test_wireframe_viewport_row_tiles_bit_exact():
    from drtk_tpu.ops.rasterize_pallas import rasterize_lines_pallas

    h, w, hb = 128, 256, 32
    v, vi = _viewport_scene(h, w)
    vi = _with_wire_flags(np.asarray(vi))
    d_full, i_full = rasterize_lines_pallas(v, vi, h, w, interpret=True)
    for y0 in (0, 32, 64, 96):
        d_t, i_t = rasterize_lines_pallas(
            v, vi, hb, w, interpret=True, y_offset=y0, full_height=h
        )
        np.testing.assert_array_equal(
            np.asarray(i_t), np.asarray(i_full)[:, y0 : y0 + hb]
        )
        np.testing.assert_array_equal(
            np.asarray(d_t), np.asarray(d_full)[:, y0 : y0 + hb]
        )


def test_viewport_under_shard_map():
    """Pallas rasterizer inside shard_map with a traced per-device y_offset.

    check_vma=False: jax's pallas HLO *interpreter* fails vma tracking on
    its internal grid-loop dynamic_slices (unvarying loop indices into
    varying operands) — a jax-internal limitation of interpret mode, not of
    the kernel; the compiled Mosaic lowering carries vma via the out_shape
    structs (rasterize_pallas._out_struct) and runs under check_vma=True.
    """
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from jax.sharding import Mesh, PartitionSpec as P

    h, w = 128, 256
    v, vi = _viewport_scene(h, w)
    mesh = Mesh(np.array(jax.devices()[:4]), ("pix",))
    hb = h // 4

    def block(v, vi):
        y0 = jax.lax.axis_index("pix") * hb
        return rasterize_pallas(
            v, vi, hb, w, interpret=True, y_offset=y0, full_height=h
        )

    f = jax.shard_map(
        block,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(), P()),
        out_specs=(P(None, "pix", None), P(None, "pix", None)),
    )
    d_sh, i_sh = jax.jit(f)(v, vi)
    d_full, i_full = rasterize_pallas(v, vi, h, w, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_sh), np.asarray(i_full))
    np.testing.assert_array_equal(np.asarray(d_sh), np.asarray(d_full))


# ---------------------------------------------------------------------------
# Hierarchical binning (SUPER x SUPER supertile tier): medium-span triangles
# must bin coarsely (empty global list) and still match the XLA oracle.
# ---------------------------------------------------------------------------


def test_supertile_tier_bins_medium_triangles():
    from drtk_tpu.ops.rasterize_pallas import (
        MAX_SPAN, SUPER, TILE_H, TILE_W, _canvas_cull, _pack_setup,
        _segment_pairs, triangle_setup,
    )

    h, w = 512, 512  # 16 x 4 tiles -> 4 x 1 supertiles
    rng = np.random.RandomState(7)
    # Triangles ~200 px across: span > MAX_SPAN fine tiles, but a couple of
    # supertiles at most.
    c = rng.uniform(50, 460, (40, 2)).astype(np.float32)
    offs = rng.uniform(-120, 120, (40, 3, 2)).astype(np.float32)
    xy = (c[:, None] + offs).reshape(-1, 2)
    z = rng.uniform(3, 9, (120, 1)).astype(np.float32)
    v = jnp.asarray(np.concatenate([xy, z], -1)[None])
    vi = jnp.asarray((np.arange(120).reshape(40, 3)).astype(np.int32))

    setup = triangle_setup(v, jnp.broadcast_to(vi[None], (1,) + vi.shape))
    valid = _canvas_cull(setup, h, w)
    rows = _pack_setup(setup, valid)
    n_tx, n_ty = -(-w // TILE_W), -(-h // TILE_H)
    _, _, starts, counts, gmask, gcount = jax.vmap(
        lambda r, b, vl: _segment_pairs(r, b, vl, n_tx, n_ty)
    )(rows, setup.bbox, valid)

    n_tiles = n_tx * n_ty
    fine_pairs = int(np.asarray(counts)[0, :n_tiles].sum())
    super_pairs = int(np.asarray(counts)[0, n_tiles:].sum())
    assert int(gcount[0, 0]) == 0, "medium triangles must not go global"
    assert super_pairs > 0, "supertile tier unused"
    # sanity: some small triangles may still bin finely; spans > MAX_SPAN
    # must all be in the coarse tier
    assert super_pairs + fine_pairs > 0

    # and the rendered result matches the XLA oracle
    assert_match(v, vi, h, w)


def test_supertile_tier_under_viewport():
    """Viewport row tiles stay bit-exact when the coarse tier is active."""
    h, w, hb = 512, 512, 128
    rng = np.random.RandomState(8)
    c = rng.uniform(50, 460, (30, 2)).astype(np.float32)
    offs = rng.uniform(-150, 150, (30, 3, 2)).astype(np.float32)
    xy = (c[:, None] + offs).reshape(-1, 2)
    z = rng.uniform(3, 9, (90, 1)).astype(np.float32)
    v = jnp.asarray(np.concatenate([xy, z], -1)[None])
    vi = jnp.broadcast_to(
        jnp.asarray(np.arange(90).reshape(30, 3).astype(np.int32))[None],
        (1, 30, 3),
    )
    d_full, i_full = rasterize_pallas(v, vi, h, w, interpret=True)
    for y0 in (0, 128, 384):
        d_t, i_t = rasterize_pallas(
            v, vi, hb, w, interpret=True, y_offset=y0, full_height=h
        )
        np.testing.assert_array_equal(
            np.asarray(i_t), np.asarray(i_full)[:, y0 : y0 + hb]
        )
        np.testing.assert_array_equal(
            np.asarray(d_t), np.asarray(d_full)[:, y0 : y0 + hb]
        )


# ---------------------------------------------------------------------------
# TRUE global-list coverage: with hierarchical binning, triangles only go
# global when they span > MAX_SPAN supertiles (> 4x(128x512) px at default
# tiles) — a tall canvas keeps that path exercised.
# ---------------------------------------------------------------------------


def _tall_global_scene(rng, n_v=24, n_f=16, h=2048, w=128):
    # Full-height slivers: ssy ~ 16 supertiles -> sspan > MAX_SPAN -> global.
    x = rng.uniform(0, w, (1, n_v, 1)).astype(np.float32)
    y = rng.uniform(-0.2, 1.2, (1, n_v, 1)).astype(np.float32) * h
    z = rng.uniform(2.0, 8.0, (1, n_v, 1)).astype(np.float32)
    v = jnp.asarray(np.concatenate([x, y, z], -1))
    vi = jnp.asarray(rng.randint(0, n_v, (n_f, 3)).astype(np.int32))
    return v, vi


def test_true_global_list_tall_canvas():
    from drtk_tpu.ops.rasterize_pallas import (
        MAX_SPAN, SUPER, TILE_W, _canvas_cull, _pack_setup,
        _segment_pairs, triangle_setup,
    )

    rng = np.random.RandomState(9)
    h, w = 2048, 128
    v, vi = _tall_global_scene(rng, h=h, w=w)

    setup = triangle_setup(v, jnp.broadcast_to(vi[None], (1,) + vi.shape))
    valid = _canvas_cull(setup, h, w)
    rows = _pack_setup(setup, valid)
    n_tx, n_ty = 1, h // 32
    _, _, _, _, _, gcount = jax.vmap(
        lambda r, b, vl: _segment_pairs(r, b, vl, n_tx, n_ty)
    )(rows, setup.bbox, valid)
    assert int(gcount[0, 0]) > 0, "scene must exercise the true global list"

    assert_match(v, vi, h, w)


def test_true_global_list_wireframe_tall_canvas():
    from drtk_tpu.ops.rasterize_pallas import rasterize_lines_pallas

    rng = np.random.RandomState(10)
    h, w = 2048, 128
    v, vi = _tall_global_scene(rng, n_f=10, h=h, w=w)
    vi = _with_wire_flags(np.asarray(vi))
    assert_lines_match(v, vi, h, w)


def test_sort_pairs_key_width_fallbacks():
    """_sort_pairs picks int32 / uint32 packed keys / stable argsort by
    problem size; all three must produce a stable by-tile order (the
    int32 path is exercised by every other test — force the wide ones)."""
    from drtk_tpu.ops.rasterize_pallas import _next_pow2, _sort_pairs

    rng = np.random.RandomState(0)

    def check(p_total, n_tiles):
        flat = jnp.asarray(
            rng.randint(0, n_tiles + 1, p_total).astype(np.int32)
        )
        tiles, pairs = _sort_pairs(flat, n_tiles)
        tiles, pairs = np.asarray(tiles), np.asarray(pairs)
        flat_np = np.asarray(flat)
        assert (np.diff(tiles) >= 0).all(), "not sorted by tile"
        assert (flat_np[pairs] == tiles).all(), "pair indices broken"
        same = np.diff(tiles) == 0
        assert (np.diff(pairs)[same] > 0).all(), "not stable within tile"
        return _next_pow2(p_total) * (n_tiles + 1) + p_total

    kmax32 = check(1 << 12, 100)                      # int32 path
    assert kmax32 < 2**31
    kmax_u32 = check(1 << 15, 80_000)                 # uint32 path
    assert 2**31 <= kmax_u32 < 2**32
    kmax_arg = check(1 << 15, 200_000)                # stable-argsort path
    assert kmax_arg >= 2**32


def test_supertile_partial_grid():
    """Tile grids that don't divide evenly into supertiles (n_tx=5 -> 2
    supertile columns, the second only 1 tile wide): binning and kernel
    must agree on the tile->supertile mapping."""
    h, w = 384, 640  # 12 x 5 tiles -> 3 x 2 supertiles
    rng = np.random.RandomState(11)
    c = rng.uniform(40, 600, (36, 2)).astype(np.float32)
    offs = rng.uniform(-130, 130, (36, 3, 2)).astype(np.float32)
    xy = (c[:, None] + offs).reshape(-1, 2)
    xy[:, 1] = np.clip(xy[:, 1], -60, 440)
    z = rng.uniform(3, 9, (108, 1)).astype(np.float32)
    v = jnp.asarray(np.concatenate([xy, z], -1)[None])
    vi = jnp.asarray(np.arange(108).reshape(36, 3).astype(np.int32))
    assert_match(v, vi, h, w)


def test_alternate_tile_height():
    """tile_h is a tunable static (perf sweeps on hardware use 16/32/64);
    every height must produce identical results — binning, supertiles and
    the kernel pixel grid all derive from it."""
    h, w = 128, 256
    v, vi = _viewport_scene(h, w)
    d32, i32 = rasterize_pallas(v, vi, h, w, interpret=True)  # default 32
    for th in (16, 64):
        d_t, i_t = rasterize_pallas(v, vi, h, w, interpret=True, tile_h=th)
        np.testing.assert_array_equal(np.asarray(i_t), np.asarray(i32))
        np.testing.assert_array_equal(np.asarray(d_t), np.asarray(d32))
