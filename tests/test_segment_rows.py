"""Tests: the binned-matmul pixel->face accumulation equals the plain
scatter, on both the fast path (empty global list) and the fallback."""

import jax
import jax.numpy as jnp
import numpy as np

from drtk_tpu.ops.segment_rows import scatter_rows_to_faces
import drtk_tpu as dt
from tests.utils import grid_mesh, random_mesh


def plain_scatter(rows, index_img, f_cnt, dtype=jnp.float64):
    """Oracle accumulation. float64 by default: an f32 sequential scatter
    of ~1e5 terms per face carries ~2e-5 relative summation noise of its
    own — measured MORE than the MXU path's tree-summed dots (8e-7), so
    comparing two f32 orderings against each other only tests noise."""
    n, h, w, k = rows.shape
    safe = jnp.maximum(index_img, 0).reshape(n, -1)

    def one(ids, vals):
        return jnp.zeros((f_cnt, k), dtype).at[ids].add(vals)

    return jax.vmap(one)(safe, rows.reshape(n, -1, k).astype(dtype))


def run_case(v, vi, h, w, k=9, seed=0):
    vi = jnp.broadcast_to(vi[None], (v.shape[0],) + vi.shape) if vi.ndim == 2 else vi
    index_img = dt.rasterize(v, vi, h, w, impl="xla")
    rng = np.random.RandomState(seed)
    rows = jnp.asarray(
        rng.randn(*index_img.shape, k).astype(np.float32)
    ) * (index_img >= 0)[..., None]
    ref = plain_scatter(rows, index_img, vi.shape[1])
    # The MXU path's three-term bf16 split makes every product exact to
    # f32 (window_accum.bf16_split3); remaining error vs the f64 oracle is
    # f32 tree-summation noise (measured <=1e-6 rel at 5e4 terms/face).
    out = scatter_rows_to_faces(rows, index_img, v, vi, interpret=True)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    # geometry-free mode (v=None, interpolate's default attribute-gradient
    # path) — identical binning, bins are index-derived either way.
    out2 = scatter_rows_to_faces(rows, index_img, None, vi, interpret=True)
    np.testing.assert_allclose(out2, ref, rtol=1e-5, atol=1e-5)


def test_fast_path_grid_mesh():
    v, vi = grid_mesh(h=96, w=160, gn=8)
    run_case(v, vi, 96, 160)


def test_fallback_big_triangles():
    # Canvas-sized random triangles: ids per tile are scattered, stressing
    # the range-bin construction (and the residual fallback if it trips).
    rng = np.random.RandomState(1)
    xy = rng.uniform(-0.5, 1.5, (1, 24, 2)).astype(np.float32) * [640, 256]
    z = rng.uniform(2, 8, (1, 24, 1)).astype(np.float32)
    v = jnp.asarray(np.concatenate([xy, z], -1))
    vi = jnp.asarray(rng.randint(0, 24, (30, 3)).astype(np.int32))
    run_case(v, vi, 256, 640)


def test_batched_mixed():
    v, vi = random_mesh(jax.random.PRNGKey(2), n=2, num_v=48, num_f=64,
                        h=64, w=128)
    run_case(v, vi, 64, 128, k=6)


def test_nonaligned_image():
    v, vi = grid_mesh(h=70, w=130, gn=6)
    run_case(v, vi, 70, 130, k=3)


def test_range_bins_residual_fallback():
    """A tile containing more scattered id clusters than the bins have
    ranges must trip the residual flag and fall back to the exact
    scatter."""
    from drtk_tpu.ops.segment_rows import (
        _RANGE_WIDTH,
        _bin_capacity,
        _range_bins,
    )

    f_cnt = 200000
    # exceed BOTH coverage tiers (2x the base range count)
    n_clusters = 2 * (_bin_capacity(f_cnt, 1) // _RANGE_WIDTH) + 2
    # one 32x128 tile with ids from widely-spaced clusters, two per row
    idx = np.full((1, 32, 128), -1, np.int32)
    for i in range(n_clusters):
        idx[0, i // 2, (i % 2) * 64 : (i % 2 + 1) * 64] = i * 5000
    index_img = jnp.asarray(idx)
    bins1, ok1, bins2, ok2 = _range_bins(index_img, f_cnt, 32, 128)
    assert not bool(ok1[0]) and not bool(ok2[0])

    rng = np.random.RandomState(0)
    rows = jnp.asarray(rng.randn(1, 32, 128, 4).astype(np.float32)) * (
        index_img >= 0
    )[..., None]
    vi = jnp.zeros((1, f_cnt, 3), jnp.int32)
    out = scatter_rows_to_faces(rows, index_img, None, vi, interpret=True)
    ref = plain_scatter(rows, index_img, f_cnt)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_ambient_highest_precision_context():
    """The kernel's bf16 dots pin precision=DEFAULT explicitly: an ambient
    default_matmul_precision("highest") would otherwise stamp an fp32
    contract precision on bf16 operands, which Mosaic rejects ("Bad lhs
    type") on the real TPU compiler. Interpret mode can't see the Mosaic
    legalization, but this pins that the path runs and stays exact under
    the ambient context (found by bench.py --parity, round 4)."""
    v, vi = grid_mesh(h=96, w=160, gn=8)
    with jax.default_matmul_precision("highest"):
        run_case(v, vi, 96, 160, seed=3)
