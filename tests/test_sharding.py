"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §5.8).

The reference is single-GPU; the sharding layer is this framework's own
deliverable, so its contract is defined here: running the pipeline under a
(data, pix) mesh with GSPMD sharding constraints must produce the SAME
index images (bit-equal) and the same gradients (allclose) as a
single-device run — including across the pix-shard row boundaries, where
the edge_grad CRD stencil needs a halo row and the vertex-gradient
reduction fans in from every shard.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import drtk_tpu as dt
from drtk_tpu.ops.grid_sample import grid_sample
from drtk_tpu.parallel.sharding import (
    constrain,
    make_mesh,
    pipeline_sharding,
    replicated,
)

from tests.utils import two_triangles_scene


def _require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def test_make_mesh_factoring():
    _require_devices(8)
    m = make_mesh(8, batch=1)
    assert m.devices.shape == (1, 8) and m.axis_names == ("data", "pix")
    m = make_mesh(8, batch=2)
    assert m.devices.shape == (2, 4)
    m = make_mesh(8, batch=6)
    assert m.devices.shape == (2, 4)  # largest divisor of both 6 and 8
    m = make_mesh(4, batch=8)
    assert m.devices.shape == (4, 1)
    m = make_mesh(1, batch=3)
    assert m.devices.shape == (1, 1)


def test_pipeline_sharding_specs():
    _require_devices(8)
    mesh = make_mesh(8, batch=2)
    sh = pipeline_sharding(mesh)
    assert sh["image"].spec == P("data", None, "pix", None)
    assert sh["index"].spec == P("data", "pix", None)
    assert sh["verts"].spec == P("data", None, None)
    assert replicated(mesh).spec == P()


def _scene(batch=1, h=96, w=96, dtype=jnp.float32):
    v, vi, _ = two_triangles_scene(h, w, dtype=dtype)
    rng = np.random.RandomState(9)
    if batch > 1:
        jitter = rng.uniform(-3, 3, size=(batch, 1, 3)).astype(np.float32)
        v = jnp.concatenate([v + jitter[i : i + 1] for i in range(batch)], 0)
    vt = jnp.asarray(
        rng.uniform(0.05, 0.95, size=(1, v.shape[1], 2)).astype(np.float32),
        dtype,
    )
    vt = jnp.broadcast_to(vt, (batch,) + vt.shape[1:])
    tex = jnp.asarray(rng.rand(batch, 3, 32, 32).astype(np.float32), dtype)
    weight = jnp.asarray(
        rng.randn(batch, 3, h, w).astype(np.float32), dtype
    )
    return v, vi, vt, tex, weight


def _make_pipeline(vi, h, w, sh=None):
    """loss + forward images; optionally GSPMD-constrained to shardings."""

    def f(v, vt, tex, weight):
        index_img = dt.rasterize(v, vi, h, w)
        if sh is not None:
            index_img = constrain(index_img, sh["index"])
        depth, bary = dt.render(v, vi, index_img)
        if sh is not None:
            bary = constrain(bary, sh["image"])
        vt_img = dt.interpolate(vt, vi, index_img, bary)
        uv = jnp.moveaxis(vt_img, 1, -1) * 2.0 - 1.0
        img = grid_sample(tex, uv, mode="bilinear", padding_mode="border")
        img = img * (index_img != -1)[:, None]
        if sh is not None:
            img = constrain(img, sh["image"])
        img = dt.edge_grad_estimator(
            v_pix=v, vi=vi, bary_img=bary, img=img, index_img=index_img
        )
        loss = jnp.sum(img * weight)
        return loss, (index_img, depth, img)

    return f


@pytest.mark.parametrize("batch,axes", [(1, (1, 8)), (2, (2, 4))])
def test_sharded_forward_and_grads_match_single_device(batch, axes):
    """Forward images bit-equal, vertex/attr/texture grads allclose, between
    the 8-device sharded run and the single-device run. The two-triangles
    scene puts silhouette edges AND a depth-intersection edge across the
    pix-shard row boundaries (96 rows / 8 shards = 12-row blocks; the
    intersection line spans most of the image height)."""
    _require_devices(8)
    h = w = 96
    v, vi, vt, tex, weight = _scene(batch=batch, h=h, w=w)

    single = jax.jit(
        jax.value_and_grad(_make_pipeline(vi, h, w), argnums=(0, 1, 2),
                           has_aux=True)
    )
    (loss_1, aux_1), grads_1 = single(v, vt, tex, weight)

    mesh = make_mesh(8, batch=batch)
    assert mesh.devices.shape == axes
    sh = pipeline_sharding(mesh)
    sharded = jax.jit(
        jax.value_and_grad(_make_pipeline(vi, h, w, sh), argnums=(0, 1, 2),
                           has_aux=True)
    )
    with mesh:
        v_s = jax.device_put(v, sh["verts"])
        vt_s = jax.device_put(vt, sh["verts"])
        tex_s = jax.device_put(tex, NamedSharding(mesh, P("data")))
        w_s = jax.device_put(weight, sh["image"])
        (loss_8, aux_8), grads_8 = sharded(v_s, vt_s, tex_s, w_s)
        jax.block_until_ready(grads_8)

    index_1, depth_1, img_1 = [np.asarray(x) for x in aux_1]
    index_8, depth_8, img_8 = [np.asarray(x) for x in aux_8]
    np.testing.assert_array_equal(index_8, index_1, err_msg="index_img")
    np.testing.assert_allclose(depth_8, depth_1, rtol=0, atol=0,
                               err_msg="depth")
    np.testing.assert_allclose(img_8, img_1, rtol=1e-6, atol=1e-6,
                               err_msg="img")
    np.testing.assert_allclose(float(loss_8), float(loss_1), rtol=1e-5)

    names = ["grad_v", "grad_vt", "grad_tex"]
    for name, g8, g1 in zip(names, grads_8, grads_1):
        g8, g1 = np.asarray(g8), np.asarray(g1)
        scale = max(np.abs(g1).max(), 1e-3)
        np.testing.assert_allclose(
            g8, g1, rtol=1e-5, atol=1e-5 * scale, err_msg=f"{name} mismatch"
        )


def test_shard_boundary_crosses_edges():
    """Guard: the scene used above really does have index-image
    discontinuities crossing the 12-row shard boundaries — otherwise the
    halo path of edge_grad is untested."""
    h = w = 96
    v, vi, vt, tex, weight = _scene(batch=1, h=h, w=w)
    index = np.asarray(dt.rasterize(v, vi, h, w))[0]
    crossing = 0
    for r in range(12, h, 12):
        # vertical discontinuities straddling the boundary row
        crossing += int(((index[r - 1] != index[r])).sum())
    assert crossing > 10, f"only {crossing} boundary-crossing edge pixels"


def test_sharded_f64_grads_bit_tight():
    """f64 sharded-vs-single agreement at 1e-12: reduction-order effects
    across shards must stay at rounding level."""
    _require_devices(8)
    h = w = 96
    v, vi, vt, tex, weight = _scene(batch=1, h=h, w=w, dtype=jnp.float64)

    f = _make_pipeline(vi, h, w)
    (_, _), grads_1 = jax.jit(
        jax.value_and_grad(f, argnums=(0, 1, 2), has_aux=True)
    )(v, vt, tex, weight)

    mesh = make_mesh(8, batch=1)
    sh = pipeline_sharding(mesh)
    fs = _make_pipeline(vi, h, w, sh)
    with mesh:
        (_, _), grads_8 = jax.jit(
            jax.value_and_grad(fs, argnums=(0, 1, 2), has_aux=True)
        )(
            jax.device_put(v, sh["verts"]),
            jax.device_put(vt, sh["verts"]),
            tex,
            jax.device_put(weight, sh["image"]),
        )
        jax.block_until_ready(grads_8)

    for g8, g1 in zip(grads_8, grads_1):
        g8, g1 = np.asarray(g8), np.asarray(g1)
        scale = max(np.abs(g1).max(), 1e-6)
        np.testing.assert_allclose(g8, g1, rtol=1e-12, atol=1e-12 * scale)


def test_mipmap_grid_sample_shard_map_grads():
    """mipmap_grid_sample inside shard_map (batch over 'data', pyramid
    replicated): exercises _quad_rows_gather_bwd's varying branch — the
    dtype-preserving scatter + psum_cotangent of the replicated pyramid's
    gradient. Must match single-device gradients."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from jax.sharding import Mesh, PartitionSpec as P

    shard_map = jax.shard_map
    rng = np.random.RandomState(2)
    batch, h, w = 4, 16, 16
    levels = [
        jnp.asarray(rng.rand(batch, 3, 32 >> i, 32 >> i).astype(np.float32))
        for i in range(3)
    ]
    grid = jnp.asarray(
        rng.uniform(-0.9, 0.9, (batch, h, w, 2)).astype(np.float32)
    )
    dxdy = jnp.full((batch, h, w, 2, 2), 0.06, jnp.float32)
    weight = jnp.asarray(rng.randn(batch, 3, h, w).astype(np.float32))

    def loss(levels, grid):
        out = dt.mipmap_grid_sample(
            levels, grid, dxdy, max_aniso=2, padding_mode="border"
        )
        return jnp.sum(out * weight)

    g1 = jax.jit(jax.grad(loss, argnums=(0, 1)))(levels, grid)

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))

    def block(levels, grid, wgt):
        out = dt.mipmap_grid_sample(
            list(levels), grid, dxdy[:1], max_aniso=2, padding_mode="border"
        )
        return jnp.sum(out * wgt, axis=(1, 2, 3))  # [local_batch]

    def sharded_loss(levels, grid):
        per = shard_map(
            block, mesh=mesh,
            in_specs=(P("data"), P("data"), P("data")),
            out_specs=P("data"),
        )(tuple(levels), grid, weight)
        return jnp.sum(per)

    g4 = jax.jit(jax.grad(sharded_loss, argnums=(0, 1)))(levels, grid)
    for a, b in zip(jax.tree.leaves(g4), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )
