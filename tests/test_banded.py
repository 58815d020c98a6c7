"""Row-banded single-chip pipeline (drtk_tpu.parallel.banded).

Contract: banding is a memory/scheduling choice, not a numerics one —
the banded forward equals the full-frame forward bit-exactly (viewport
contract), and banded gradients equal full-frame gradients up to f32
summation order (the same split tests/test_spmd.py pins for the
shard_map decomposition across chips)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import drtk_tpu as dt
from drtk_tpu.ops.grid_sample import grid_sample
from drtk_tpu.parallel.banded import (
    edge_grad_estimator_banded,
    map_row_bands,
)
from tests.utils import assert_allclose, grid_mesh, random_mesh


def _pipeline_outputs(v, vi, vt, h, w, y0=None, hb=None):
    """rasterize -> render -> interpolate, full-frame or as a viewport."""
    if y0 is None:
        idx = dt.rasterize(v, vi, h, w)
        _, bary = dt.render(v, vi, idx)
        vt_img = dt.interpolate(vt, vi, idx, bary)
    else:
        idx = dt.rasterize(v, vi, hb, w, y_offset=y0, full_height=h)
        _, bary = dt.render(v, vi, idx, y_offset=y0)
        vt_img = dt.interpolate(vt, vi, idx, bary, y_offset=y0,
                                full_height=h)
    return idx, bary, vt_img


@pytest.mark.parametrize("n_bands", [2, 4])
def test_map_row_bands_forward_bit_exact(n_bands):
    h, w = 64, 96
    v, vi = random_mesh(jax.random.PRNGKey(0), n=2, num_v=40, num_f=60,
                        h=h, w=w)
    rng = np.random.RandomState(0)
    vt = jnp.asarray(rng.rand(2, 40, 2).astype(np.float32))

    idx_f, bary_f, vt_f = jax.jit(
        lambda v: _pipeline_outputs(v, vi, vt, h, w)
    )(v)

    hb = h // n_bands

    def band(y0):
        return _pipeline_outputs(v, vi, vt, h, w, y0=y0, hb=hb)

    idx_b, bary_b, vt_b = jax.jit(
        lambda: map_row_bands(band, h, n_bands)
    )()

    np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(idx_b))
    np.testing.assert_array_equal(np.asarray(bary_f), np.asarray(bary_b))
    np.testing.assert_array_equal(np.asarray(vt_f), np.asarray(vt_b))


def test_map_row_bands_gradients_match_full_frame():
    """Banded (remat'd scan) gradients == full-frame gradients for the
    textured pipeline, up to f32 summation order."""
    h, w = 64, 64
    v, vi = grid_mesh(h, w, gn=5, z0=5.0, z_amp=1.5)
    rng = np.random.RandomState(1)
    v = v + jnp.asarray(rng.uniform(-0.3, 0.3, v.shape).astype(np.float32))
    vt = jnp.asarray(rng.rand(1, v.shape[1], 2).astype(np.float32))
    tex = jnp.asarray(rng.rand(1, 3, 16, 16).astype(np.float32))
    weight = jnp.asarray(rng.randn(1, 3, h, w).astype(np.float32))

    def shade(vt_img, idx):
        uv = jnp.moveaxis(vt_img, 1, -1) * 2.0 - 1.0
        img = grid_sample(tex, uv, mode="bilinear", padding_mode="border")
        return img * (idx != -1)[:, None]

    def loss_full(v, vt):
        idx, bary, vt_img = _pipeline_outputs(v, vi, vt, h, w)
        return jnp.sum(shade(vt_img, idx) * weight)

    def loss_banded(v, vt, n_bands=4):
        hb = h // n_bands

        def band(y0):
            idx, bary, vt_img = _pipeline_outputs(v, vi, vt, h, w,
                                                  y0=y0, hb=hb)
            return shade(vt_img, idx)

        img = map_row_bands(band, h, n_bands)
        return jnp.sum(img * weight)

    gf = jax.jit(jax.grad(loss_full, argnums=(0, 1)))(v, vt)
    gb = jax.jit(jax.grad(loss_banded, argnums=(0, 1)))(v, vt)
    assert_allclose(gb[0], gf[0], rtol=1e-5, atol=1e-5, err_msg="grad_v")
    assert_allclose(gb[1], gf[1], rtol=1e-5, atol=1e-5, err_msg="grad_vt")


@pytest.mark.parametrize("scene", ["random", "grid"])
def test_edge_grad_banded_matches_full_frame(scene):
    """Banded edge_grad backward == full-frame backward, including at
    discontinuities that cross band boundaries (random meshes put plenty
    of edges on every row)."""
    h, w = 64, 96
    if scene == "random":
        v, vi = random_mesh(jax.random.PRNGKey(3), n=2, num_v=48, num_f=72,
                            h=h, w=w)
    else:
        v, vi = grid_mesh(h, w, gn=6, z0=5.0, z_amp=2.0)
        rng0 = np.random.RandomState(7)
        v = v + jnp.asarray(
            rng0.uniform(-0.4, 0.4, v.shape).astype(np.float32)
        )
    n = v.shape[0]
    rng = np.random.RandomState(4)
    weight = jnp.asarray(rng.randn(n, 3, h, w).astype(np.float32))

    idx = jax.jit(lambda v: dt.rasterize(v, vi, h, w))(v)
    _, bary = jax.jit(lambda v: dt.render(v, vi, idx))(v)
    img = jnp.asarray(rng.rand(n, 3, h, w).astype(np.float32))
    img = img * (idx != -1)[:, None]

    def loss(v, estimator):
        out = estimator(v_pix=v, vi=vi, bary_img=bary, img=img,
                        index_img=idx)
        return jnp.sum(out * weight)

    g_full = jax.jit(
        lambda v: jax.grad(loss)(v, dt.edge_grad_estimator)
    )(v)
    banded = lambda **kw: edge_grad_estimator_banded(n_bands=4, **kw)
    g_band = jax.jit(lambda v: jax.grad(loss)(v, banded))(v)
    assert np.abs(np.asarray(g_full)).max() > 0  # scene exercises edges
    assert_allclose(g_band, g_full, rtol=1e-5, atol=1e-6)


def test_edge_grad_banded_forward_identity_and_img_grad():
    h, w = 32, 64
    v, vi = random_mesh(jax.random.PRNGKey(5), n=1, num_v=24, num_f=30,
                        h=h, w=w)
    idx = dt.rasterize(v, vi, h, w)
    _, bary = dt.render(v, vi, idx)
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.rand(1, 2, h, w).astype(np.float32))

    out, vjp = jax.vjp(
        lambda im: edge_grad_estimator_banded(
            v_pix=v, vi=vi, bary_img=bary, img=im, index_img=idx,
            n_bands=2,
        ),
        img,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))
    ct = jnp.asarray(rng.randn(1, 2, h, w).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(vjp(ct)[0]), np.asarray(ct))


def test_map_row_bands_validates_divisibility():
    with pytest.raises(ValueError):
        map_row_bands(lambda y0: jnp.zeros((1, 3, 10, 8)), 64, 3)
    with pytest.raises(ValueError):
        edge_grad_estimator_banded(
            v_pix=jnp.zeros((1, 3, 3)),
            vi=jnp.zeros((1, 1, 3), jnp.int32),
            bary_img=jnp.zeros((1, 3, 10, 8)),
            img=jnp.zeros((1, 1, 10, 8)),
            index_img=jnp.full((1, 10, 8), -1, jnp.int32),
            n_bands=3,
        )
