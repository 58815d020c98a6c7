"""render(): parity vs float64 oracle + gradient checks vs finite differences."""

import jax
import jax.numpy as jnp
import numpy as np

import drtk_tpu as dt

from .utils import assert_allclose, grid_mesh, random_mesh, two_triangles_scene


def test_forward_matches_f64_oracle():
    key = jax.random.PRNGKey(1)
    v, vi = random_mesh(key)
    idx = dt.rasterize(v, vi, 64, 64)
    depth, bary = dt.render(v, vi, idx)
    depth_ref, bary_ref = dt.render_ref(v, vi, idx)
    assert_allclose(depth, depth_ref, rtol=1e-4, atol=1e-4)
    assert_allclose(bary, bary_ref, rtol=1e-4, atol=1e-4)


def test_background_zero():
    v, vi, _ = two_triangles_scene(64, 64)
    idx = dt.rasterize(v, vi, 64, 64)
    depth, bary = dt.render(v, vi, idx)
    bg = idx == -1
    assert float(jnp.abs(jnp.where(bg, depth, 0.0)).max()) == 0.0
    assert float(jnp.abs(jnp.where(bg[:, None], bary, 0.0)).max()) == 0.0


def test_bary3d_sums_to_one_on_foreground():
    v, vi = grid_mesh(z_amp=2.0)
    idx = dt.rasterize(v, vi, 64, 64)
    _, bary = dt.render(v, vi, idx)
    fg = idx != -1
    s = jnp.where(fg, bary.sum(axis=1), 1.0)
    assert float(jnp.abs(s - 1.0).max()) < 1e-5


def test_grad_matches_finite_differences():
    # Fixed index_img; perturb v (xy and z) in float64 so FD is accurate.
    v, vi = grid_mesh(h=48, w=48, gn=4, z_amp=1.5, dtype=jnp.float64)
    idx = dt.rasterize(v, vi, 48, 48)

    key = jax.random.PRNGKey(2)
    wd = jax.random.normal(key, idx.shape, jnp.float64)
    wb = jax.random.normal(key, (1, 3) + idx.shape[1:], jnp.float64)

    def loss(v):
        depth, bary = dt.render(v, vi, idx)
        return jnp.sum(depth * wd) + jnp.sum(bary * wb)

    g = jax.grad(loss)(v)

    eps = 1e-5
    rng = np.random.RandomState(0)
    for _ in range(12):
        vtx = rng.randint(0, v.shape[1])
        comp = rng.randint(0, 3)
        dv = jnp.zeros_like(v).at[0, vtx, comp].set(eps)
        fd = (loss(v + dv) - loss(v - dv)) / (2 * eps)
        np.testing.assert_allclose(
            float(g[0, vtx, comp]), float(fd), rtol=2e-3, atol=1e-4,
            err_msg=f"vertex {vtx} comp {comp}",
        )


def test_grad_zero_for_background_only_verts():
    # A vertex not referenced by any visible face must get zero grad.
    v, vi = grid_mesh(h=32, w=32, gn=3)
    v = jnp.concatenate([v, jnp.array([[[1000.0, 1000.0, 5.0]]])], axis=1)
    idx = dt.rasterize(v, vi, 32, 32)

    def loss(v):
        depth, bary = dt.render(v, vi, idx)
        return jnp.sum(depth**2) + jnp.sum(bary**2)

    g = jax.grad(loss)(v)
    assert float(jnp.abs(g[0, -1]).max()) == 0.0
