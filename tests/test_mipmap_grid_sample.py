"""Tests for drtk_tpu.ops.mipmap_grid_sample.

Strategy mirrors the reference's documented equivalence contract
(drtk/mipmap_grid_sample.py:140-147): the main implementation must match the
pure reference when called with ``force_max_aniso=True`` and
``clip_grad=False`` and the reference with ``high_quality=False``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drtk_tpu.ops.grid_sample import grid_sample
from drtk_tpu.ops.mipmap_grid_sample import (
    mipmap_grid_sample,
    mipmap_grid_sample_ref,
)


def make_pyramid(key, n=1, c=3, base=32, q=4, dtype=jnp.float32):
    keys = jax.random.split(key, q)
    levels = []
    s = base
    for i in range(q):
        levels.append(
            jax.random.uniform(keys[i], (n, c, s, s), dtype=jnp.float32).astype(dtype)
        )
        s = max(1, s // 2)
    return levels


def make_grid_and_jac(key, n=1, h=24, w=24, scale=0.06):
    k1, k2 = jax.random.split(key)
    gy, gx = jnp.meshgrid(
        jnp.linspace(-0.9, 0.9, h), jnp.linspace(-0.9, 0.9, w), indexing="ij"
    )
    grid = jnp.stack([gx, gy], axis=-1)[None].astype(jnp.float32)
    grid = jnp.tile(grid, (n, 1, 1, 1))
    grid = grid + 0.02 * jax.random.normal(k1, grid.shape, jnp.float32)
    jac = scale * jax.random.normal(k2, (n, h, w, 2, 2), jnp.float32)
    return grid, jac


def test_single_level_single_tap_equals_grid_sample():
    key = jax.random.PRNGKey(0)
    levels = make_pyramid(key, q=1)
    grid, jac = make_grid_and_jac(jax.random.PRNGKey(1))
    for mode in ("bilinear", "bicubic"):
        for pad in ("zeros", "border", "reflection"):
            out = mipmap_grid_sample(levels, grid, jac, 1, mode=mode, padding_mode=pad)
            expected = grid_sample(
                levels[0], grid, mode=mode, padding_mode=pad, align_corners=False
            )
            np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("pad", ["zeros", "border", "reflection"])
def test_matches_reference_force_max_aniso(mode, pad):
    key = jax.random.PRNGKey(2)
    levels = make_pyramid(key, q=4, base=32)
    grid, jac = make_grid_and_jac(jax.random.PRNGKey(3))
    out = mipmap_grid_sample(
        levels, grid, jac, 4, mode=mode, padding_mode=pad,
        force_max_aniso=True, clip_grad=False,
    )
    ref = mipmap_grid_sample_ref(
        levels, grid, jac, 4, mode=mode, padding_mode=pad, high_quality=False
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_matches_reference_isotropic():
    # max_aniso == 1: pure trilinear mipmapping.
    key = jax.random.PRNGKey(4)
    levels = make_pyramid(key, q=3, base=16)
    grid, jac = make_grid_and_jac(jax.random.PRNGKey(5), scale=0.1)
    out = mipmap_grid_sample(levels, grid, jac, 1, padding_mode="border")
    ref = mipmap_grid_sample_ref(levels, grid, jac, 1, padding_mode="border")
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_gradients_match_reference():
    key = jax.random.PRNGKey(6)
    levels = make_pyramid(key, q=3, base=16)
    grid, jac = make_grid_and_jac(jax.random.PRNGKey(7), h=12, w=12)

    def loss_main(levels, grid):
        out = mipmap_grid_sample(
            levels, grid, jac, 4, padding_mode="border", force_max_aniso=True
        )
        return jnp.sum(out**2)

    def loss_ref(levels, grid):
        out = mipmap_grid_sample_ref(levels, grid, jac, 4, padding_mode="border")
        return jnp.sum(out**2)

    g_main = jax.grad(loss_main, argnums=(0, 1))(levels, grid)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(levels, grid)
    for gm, gr in zip(g_main[0], g_ref[0]):
        np.testing.assert_allclose(gm, gr, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(g_main[1], g_ref[1], rtol=1e-4, atol=1e-5)


def test_no_gradient_to_vt_dxdy():
    key = jax.random.PRNGKey(8)
    levels = make_pyramid(key, q=2, base=8)
    grid, jac = make_grid_and_jac(jax.random.PRNGKey(9), h=8, w=8)

    g = jax.grad(
        lambda j: jnp.sum(
            mipmap_grid_sample(levels, grid, j, 2, padding_mode="border") ** 2
        )
    )(jac)
    np.testing.assert_allclose(g, jnp.zeros_like(jac))


def test_hardware_tap_count_path():
    # force_max_aniso=False: per-pixel dynamic tap counts, masked taps.
    key = jax.random.PRNGKey(10)
    levels = make_pyramid(key, q=4, base=32)
    grid, jac = make_grid_and_jac(jax.random.PRNGKey(11))
    # Strongly anisotropic Jacobian: large du/dx, small dv/dy.
    jac = jac.at[..., 0, 0].mul(8.0)
    out = mipmap_grid_sample(levels, grid, jac, 8, padding_mode="border")
    assert out.shape == (1, 3, 24, 24)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_clip_grad_truncated_pyramid():
    key = jax.random.PRNGKey(12)
    levels = make_pyramid(key, q=2, base=64)  # truncated: full pyramid is 7
    grid, jac = make_grid_and_jac(jax.random.PRNGKey(13), scale=0.5)
    out_noclip = mipmap_grid_sample(levels, grid, jac, 4, padding_mode="border")
    out_clip = mipmap_grid_sample(
        levels, grid, jac, 4, padding_mode="border", clip_grad=True
    )
    assert bool(jnp.all(jnp.isfinite(out_clip)))
    # clip_grad must change tap spread for levels beyond the pyramid.
    assert not np.allclose(out_noclip, out_clip)


def test_nonsquare_levels_and_odd_pyramid():
    # Levels that are not exact halves are allowed (relaxed requirement).
    n, c = 2, 2
    key = jax.random.PRNGKey(14)
    k = jax.random.split(key, 3)
    levels = [
        jax.random.uniform(k[0], (n, c, 20, 20), jnp.float32),
        jax.random.uniform(k[1], (n, c, 9, 9), jnp.float32),
        jax.random.uniform(k[2], (n, c, 5, 5), jnp.float32),
    ]
    grid, jac = make_grid_and_jac(jax.random.PRNGKey(15), n=n, h=10, w=10)
    out = mipmap_grid_sample(
        levels, grid, jac, 4, padding_mode="border", force_max_aniso=True
    )
    ref = mipmap_grid_sample_ref(levels, grid, jac, 4, padding_mode="border")
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_validation_errors():
    levels = [jnp.zeros((1, 1, 4, 4))]
    grid = jnp.zeros((1, 2, 2, 2))
    jac = jnp.zeros((1, 2, 2, 2, 2))
    with pytest.raises(ValueError):
        mipmap_grid_sample(levels, grid, jac, 1, mode="nearest")
    with pytest.raises(ValueError):
        mipmap_grid_sample(levels, grid, jac, 1, padding_mode="wrap")
    with pytest.raises(ValueError):
        mipmap_grid_sample([], grid, jac, 1)
    with pytest.raises(ValueError):
        mipmap_grid_sample(levels * 12, grid, jac, 1)
    with pytest.raises(ValueError):
        mipmap_grid_sample(levels, grid, jnp.zeros((1, 2, 2, 2)), 1)
