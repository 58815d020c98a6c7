"""Tests for screen_space_uv_derivative: compare the analytic per-pixel
Jacobian against finite differences of the rasterized uv image."""

import jax.numpy as jnp
import numpy as np

import drtk_tpu as dt
from drtk_tpu.screen_space_uv_derivative import screen_space_uv_derivative


def make_scene(h=64, w=64, tilt=0.0):
    # A large two-triangle quad in world space, optionally tilted in depth.
    v = jnp.asarray(
        np.array(
            [
                [-1.0, -1.0, 4.0],
                [1.0, -1.0, 4.0 + tilt],
                [1.0, 1.0, 4.0 + tilt],
                [-1.0, 1.0, 4.0],
            ],
            np.float32,
        )[None]
    )
    vt = jnp.asarray(
        np.array(
            [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]], np.float32
        )[None]
    )
    vi = jnp.asarray(np.array([[0, 1, 2], [0, 2, 3]], np.int32))
    vti = vi
    campos = jnp.zeros((1, 3), jnp.float32)
    camrot = jnp.eye(3, dtype=jnp.float32)[None]
    focal = jnp.asarray(np.diag([w * 1.2, h * 1.2]).astype(np.float32)[None])
    princpt = jnp.asarray(np.array([[w / 2, h / 2]], np.float32))
    return v, vt, vi, vti, campos, camrot, focal, princpt


def _pipeline(h, w, tilt):
    v, vt, vi, vti, campos, camrot, focal, princpt = make_scene(h, w, tilt)
    v_pix = dt.transform(v, campos=campos, camrot=camrot, focal=focal,
                         princpt=princpt)
    index_img = dt.rasterize(v_pix, vi, h, w)
    _, bary_img = dt.render(v_pix, vi, index_img)
    mask = index_img != -1
    uv_img = dt.interpolate(vt, vti, index_img, bary_img)  # [N, 2, H, W]
    jac = screen_space_uv_derivative(
        v, vt, vi, vti, index_img, bary_img, mask, campos, camrot, focal
    )
    return index_img, uv_img, jac, mask


def _check_against_fd(index_img, uv_img, jac, rtol=5e-3, atol=5e-5):
    idx = np.asarray(index_img[0])
    uv = np.asarray(uv_img[0])  # [2, H, W]
    j = np.asarray(jac[0])  # [H, W, 2, 2]

    # du/dx, dv/dx: horizontal neighbors within the same triangle.
    same_x = (idx[:, 1:] == idx[:, :-1]) & (idx[:, :-1] >= 0)
    fd_x = uv[:, :, 1:] - uv[:, :, :-1]  # [2, H, W-1]
    an_x = np.moveaxis(j[:, :-1, 0, :], -1, 0)  # [2, H, W-1]
    np.testing.assert_allclose(
        an_x[:, same_x], fd_x[:, same_x], rtol=rtol, atol=atol
    )

    same_y = (idx[1:, :] == idx[:-1, :]) & (idx[:-1, :] >= 0)
    fd_y = uv[:, 1:, :] - uv[:, :-1, :]
    an_y = np.moveaxis(j[:-1, :, 1, :], -1, 0)
    np.testing.assert_allclose(
        an_y[:, same_y], fd_y[:, same_y], rtol=rtol, atol=atol
    )


def test_frontoparallel_quad():
    index_img, uv_img, jac, mask = _pipeline(64, 64, tilt=0.0)
    assert bool(jnp.any(mask))
    _check_against_fd(index_img, uv_img, jac)
    # Background pixels are exactly zero.
    np.testing.assert_allclose(
        np.asarray(jac)[~np.asarray(mask)], 0.0
    )


def test_tilted_quad_perspective():
    # With depth tilt the Jacobian varies per pixel (perspective); the
    # analytic value is the instantaneous derivative, compare with central
    # differences for second-order accuracy.
    index_img, uv_img, jac, mask = _pipeline(96, 96, tilt=2.5)
    idx = np.asarray(index_img[0])
    uv = np.asarray(uv_img[0])
    j = np.asarray(jac[0])
    same = (idx[:, 2:] == idx[:, :-2]) & (idx[:, 1:-1] == idx[:, :-2]) & (
        idx[:, :-2] >= 0
    )
    fd_x = (uv[:, :, 2:] - uv[:, :, :-2]) / 2.0
    an_x = np.moveaxis(j[:, 1:-1, 0, :], -1, 0)
    np.testing.assert_allclose(
        an_x[:, same], fd_x[:, same], rtol=2e-2, atol=2e-4
    )


def test_feeds_mipmap_grid_sample():
    # End-to-end: the Jacobian drives mipmap level selection without NaNs.
    h = w = 48
    index_img, uv_img, jac, mask = _pipeline(h, w, tilt=1.0)
    uv = jnp.moveaxis(uv_img, 1, -1) * 2.0 - 1.0
    levels = [
        jnp.ones((1, 3, 32 >> i, 32 >> i), jnp.float32) for i in range(3)
    ]
    out = dt.mipmap_grid_sample(levels, uv, jac, max_aniso=4,
                                padding_mode="border")
    assert bool(jnp.all(jnp.isfinite(out)))
    # Constant white pyramid must sample to 1 everywhere in the foreground.
    fg = np.asarray(mask[0])
    np.testing.assert_allclose(
        np.asarray(out)[0, :, fg], 1.0, rtol=1e-5
    )
