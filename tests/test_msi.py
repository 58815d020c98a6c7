"""Tests for drtk_tpu.ops.msi against an independent numpy raymarcher."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drtk_tpu.ops.msi import msi


def _cubic_coeffs_np(t, a=-0.75):
    t2, t3 = t * t, t * t * t
    return (
        a * (t3 - 2 * t2 + t),
        (a + 2) * t3 - (a + 3) * t2 + 1,
        -(a + 2) * t3 + (2 * a + 3) * t2 - a * t,
        a * (t2 - t3),
    )


def _sample_np(tex, u, v, w):
    l_cnt, c, h, wid = tex.shape

    def unnorm(coord, size):
        return np.clip(((coord + 1.0) * size - 1.0) / 2.0, 0.0, size - 1.0)

    x, y, z = unnorm(u, wid), unnorm(v, h), unnorm(w, l_cnt)
    ix, iy, iz = int(np.floor(x)), int(np.floor(y)), int(np.floor(z))
    tx, ty, tz = x - ix, y - iy, z - iz
    ix1, iy1 = min(ix + 1, wid - 1), min(iy + 1, h - 1)
    wts = [
        (iy, ix, (1 - tx) * (1 - ty)),
        (iy, ix1, tx * (1 - ty)),
        (iy1, ix, (1 - tx) * ty),
        (iy1, ix1, tx * ty),
    ]
    cz = _cubic_coeffs_np(tz)
    out = np.zeros(c)
    for i in range(4):
        lz = int(np.clip(iz - 1 + i, 0, l_cnt - 1))
        plane = sum(wt * tex[lz, :, yy, xx] for yy, xx, wt in wts)
        out += plane * cz[i]
    return out


def msi_numpy(ray_o, ray_d, tex, sub_step_count=2, min_inv_r=1.0,
              max_inv_r=0.0, stop_thresh=1e-7):
    """Scalar-loop port of msi_forward_kernel (msi_kernel.cu:208-293)."""
    n_layers = tex.shape[0]
    n_steps = n_layers * sub_step_count
    out = np.zeros((ray_o.shape[0], 4), np.float64)
    for ri in range(ray_o.shape[0]):
        o = ray_o[ri].astype(np.float64)
        d = ray_d[ri].astype(np.float64)
        d = d / np.linalg.norm(d)
        tc = np.dot(-o, d)
        h2 = np.dot(o, o) - tc * tc
        step_size = 1.0 / n_steps
        rgb = np.zeros(3)
        log_t = 0.0
        for i in range(n_steps):
            a = (n_steps - 1 - i + 0.5) / n_steps
            inv_r = (1 - a) * max_inv_r + a * min_inv_r
            r = 1.0 / inv_r
            det = r * r - h2
            if det < 0:
                continue
            t = tc + np.sqrt(det)
            pos = o + t * d
            lon = np.arctan2(pos[2], pos[0])
            lat = np.arctan2(pos[1], np.hypot(pos[0], pos[2]))
            u, v = lon / np.pi, 2 * lat / np.pi
            w = 1 - 2 * a
            s = _sample_np(tex, u, v, w)
            alpha = s[3]
            if alpha > 0:
                pcnt = alpha * step_size
                weight = np.exp(log_t) * (1 - np.exp(-pcnt))
                log_t -= pcnt
                rgb += weight * np.maximum(s[:3], 0)
                if np.exp(log_t) < stop_thresh:
                    log_t = -1e3
                    break
        out[ri, :3] = rgb
        out[ri, 3] = log_t
    return out


def make_rays(n=24, seed=0):
    rng = np.random.RandomState(seed)
    ray_o = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    ray_d = rng.randn(n, 3).astype(np.float32)
    return ray_o, ray_d


def make_texture(l=4, h=8, w=16, seed=1, sigma_scale=3.0):
    rng = np.random.RandomState(seed)
    tex = rng.rand(l, 4, h, w).astype(np.float32)
    tex[:, 3] *= sigma_scale
    return tex


@pytest.mark.parametrize("sub_step_count", [1, 2, 3])
def test_matches_numpy(sub_step_count):
    ray_o, ray_d = make_rays()
    tex = make_texture()
    out = msi(jnp.asarray(ray_o), jnp.asarray(ray_d), jnp.asarray(tex),
              sub_step_count=sub_step_count)
    ref = msi_numpy(ray_o, ray_d, tex, sub_step_count=sub_step_count)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_finite_radius_shells():
    ray_o, ray_d = make_rays(seed=3)
    tex = make_texture(l=3)
    out = msi(jnp.asarray(ray_o), jnp.asarray(ray_d), jnp.asarray(tex),
              min_inv_r=0.8, max_inv_r=0.1)
    ref = msi_numpy(ray_o, ray_d, tex, min_inv_r=0.8, max_inv_r=0.1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_ray_outside_spheres_misses():
    # Origin far outside the largest shell, pointing away: no intersections
    # with det >= 0 at t > 0 still composite per the kernel's math; verify
    # against numpy rather than asserting zeros.
    ray_o = np.array([[5.0, 0.0, 0.0]], np.float32)
    ray_d = np.array([[1.0, 0.0, 0.0]], np.float32)
    tex = make_texture(l=2)
    out = msi(jnp.asarray(ray_o), jnp.asarray(ray_d), jnp.asarray(tex),
              min_inv_r=1.0, max_inv_r=0.5)
    ref = msi_numpy(ray_o, ray_d, tex, min_inv_r=1.0, max_inv_r=0.5)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_early_termination():
    ray_o, ray_d = make_rays(n=8, seed=4)
    tex = make_texture(l=6, sigma_scale=4000.0)  # opaque: forces early stop
    out = np.asarray(
        msi(jnp.asarray(ray_o), jnp.asarray(ray_d), jnp.asarray(tex))
    )
    ref = msi_numpy(ray_o, ray_d, tex)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    assert np.any(out[:, 3] == -1e3), "expected early-terminated rays"


def test_texture_gradient_finite_differences():
    ray_o, ray_d = make_rays(n=6, seed=5)
    tex = jnp.asarray(make_texture(l=3, h=4, w=8, sigma_scale=1.5),
                      jnp.float64)
    ro, rd = jnp.asarray(ray_o), jnp.asarray(ray_d)

    def f(t):
        return jnp.sum(msi(ro, rd, t) ** 2)

    g = jax.grad(f)(tex)
    rng = np.random.RandomState(0)
    eps = 1e-6
    for _ in range(4):
        d = rng.randn(*tex.shape)
        d = jnp.asarray(d / np.linalg.norm(d))
        fd = (f(tex + eps * d) - f(tex - eps * d)) / (2 * eps)
        np.testing.assert_allclose(jnp.sum(g * d), fd, rtol=2e-4, atol=1e-8)


def test_no_gradient_to_rays():
    ray_o, ray_d = make_rays(n=4)
    tex = jnp.asarray(make_texture())
    g_o, g_d = jax.grad(
        lambda o, d: jnp.sum(msi(o, d, tex) ** 2), argnums=(0, 1)
    )(jnp.asarray(ray_o), jnp.asarray(ray_d))
    np.testing.assert_allclose(g_o, 0.0)
    np.testing.assert_allclose(g_d, 0.0)


def test_validation():
    tex = jnp.zeros((2, 4, 4, 8))
    rays = jnp.zeros((3, 3))
    with pytest.raises(ValueError):
        msi(jnp.zeros((3, 2)), rays, tex)
    with pytest.raises(ValueError):
        msi(rays, jnp.zeros((4, 3)), tex)
    with pytest.raises(ValueError):
        msi(rays, rays, jnp.zeros((2, 3, 4, 8)))
    with pytest.raises(ValueError):
        msi(rays, rays, tex, sub_step_count=0)
