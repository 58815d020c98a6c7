"""Camera transform / projection / geometry utility tests."""

import jax
import jax.numpy as jnp
import numpy as np

import drtk_tpu as dt
from drtk_tpu.utils import (
    face_info,
    project_points,
    project_points_grad,
    vert_normals,
)
from drtk_tpu.utils.projection import (
    estimate_fisheye_fov,
    estimate_rt_fov,
    project_fisheye_distort,
    project_pinhole_distort_rt,
)

from .utils import assert_allclose


def _camera(n=1):
    campos = jnp.array([[0.0, 0.0, -5.0]] * n)
    camrot = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))
    focal = jnp.broadcast_to(jnp.diag(jnp.array([200.0, 200.0])), (n, 2, 2))
    princpt = jnp.array([[32.0, 32.0]] * n)
    return campos, camrot, focal, princpt


def test_pinhole_projection_center():
    campos, camrot, focal, princpt = _camera()
    v = jnp.array([[[0.0, 0.0, 0.0], [1.0, 0.5, 0.0]]])
    v_pix = dt.transform(v, campos, camrot, focal, princpt)
    # point on the optical axis projects to the principal point; z = z_cam
    assert_allclose(v_pix[0, 0], jnp.array([32.0, 32.0, 5.0]), rtol=1e-6)
    assert_allclose(
        v_pix[0, 1], jnp.array([32.0 + 200.0 / 5.0, 32.0 + 100.0 / 5.0, 5.0]),
        rtol=1e-6,
    )


def test_K_Rt_equivalent_to_parts():
    campos, camrot, focal, princpt = _camera()
    v = jax.random.normal(jax.random.PRNGKey(0), (1, 10, 3))
    K = jnp.zeros((1, 3, 3)).at[:, :2, :2].set(focal).at[:, :2, 2].set(princpt)
    K = K.at[:, 2, 2].set(1.0)
    t = -jnp.einsum("nij,nj->ni", camrot, campos)
    Rt = jnp.concatenate([camrot, t[..., None]], axis=-1)
    a = dt.transform(v, campos, camrot, focal, princpt)
    b = dt.transform(v, K=K, Rt=Rt)
    assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_transform_requires_exactly_one_parametrization():
    campos, camrot, focal, princpt = _camera()
    v = jnp.zeros((1, 2, 3))
    try:
        dt.transform(v, campos, camrot, focal, princpt,
                     K=jnp.eye(3)[None])
        assert False
    except ValueError:
        pass


def test_project_points_grad_matches_jvp():
    campos, camrot, focal, princpt = _camera()
    key = jax.random.PRNGKey(1)
    v = jax.random.normal(key, (1, 20, 3))
    dv = jax.random.normal(jax.random.PRNGKey(2), (1, 20, 3))

    def f(v):
        v_pix, _ = project_points(v, campos, camrot, focal, princpt)
        return v_pix[..., :2]

    _, jvp = jax.jvp(f, (v,), (dv,))
    analytic = project_points_grad(dv, v, campos, camrot, focal)
    assert_allclose(analytic, jvp, rtol=1e-5, atol=1e-5)


def test_distortion_zero_coeff_equals_pinhole():
    campos, camrot, focal, princpt = _camera()
    v = jax.random.normal(jax.random.PRNGKey(1), (1, 30, 3)) * 0.3
    v_cam = v - campos[:, None]
    pin = dt.transform(v, campos, camrot, focal, princpt)

    d_rt = jnp.zeros((1, 4))
    rt = project_pinhole_distort_rt(v_cam, focal, princpt, d_rt)
    assert_allclose(rt, pin[..., :2], rtol=1e-4, atol=1e-4)

    # fisheye with zero coeffs: theta_d = atan(r) != r, so it's NOT pinhole —
    # just check it runs and is finite.
    d_fe = jnp.zeros((1, 4))
    fe = project_fisheye_distort(v_cam, focal, princpt, d_fe)
    assert bool(jnp.isfinite(fe).all())


def test_fov_estimators():
    # Zero distortion -> monotonic everywhere -> rt fov inf, fisheye tan(pi/2)
    d = np.zeros((2, 4), np.float32)
    fov_rt = np.asarray(estimate_rt_fov(d))
    assert np.isinf(fov_rt).all()
    fov_fe = np.asarray(estimate_fisheye_fov(d))
    assert (fov_fe > 1e3).all()  # tan(pi/2-) is huge

    # A strongly negative k1 gives a finite rt fov
    d = np.array([[-0.5, 0.0, 0.0, 0.0]], np.float32)
    fov = float(estimate_rt_fov(d)[0, 0])
    assert np.isfinite(fov) and fov > 0


def test_mixed_mode_batches():
    n = 3
    campos, camrot, focal, princpt = _camera(n)
    v = jax.random.normal(jax.random.PRNGKey(3), (n, 10, 3)) * 0.3
    coeff = jnp.zeros((n, 4))
    v_pix, _ = project_points(
        v, campos, camrot, focal, princpt,
        distortion_mode=["pinhole", "radial-tangential", "fisheye"],
        distortion_coeff=coeff,
    )
    ref_pin, _ = project_points(v, campos, camrot, focal, princpt)
    assert_allclose(v_pix[0], ref_pin[0], rtol=1e-5, atol=1e-5)
    assert_allclose(v_pix[1, :, :2], ref_pin[1, :, :2], rtol=1e-4, atol=1e-4)
    assert bool(jnp.isfinite(v_pix).all())


def test_vert_normals_flat_grid():
    # A flat z=const grid: all vertex normals must be (0, 0, ±1).
    from .utils import grid_mesh

    v, vi = grid_mesh(z_amp=0.0)
    n = vert_normals(v, vi)
    assert_allclose(jnp.abs(n[..., 2]), jnp.ones_like(n[..., 2]), rtol=1e-5)
    assert_allclose(n[..., :2], jnp.zeros_like(n[..., :2]), atol=1e-6)


def test_face_info_areas():
    v = jnp.array([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
    vi = jnp.array([[0, 1, 2]], jnp.int32)
    info = face_info(v, vi)
    assert_allclose(info["areas"][0, 0], jnp.array([0.5]), rtol=1e-6)
    assert_allclose(jnp.abs(info["normals"][0, 0, 2]), 1.0, rtol=1e-6)
    assert info["edges"].shape == (1, 1, 3, 3)


def test_face_dpdt_identity_uv():
    # If uv == xy of the verts, dp/dt should be identity in the xy block.
    v = jnp.array([[[0.0, 0.0, 1.0], [1.0, 0.0, 1.0], [0.0, 1.0, 1.0]]])
    vt = v[..., :2]
    vi = jnp.array([[0, 1, 2]], jnp.int32)
    from drtk_tpu.utils import face_dpdt

    dpdt_t, v012 = face_dpdt(v, vt, vi, vi)
    assert_allclose(dpdt_t[0, 0, :, :2], jnp.eye(2), atol=1e-6)
    assert v012.shape == (1, 1, 3, 3)
