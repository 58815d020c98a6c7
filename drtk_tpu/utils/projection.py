"""Camera projection and lens distortion models (pure jnp).

JAX port of the reference's camera math (`drtk/utils/projection.py` in
facebookresearch/DRTK): pinhole, OpenCV radial-tangential (4/5/8 parameter),
OpenCV fisheye, and Fisheye62 (incl. pixel-space LUT correction), plus the
numpy-polynomial FOV estimators and the analytic pinhole Jacobian-vector
product ``project_points_grad``.

All functions are shape-polymorphic over the batch (N) and vertex (V) dims and
differentiate through standard JAX autodiff (the reference relies on torch
autograd the same way).
"""

from __future__ import annotations

from typing import List, Optional, Set, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "DISTORTION_MODES",
    "project_points",
    "project_points_grad",
    "project_pinhole",
    "project_pinhole_distort_rt",
    "project_fisheye_distort",
    "project_fisheye_distort_62",
    "estimate_rt_fov",
    "estimate_fisheye_fov",
    "estimate_fisheye62_fov",
]

DISTORTION_MODES: Set[Optional[str]] = {
    None,
    "pinhole",
    "radial-tangential",
    "fisheye",
}

_FISHEYE62_MODES: Set[str] = {"fisheye62", "fisheye62_lut"}


def _any_mode_is_fisheye62(distortion_mode) -> bool:
    if isinstance(distortion_mode, (list, tuple)):
        return any(m in _FISHEYE62_MODES for m in distortion_mode)
    return distortion_mode in _FISHEYE62_MODES


def _signclamp(z: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """z away from zero preserving sign (projection.py:47 in the reference)."""
    return jnp.where(z < 0, jnp.minimum(z, -eps), jnp.maximum(z, eps))


def project_pinhole(
    v_cam: jnp.ndarray, focal: jnp.ndarray, princpt: jnp.ndarray
) -> jnp.ndarray:
    """Undistorted pinhole projection (projection.py:33-53).

    v_cam: [N, V, 3]; focal: [N, 2, 2]; princpt: [N, 2] -> [N, V, 2].
    """
    z = _signclamp(v_cam[:, :, 2:3])
    v_proj = v_cam[:, :, 0:2] / z
    return jnp.einsum("nij,nvj->nvi", focal, v_proj) + princpt[:, None]


def project_pinhole_distort_rt(
    v_cam: jnp.ndarray,
    focal: jnp.ndarray,
    princpt: jnp.ndarray,
    D: jnp.ndarray,
    fov: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """OpenCV radial-tangential distortion, 4/5/8 params
    (projection.py:56-135)."""
    if fov is None:
        fov = jax.lax.stop_gradient(estimate_rt_fov(D))

    z = _signclamp(v_cam[:, :, 2:3])
    v_proj = v_cam[:, :, :2] / z
    r2 = jnp.sum(v_proj**2, axis=-1)
    r2 = jnp.minimum(r2, fov**2)
    v_clamped = jnp.clip(v_proj, -fov[..., None], fov[..., None])

    assert D.shape[1] in (4, 5, 8)
    R = 1 + D[:, 0:1] * r2 + D[:, 1:2] * r2**2
    if D.shape[1] == 5:
        R = R + D[:, 4:5] * r2**3
    if D.shape[1] == 8:
        R = R + D[:, 4:5] * r2**3
        R = R / (1 + D[:, 5:6] * r2 + D[:, 6:7] * r2**2 + D[:, 7:8] * r2**3)

    v_dist = v_proj * R[..., None]
    v_dist = v_dist + (
        2
        * v_clamped[..., 0:1]
        * v_clamped[..., 1:2]
        * jnp.stack((D[:, 2:3], D[:, 3:4]), axis=-1)
    )
    v_dist = v_dist + r2[..., None] * jnp.stack((D[:, 3:4], D[:, 2:3]), axis=-1)
    v_dist = v_dist + jnp.stack(
        (
            2 * D[:, 3:4] * v_clamped[..., 0] ** 2,
            2 * D[:, 2:3] * v_clamped[..., 1] ** 2,
        ),
        axis=-1,
    )
    return jnp.einsum("nij,nvj->nvi", focal, v_dist) + princpt[:, None]


def project_fisheye_distort(
    v_cam: jnp.ndarray,
    focal: jnp.ndarray,
    princpt: jnp.ndarray,
    D: jnp.ndarray,
    fov: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """OpenCV fisheye distortion (projection.py:138-183)."""
    if fov is None:
        fov = jax.lax.stop_gradient(estimate_fisheye_fov(D))

    z = _signclamp(v_cam[:, :, 2:3])
    v_proj = v_cam[:, :, :2] / z
    r = jnp.sqrt(jnp.sum(v_proj**2, axis=-1))
    r = jnp.clip(r, 1e-8, fov)
    theta = jnp.arctan(r)
    theta_d = theta * (
        1
        + D[:, 0:1] * theta**2
        + D[:, 1:2] * theta**4
        + D[:, 2:3] * theta**6
        + D[:, 3:4] * theta**8
    )
    r = _signclamp(r)
    v_dist = v_proj * (theta_d / r)[..., None]
    return jnp.einsum("nij,nvj->nvi", focal, v_dist) + princpt[:, None]


def project_fisheye_distort_62(
    v_cam: jnp.ndarray,
    focal: jnp.ndarray,
    princpt: jnp.ndarray,
    D: jnp.ndarray,
    fov: Optional[jnp.ndarray] = None,
    lut_vector_field: Optional[jnp.ndarray] = None,
    lut_spacing: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fisheye62 model: six radial + two tangential coefficients, optional
    pixel-space LUT correction (projection.py:186-309)."""
    assert D.shape[1] == 8, f"Fisheye62 requires 8 distortion params: {D.shape}"
    if fov is None:
        fov = jax.lax.stop_gradient(estimate_fisheye_fov(D))

    z = _signclamp(v_cam[:, :, 2:3])
    v_proj = v_cam[:, :, :2] / z
    r = jnp.sqrt(jnp.sum(v_proj**2, axis=-1))
    r = jnp.clip(r, 1e-8, fov)
    theta = jnp.arctan(r)
    t2 = theta * theta

    k = [D[:, i : i + 1] for i in range(6)]
    p0, p1 = D[:, 6:7], D[:, 7:8]

    t3 = t2 * theta
    t5 = t2 * t3
    t7 = t2 * t5
    t9 = t2 * t7
    t11 = t2 * t9
    t13 = t2 * t11
    thetad = (
        theta + k[0] * t3 + k[1] * t5 + k[2] * t7 + k[3] * t9 + k[4] * t11 + k[5] * t13
    )

    r = _signclamp(r)
    v_dist = v_proj * (thetad / r)[..., None]
    v_dist = jnp.clip(v_dist, -fov[..., None], fov[..., None])

    x_r = v_dist[:, :, 0]
    y_r = v_dist[:, :, 1]
    r_rad2 = x_r * x_r + y_r * y_r
    x_t = (2 * x_r * x_r + r_rad2) * p0 + (2 * x_r * y_r) * p1
    y_t = (2 * x_r * y_r) * p0 + (2 * y_r * y_r + r_rad2) * p1
    v_dist = v_dist + jnp.stack([x_t, y_t], axis=-1)

    v_pix = jnp.einsum("nij,nvj->nvi", focal, v_dist) + princpt[:, None]

    if lut_vector_field is not None:
        assert lut_spacing is not None, (
            "lookup table spacing must be provided along with vector field"
        )
        from drtk_tpu.ops.grid_sample import grid_sample

        npos = v_pix / lut_spacing[:, None, :]
        lut_h, lut_w = lut_vector_field.shape[2:4]
        nx = npos[..., 0] / (lut_h - 1) * 2.0 - 1.0
        ny = npos[..., 1] / (lut_w - 1) * 2.0 - 1.0
        # NOTE: the reference normalizes x by (n_cols - 1) where
        # lut_col, lut_row = shape[2:4] — i.e. x by shape[2], y by shape[3]
        # (projection.py:283-292). Preserved verbatim.
        grid = jnp.stack([nx, ny], axis=-1)[:, None]  # [N, 1, V, 2]
        offset = grid_sample(lut_vector_field, grid, align_corners=True)
        offset = jnp.moveaxis(offset[:, :, 0], 1, -1)  # [N, V, 2]
        oob = (nx < -1) | (nx > 1) | (ny < -1) | (ny > 1)
        offset = jnp.where(oob[..., None], 0.0, offset)
        v_pix = v_pix + offset

    return v_pix


# --------------------------------------------------------------------------
# FOV estimators (host-side numpy root finding, like the reference)
# --------------------------------------------------------------------------


def estimate_rt_fov(D: "jnp.ndarray | np.ndarray") -> jnp.ndarray:
    """Smallest positive radius where the radial polynomial can stop being
    monotonic (projection.py:312-360). Host-side, not differentiable."""
    coefs = np.asarray(jax.device_get(D)).astype(np.float64)
    ones = np.ones_like(coefs[:, 0])
    zeros = np.zeros_like(coefs[:, 0])
    poly = np.stack([5 * coefs[:, 1], zeros, 3 * coefs[:, 0], zeros, ones], axis=-1)
    fov = []
    for coef in poly:
        roots = np.roots(coef)
        real = roots.real[abs(roots.imag) < 1e-5]
        pos = real[real > 0]
        fov.append(np.inf if len(pos) == 0 else pos.min())
    return jnp.asarray(np.asarray(fov, np.float32)[..., None])


def _solve_monotonic_fisheye_fov(poly: np.ndarray) -> jnp.ndarray:
    fov = []
    for coef in poly:
        roots = np.roots(coef)
        real = roots.real[abs(roots.imag) < 1e-5]
        pos = real[real > 0]
        fov.append(np.pi / 2 if len(pos) == 0 else min(pos.min(), np.pi / 2))
    return jnp.asarray(np.tan(np.asarray(fov)).astype(np.float32)[..., None])


def estimate_fisheye_fov(D: "jnp.ndarray | np.ndarray") -> jnp.ndarray:
    """tan(theta) at the first non-monotonic point of the fisheye polynomial,
    capped at pi/2 (projection.py:391-429)."""
    coefs = np.asarray(jax.device_get(D)).astype(np.float64)
    ones = np.ones_like(coefs[:, 0])
    zeros = np.zeros_like(coefs[:, 0])
    poly = np.stack(
        [
            9 * coefs[:, 3],
            zeros,
            7 * coefs[:, 2],
            zeros,
            5 * coefs[:, 1],
            zeros,
            3 * coefs[:, 0],
            zeros,
            ones,
        ],
        axis=-1,
    )
    return _solve_monotonic_fisheye_fov(poly)


def estimate_fisheye62_fov(D: "jnp.ndarray | np.ndarray") -> jnp.ndarray:
    """Fisheye62 variant including the k4/k5 tail (projection.py:432-482)."""
    coefs = np.asarray(jax.device_get(D)).astype(np.float64)
    assert coefs.shape[-1] >= 6
    ones = np.ones_like(coefs[:, 0])
    zeros = np.zeros_like(coefs[:, 0])
    poly = np.stack(
        [
            13 * coefs[:, 5],
            zeros,
            11 * coefs[:, 4],
            zeros,
            9 * coefs[:, 3],
            zeros,
            7 * coefs[:, 2],
            zeros,
            5 * coefs[:, 1],
            zeros,
            3 * coefs[:, 0],
            zeros,
            ones,
        ],
        axis=-1,
    )
    return _solve_monotonic_fisheye_fov(poly)


# --------------------------------------------------------------------------
# Top-level dispatchers
# --------------------------------------------------------------------------


def project_points(
    v: jnp.ndarray,
    campos: jnp.ndarray,
    camrot: jnp.ndarray,
    focal: jnp.ndarray,
    princpt: jnp.ndarray,
    distortion_mode: Optional[Union[List[str], str]] = None,
    distortion_coeff: Optional[jnp.ndarray] = None,
    fov: Optional[jnp.ndarray] = None,
    lut_vector_field: Optional[jnp.ndarray] = None,
    lut_spacing: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project world-space vertices to DRTK pixel coordinates
    (projection.py:485-646).

    Returns ``(v_pix, v_cam)``; ``v_pix`` stores (x_pix, y_pix, z_cam).
    Per-batch mixed-mode lists are supported for pinhole/rt/fisheye; for
    Fisheye62 with ``fov``, out-of-FOV vertices get z = -1 so the rasterizer
    near-plane check culls any touching triangle.
    """
    if distortion_mode is not None:
        assert distortion_coeff is not None, "Missing distortion coefficients."

    v_cam = jnp.einsum("nij,nvj->nvi", camrot, v - campos[:, None])

    if isinstance(distortion_mode, (list, tuple)):
        modes = list(set(distortion_mode))
        if len(modes) == 0:
            distortion_mode = None
        elif len(modes) == 1:
            distortion_mode = modes[0]

    if distortion_mode is None or distortion_mode == "pinhole":
        v_pix = project_pinhole(v_cam, focal, princpt)
    elif isinstance(distortion_mode, str):
        assert distortion_coeff is not None
        if distortion_mode == "radial-tangential":
            v_pix = project_pinhole_distort_rt(
                v_cam, focal, princpt, distortion_coeff, fov
            )
        elif distortion_mode == "fisheye":
            v_pix = project_fisheye_distort(v_cam, focal, princpt, distortion_coeff, fov)
        elif distortion_mode in _FISHEYE62_MODES:
            v_pix = project_fisheye_distort_62(
                v_cam, focal, princpt, distortion_coeff, fov,
                lut_vector_field, lut_spacing,
            )
        else:
            raise ValueError(
                f"Invalid distortion mode: {distortion_mode}. "
                f"Valid options: {DISTORTION_MODES}."
            )
    elif isinstance(distortion_mode, (list, tuple)):
        assert distortion_coeff is not None
        modes = set(distortion_mode)
        if not modes <= DISTORTION_MODES:
            raise ValueError(
                f"Invalid distortion mode: {distortion_mode}. "
                f"Valid options: {DISTORTION_MODES}."
            )
        # Per-batch mixed modes: compute each submodel on its batch rows.
        # (Boolean masks over the batch dim are host-static: modes is a
        # Python list.)
        v_pix = jnp.zeros_like(v_cam[..., :2])

        def rows(pred):
            return np.asarray([pred(m) for m in distortion_mode])

        sel = rows(lambda m: m is None or m == "pinhole")
        if sel.any():
            v_pix = v_pix.at[sel].set(
                project_pinhole(v_cam[sel], focal[sel], princpt[sel])
            )
        sel = rows(lambda m: m == "radial-tangential")
        if sel.any():
            v_pix = v_pix.at[sel].set(
                project_pinhole_distort_rt(
                    v_cam[sel], focal[sel], princpt[sel], distortion_coeff[sel],
                    fov[sel] if fov is not None else None,
                )
            )
        sel = rows(lambda m: m == "fisheye")
        if sel.any():
            v_pix = v_pix.at[sel].set(
                project_fisheye_distort(
                    v_cam[sel], focal[sel], princpt[sel], distortion_coeff[sel],
                    fov[sel] if fov is not None else None,
                )
            )
    else:
        raise ValueError(
            f"Invalid distortion mode: {distortion_mode}. "
            f"Valid options: {DISTORTION_MODES}."
        )

    z_cam = v_cam[:, :, 2:3]
    if fov is not None and _any_mode_is_fisheye62(distortion_mode):
        z_safe = jnp.where(jnp.abs(z_cam) < 1e-8, _signclamp(z_cam), z_cam)
        r_raw = jnp.sqrt(
            jnp.sum((v_cam[:, :, :2] / z_safe) ** 2, axis=-1, keepdims=True)
        )
        outside = r_raw > fov.reshape(-1, 1, 1)
        if isinstance(distortion_mode, (list, tuple)):
            fisheye_mask = jnp.asarray(
                [m in _FISHEYE62_MODES for m in distortion_mode]
            ).reshape(-1, 1, 1)
            outside = outside & fisheye_mask
        z_cam = jnp.where(outside, -1.0, z_cam)

    v_pix = jnp.concatenate((v_pix[:, :, 0:2], z_cam), axis=-1)
    return v_pix, v_cam


def project_points_grad(
    v_grad: jnp.ndarray,
    v: jnp.ndarray,
    campos: jnp.ndarray,
    camrot: jnp.ndarray,
    focal: jnp.ndarray,
    distortion_mode: Optional[Union[List[str], str]] = None,
    distortion_coeff: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Analytic pinhole Jacobian-vector product (projection.py:649-706):
    ``d project_points(v)/dv @ v_grad`` for the undistorted path."""
    if distortion_mode is not None:
        assert distortion_coeff is not None, "Missing distortion coefficients."

    v_cam_grad = jnp.einsum("nij,nvj->nvi", camrot, v_grad)
    v_cam = jnp.einsum("nij,nvj->nvi", camrot, v - campos[:, None])

    if distortion_mode is None:
        z = _signclamp(v_cam[:, :, 2:3])
        z_grad = v_cam_grad[:, :, 2:3]
        v_proj_grad = (v_cam_grad[:, :, 0:2] * z - v_cam[:, :, 0:2] * z_grad) / z**2
        return jnp.einsum("nij,nvj->nvi", focal, v_proj_grad)
    raise NotImplementedError(
        f"project_points_grad: distortion mode {distortion_mode} not implemented"
    )
