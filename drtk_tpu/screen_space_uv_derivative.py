"""Per-pixel screen-space UV Jacobian for mipmap sampling.

JAX port of the reference's ``drtk/screen_space_uv_derivative.py``: computes
``vt_dxdy_img`` — an [N, H, W, 2, 2] image of Jacobians
``[[du/dx, dv/dx], [du/dy, dv/dy]]`` of the uv field w.r.t. pixel position,
the quantity :func:`drtk_tpu.mipmap_grid_sample` consumes.

Method (screen_space_uv_derivative.py:36-79 in the reference):
  1. per-face (dp/dt)^T from :func:`drtk_tpu.utils.face_dpdt`;
  2. interpolate it per pixel with a *discontinuous* synthetic index list
     ``vi_dis = arange(3F)`` so face-constant values never blend across
     faces (:46-52);
  3. push through the analytic projection JVP
     :func:`drtk_tpu.utils.project_points_grad` to get (d p_pix / dt)^T;
  4. invert the 2x2 per pixel; zero out masked pixels.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from drtk_tpu.ops.interpolate import interpolate
from drtk_tpu.utils.geometry import face_dpdt
from drtk_tpu.utils.projection import project_points_grad

__all__ = ["screen_space_uv_derivative"]


def _inv_2x2(m: jnp.ndarray) -> jnp.ndarray:
    """Batched 2x2 inverse; singular matrices yield zeros (the reference's
    ``inv_ex`` leaves them undefined and relies on the caller mask — zeros
    are a strictly safer superset of that contract)."""
    a = m[..., 0, 0]
    b = m[..., 0, 1]
    c = m[..., 1, 0]
    d = m[..., 1, 1]
    det = a * d - b * c
    safe = jnp.where(det == 0, 1.0, det)
    inv = jnp.stack(
        [
            jnp.stack([d, -b], axis=-1),
            jnp.stack([-c, a], axis=-1),
        ],
        axis=-2,
    ) / safe[..., None, None]
    return jnp.where((det == 0)[..., None, None], 0.0, inv)


def screen_space_uv_derivative(
    v: jnp.ndarray,
    vt: jnp.ndarray,
    vi: jnp.ndarray,
    vti: jnp.ndarray,
    index_img: jnp.ndarray,
    bary_img: jnp.ndarray,
    mask: jnp.ndarray,
    campos: jnp.ndarray,
    camrot: jnp.ndarray,
    focal: jnp.ndarray,
    dist_mode: Optional[Sequence[str]] = None,
    dist_coeff: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Compute the per-pixel uv Jacobian w.r.t. pixel position.

    Args:
        v: [N, V, 3] world-space vertex positions.
        vt: [N, Vt, 2] uv coordinates.
        vi / vti: [F, 3] int32 position / uv topology.
        index_img: [N, H, W] rasterized triangle indices.
        bary_img: [N, 3, H, W] barycentrics.
        mask: [N, H, W] bool foreground mask.
        campos/camrot/focal: camera parameters as in
            :func:`drtk_tpu.utils.project_points`.
        dist_mode/dist_coeff: optional distortion (pinhole JVP only, like the
            reference's ``project_points_grad``).

    Returns:
        [N, H, W, 2, 2] ``vt_dxdy_img``; zeros at masked pixels.
    """
    n = v.shape[0]
    f_cnt = vi.shape[-2]

    dpdt_t, vf = face_dpdt(v, vt, vi, vti)  # [N,F,2,3], [N,F,3,3]

    # Face-constant Jacobian replicated per corner; discontinuous topology
    # prevents cross-face blending (reference :42-47).
    dpdt3 = jnp.broadcast_to(
        dpdt_t[:, :, None], (n, f_cnt, 3) + dpdt_t.shape[-2:]
    )
    vi_dis = jnp.arange(3 * f_cnt, dtype=jnp.int32).reshape(-1, 3)

    dpdt_img = interpolate(
        dpdt3.reshape(n, f_cnt * 3, 6), vi_dis, index_img, bary_img
    )  # [N, 6, H, W]
    dpdt_img = jnp.moveaxis(dpdt_img, 1, -1)  # [N, H, W, 6]
    h, w = dpdt_img.shape[1:3]
    dpdt_img = dpdt_img.reshape(n, h, w, 2, 3)

    vf_img = interpolate(
        vf.reshape(n, f_cnt * 3, 3), vi_dis, index_img, bary_img
    )
    vf_img = jnp.moveaxis(vf_img, 1, -1)  # [N, H, W, 3]
    # Duplicate the surface position for the u and v directions.
    vf2_img = jnp.broadcast_to(vf_img[:, :, :, None], (n, h, w, 2, 3))

    dp_pix_dt_t = project_points_grad(
        dpdt_img.reshape(n, -1, 3),
        vf2_img.reshape(n, -1, 3),
        campos,
        camrot,
        focal,
        dist_mode,
        dist_coeff,
    ).reshape(n, h, w, 2, 2)

    vt_dxdy_img = _inv_2x2(dp_pix_dt_t)
    return jnp.where(mask[..., None, None], vt_dxdy_img, 0.0)
