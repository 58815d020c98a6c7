"""World-space -> pixel-space vertex transform (JAX port of
drtk/transform.py in facebookresearch/DRTK)."""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax.numpy as jnp

from drtk_tpu.utils.projection import project_points

__all__ = ["transform", "transform_with_v_cam"]


def transform(
    v: jnp.ndarray,
    campos: Optional[jnp.ndarray] = None,
    camrot: Optional[jnp.ndarray] = None,
    focal: Optional[jnp.ndarray] = None,
    princpt: Optional[jnp.ndarray] = None,
    K: Optional[jnp.ndarray] = None,
    Rt: Optional[jnp.ndarray] = None,
    distortion_mode: Optional[Union[List[str], str]] = None,
    distortion_coeff: Optional[jnp.ndarray] = None,
    fov: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Project 3D vertex positions onto the camera image plane
    (drtk/transform.py:14-65).

    Returns [N, V, 3]: (x_pix, y_pix, z_cam) — the mixed-unit space the
    rasterizer and edge-gradient normal math expect.
    """
    v_pix, _ = transform_with_v_cam(
        v, campos, camrot, focal, princpt, K, Rt,
        distortion_mode, distortion_coeff, fov,
    )
    return v_pix


def transform_with_v_cam(
    v: jnp.ndarray,
    campos: Optional[jnp.ndarray] = None,
    camrot: Optional[jnp.ndarray] = None,
    focal: Optional[jnp.ndarray] = None,
    princpt: Optional[jnp.ndarray] = None,
    K: Optional[jnp.ndarray] = None,
    Rt: Optional[jnp.ndarray] = None,
    distortion_mode: Optional[Union[List[str], str]] = None,
    distortion_coeff: Optional[jnp.ndarray] = None,
    fov: Optional[jnp.ndarray] = None,
    lut_vector_field: Optional[jnp.ndarray] = None,
    lut_spacing: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Same as :func:`transform` but also returns camera-space coordinates
    (drtk/transform.py:68-119)."""
    if not ((camrot is not None and campos is not None) ^ (Rt is not None)):
        raise ValueError("You must provide exactly one of Rt or (campos, camrot).")
    if not ((focal is not None and princpt is not None) ^ (K is not None)):
        raise ValueError("You must provide exactly one of K or (focal, princpt).")

    if campos is None:
        assert Rt is not None
        camrot = Rt[:, :3, :3]
        campos = -jnp.einsum("nji,njk->nik", camrot, Rt[:, :3, 3:4])[..., 0]

    if focal is None:
        assert K is not None
        focal = K[:, :2, :2]
        princpt = K[:, :2, 2]

    assert camrot is not None
    assert princpt is not None
    return project_points(
        v=v,
        campos=campos,
        camrot=camrot,
        focal=focal,
        princpt=princpt,
        distortion_mode=distortion_mode,
        distortion_coeff=distortion_coeff,
        fov=fov,
        lut_vector_field=lut_vector_field,
        lut_spacing=lut_spacing,
    )
