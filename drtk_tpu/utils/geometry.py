"""Mesh geometry helpers (JAX port of drtk/utils/geometry.py).

Pure jnp transcriptions of the reference's per-face Jacobians, scatter-add
vertex accumulation, and normal computations. Scatter-adds use
``.at[].add``, which XLA lowers to deterministic segment reductions on TPU.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from drtk_tpu.utils.indexing import index

__all__ = [
    "face_dpdt",
    "face_attribute_to_vert",
    "face_info",
    "vert_binormals",
    "vert_normals",
]

eps = 1e-8


def _safe_normalize(x: jnp.ndarray, axis: int = -1, eps_: float = 1e-12) -> jnp.ndarray:
    # Mirrors torch.nn.functional.normalize: x / max(||x||, eps).
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps_)


def face_dpdt(
    v: jnp.ndarray, vt: jnp.ndarray, vi: jnp.ndarray, vti: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Transposed per-face Jacobian (dp/dt)^T of position w.r.t. UV
    (geometry.py:18-82).

    Returns:
        dpdt_t: [N, F, 2, 3] with dpdt_t[..., i, j] = dp[..., j] / dt[..., i]
        v012:   [N, F, 3, 3] per-face vertex positions.
    """
    if v.ndim != 3:
        raise ValueError(f"Expected v to be 3D, got {v.ndim}D")
    if vt.ndim != 3:
        raise ValueError(f"Expected vt to be 3D, got {vt.ndim}D")
    if vt.shape[0] != v.shape[0]:
        raise ValueError(
            f"Expected vt to have the same batch size as v, got "
            f"{vt.shape[0]} and {v.shape[0]}"
        )

    v012 = v[:, vi]  # [N, F, 3, 3]
    vt012 = vt[:, vti]  # [N, F, 3, 2]

    dpdb_t = v012[:, :, 1:3] - v012[:, :, 0:1]  # [N, F, 2, 3]
    dtdb_t = vt012[:, :, 1:3] - vt012[:, :, 0:1]  # [N, F, 2, 2]

    dbdt_t = jnp.linalg.inv(dtdb_t)
    dpdt_t = dbdt_t @ dpdb_t
    return dpdt_t, v012


def face_attribute_to_vert(
    v: jnp.ndarray, vi: jnp.ndarray, attr: jnp.ndarray
) -> jnp.ndarray:
    """Scatter-add face attributes onto their vertices (geometry.py:85-121).

    v: [N, V, *]; vi: [F, 3] or [B, F, 3] (B in {1, N}); attr: [N, F, A]
    -> [N, V, A].
    """
    n = v.shape[0]
    num_v = v.shape[1]
    a = attr.shape[-1]
    # attr repeated for each corner: [N, F*3, A]
    attr3 = jnp.broadcast_to(
        attr[:, :, None], (attr.shape[0], attr.shape[1], 3, a)
    ).reshape(attr.shape[0], -1, a)

    if vi.ndim == 2:
        vi_flat = jnp.broadcast_to(vi.reshape(-1)[None], (n, vi.size))
    elif vi.ndim == 3:
        vi_flat = jnp.broadcast_to(
            vi.reshape(vi.shape[0], -1), (n, vi.shape[1] * 3)
        )
    else:
        raise ValueError(f"Expected vi to be 2D [F, 3] or 3D [B, F, 3], got {vi.ndim}D")

    def scatter_one(ids, vals):
        return jnp.zeros((num_v, a), v.dtype).at[ids].add(vals)

    return jax.vmap(scatter_one)(vi_flat, attr3.astype(v.dtype))


def face_info(
    v: jnp.ndarray, vi: jnp.ndarray, to_compute: Optional[List[str]] = None
) -> Union[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Per-face normals / edges / areas (geometry.py:124-187)."""
    if to_compute is None:
        to_compute = ["normals", "edges", "areas"]

    b = v.shape[0]
    vi = jnp.broadcast_to(vi, (b,) + vi.shape[-2:]) if vi.ndim == 3 else vi
    if vi.ndim == 2:
        vi = jnp.broadcast_to(vi[None], (b,) + vi.shape)

    p0 = jnp.stack([index(v[i], vi[i, :, 0], 0) for i in range(b)])
    p1 = jnp.stack([index(v[i], vi[i, :, 1], 0) for i in range(b)])
    p2 = jnp.stack([index(v[i], vi[i, :, 2], 0) for i in range(b)])
    v0 = p1 - p0
    v1 = p0 - p2

    output: Dict[str, jnp.ndarray] = {}
    need_normals = "normals" in to_compute
    need_areas = "areas" in to_compute
    need_edges = "edges" in to_compute

    if need_normals or need_areas:
        normals = jnp.cross(v1, v0)
        norm = jnp.linalg.norm(normals, axis=-1, keepdims=True)
        if need_areas:
            output["areas"] = 0.5 * norm
        if need_normals:
            output["normals"] = normals / jnp.maximum(norm, eps)

    if need_edges:
        v2 = p2 - p1
        output["edges"] = jnp.stack([v0, v1, v2], axis=2)

    if len(to_compute) == 1:
        return output[to_compute[0]]
    return output


def vert_binormals(
    v: jnp.ndarray, vt: jnp.ndarray, vi: jnp.ndarray, vti: jnp.ndarray
) -> jnp.ndarray:
    """Per-vertex binormals from the u-direction of (dp/dt)^T
    (geometry.py:189-197)."""
    dpdt_t, _ = face_dpdt(v, vt, vi, vti)
    fbnorms = dpdt_t[:, :, 0, :]
    vbnorms = face_attribute_to_vert(v, vi, fbnorms)
    return _safe_normalize(vbnorms)


def vert_normals(
    v: jnp.ndarray, vi: jnp.ndarray, fnorms: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Area-weighted vertex normals (geometry.py:200-223)."""
    if fnorms is None:
        fnorms = face_info(v, vi, ["normals"])
    vnorms = face_attribute_to_vert(v, vi, fnorms)
    return _safe_normalize(vnorms)
