"""Depth + perspective-correct barycentric rendering with a custom VJP.

TPU-native equivalent of the reference's ``render_ext``
(`src/render/render_kernel.cu` in facebookresearch/DRTK):

* Forward (render_kernel.cu:21-117): per pixel, gather the three vertices of
  the triangle in ``index_img``, recompute 2-D barycentrics from edge cross
  products, convert to perspective-correct 3-D barycentrics
  ``bary_3D_i = (1/z_i) * lambda_i * depth`` with
  ``depth = 1 / epsclamp(sum_i lambda_i / z_i)``. Background pixels
  (index -1) output zeros.

* Backward (render_kernel.cu:121-281): hand-derived VJP to vertex x, y, z with
  **clamp-aware gradient zeroing** — every ``epsclamp`` site records whether
  clamping occurred and kills that gradient path. The CUDA ``fastAtomicAdd``
  per-vertex accumulation becomes a batched segment-sum scatter-add, which XLA
  lowers without atomics.

On TPU the forward/backward are pure gather + elementwise passes that XLA
fuses; there is no benefit to a handwritten Mosaic kernel for this op (the
cost is HBM-bound gathers), so this op is plain XLA by design.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from drtk_tpu.ops.math import autocast_f32, epsclamp, psum_cotangent
from drtk_tpu.ops.rasterize import broadcast_vi

__all__ = ["render", "render_ref"]


def _gather_face_verts(
    v: jnp.ndarray, vi: jnp.ndarray, index_img: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel triangle vertices.

    Returns (pix_verts [N, H, W, 3(corner), 3(xyz)], mask [N, H, W]).

    TPU note: the per-pixel step is ONE padded row gather of 16 floats per
    pixel — row gathers are ~2x faster than the equivalent scalar/small
    gathers on TPU, and the row scatter in the VJP is likewise one
    contiguous scatter into the face table before the cheap face->vertex
    reduction.
    """
    n, h, w = index_img.shape
    mask = index_img >= 0
    # Two-level gather: faces first (small), then one binned-matmul row
    # fetch per pixel (segment_rows.gather_rows_by_index — bit-exact,
    # ~4x the throughput of the XLA element-rate gather at 1024^2).
    # Background pixels read all-zero rows; every consumer of pix_verts
    # masks its outputs with ``mask``, so only the (finite, epsclamped)
    # intermediates change there.
    from drtk_tpu.ops.segment_rows import gather_rows_by_index

    face_verts = jax.vmap(lambda vb, vib: vb[vib])(v, vi)  # [N, F, 3, 3]
    rows = gather_rows_by_index(
        face_verts.reshape(n, -1, 9), index_img,
        interpret=jax.devices()[0].platform != "tpu",
    )  # [N, H, W, 9] (f64 tables take the dtype-preserving plain path)
    pix_verts = rows.reshape(n, h, w, 3, 3)
    return pix_verts, mask


def _render_fwd_math(v, vi, index_img, y_offset=0):
    dtype = v.dtype
    n, h, w = index_img.shape
    pix_verts, mask = _gather_face_verts(v, vi, index_img)

    p0 = pix_verts[..., 0, :2]
    p1 = pix_verts[..., 1, :2]
    p2 = pix_verts[..., 2, :2]
    z = pix_verts[..., 2]  # [N, H, W, 3]

    v01 = p1 - p0
    v02 = p2 - p0
    den_raw = v01[..., 0] * v02[..., 1] - v01[..., 1] * v02[..., 0]
    den = epsclamp(den_raw)

    px = jnp.arange(w, dtype=dtype)[None, None, :]
    py = (jnp.arange(h) + y_offset).astype(dtype)[None, :, None]
    vp0p_x = px - p0[..., 0]
    vp0p_y = py - p0[..., 1]

    b1 = (vp0p_x * v02[..., 1] - vp0p_y * v02[..., 0]) / den
    b2 = (vp0p_y * v01[..., 0] - vp0p_x * v01[..., 1]) / den
    b0 = 1.0 - b1 - b2
    bary = jnp.stack([b0, b1, b2], axis=-1)  # [N, H, W, 3]

    z_eps = epsclamp(z)
    d_inv = 1.0 / z_eps
    depth_inv_raw = jnp.sum(d_inv * bary, axis=-1)
    depth_inv = epsclamp(depth_inv_raw)
    depth = 1.0 / depth_inv

    bary_3d = d_inv * bary * depth[..., None]

    maskf = mask.astype(dtype)
    depth_img = depth * maskf
    bary_img = jnp.moveaxis(bary_3d * maskf[..., None], -1, 1)  # [N, 3, H, W]
    return depth_img, bary_img


@jax.custom_vjp
def _render_core(v, vi, index_img, y_offset):
    return _render_fwd_math(v, vi, index_img, y_offset)


def _render_core_fwd(v, vi, index_img, y_offset):
    out = _render_fwd_math(v, vi, index_img, y_offset)
    return out, (v, vi, index_img, y_offset)


def _render_core_bwd(res, grads):
    """Mirrors render_backward_kernel (render_kernel.cu:121-281)."""
    v, vi, index_img, y_offset = res
    grad_depth_img, grad_bary_img = grads
    dtype = v.dtype
    n, h, w = index_img.shape

    pix_verts, mask = _gather_face_verts(v, vi, index_img)
    p0 = pix_verts[..., 0, :2]
    p1 = pix_verts[..., 1, :2]
    p2 = pix_verts[..., 2, :2]
    z = pix_verts[..., 2]

    v01 = p1 - p0
    v02 = p2 - p0
    den_raw = v01[..., 0] * v02[..., 1] - v01[..., 1] * v02[..., 0]
    den = epsclamp(den_raw)
    den_clamped = den != den_raw

    px = jnp.arange(w, dtype=dtype)[None, None, :]
    py = (jnp.arange(h) + y_offset).astype(dtype)[None, :, None]
    vp0p_x = px - p0[..., 0]
    vp0p_y = py - p0[..., 1]

    b12_pre = jnp.stack(
        [
            vp0p_x * v02[..., 1] - vp0p_y * v02[..., 0],
            vp0p_y * v01[..., 0] - vp0p_x * v01[..., 1],
        ],
        axis=-1,
    )
    b12 = b12_pre / den[..., None]
    bary = jnp.stack([1.0 - b12[..., 0] - b12[..., 1], b12[..., 0], b12[..., 1]], -1)

    z_eps = epsclamp(z)
    z_clamped = z_eps != z
    d_inv = 1.0 / z_eps

    depth_inv_raw = jnp.sum(d_inv * bary, axis=-1)
    depth_inv = epsclamp(depth_inv_raw)
    depth_inv_clamped = depth_inv != depth_inv_raw
    depth = 1.0 / depth_inv

    dL_bary3d = jnp.moveaxis(grad_bary_img, 1, -1)  # [N, H, W, 3]
    # dL_depth includes the contribution through bary_3D = d_inv*bary*depth
    # (render_kernel.cu:226).
    dL_depth = grad_depth_img + jnp.sum(dL_bary3d * d_inv * bary, axis=-1)
    dL_depth_inv = jnp.where(
        depth_inv_clamped,
        jnp.zeros_like(dL_depth),
        -dL_depth / (depth_inv_raw * depth_inv_raw),
    )
    dL_d_inv = dL_bary3d * bary * depth[..., None] + dL_depth_inv[..., None] * bary
    dL_z = -dL_d_inv / (z_eps * z_eps)
    dL_z = jnp.where(z_clamped, jnp.zeros_like(dL_z), dL_z)

    dL_bary = dL_bary3d * d_inv * depth[..., None] + dL_depth_inv[..., None] * d_inv
    dL_b12 = jnp.stack(
        [
            -dL_bary[..., 0] + dL_bary[..., 1],
            -dL_bary[..., 0] + dL_bary[..., 2],
        ],
        axis=-1,
    )
    dL_b_pre = dL_b12 / den[..., None]
    dL_den = jnp.where(
        den_clamped,
        jnp.zeros_like(den),
        -jnp.sum(dL_b_pre * b12, axis=-1),
    )

    dL_vp0p_x = dL_b_pre[..., 0] * v02[..., 1] - dL_b_pre[..., 1] * v01[..., 1]
    dL_vp0p_y = -dL_b_pre[..., 0] * v02[..., 0] + dL_b_pre[..., 1] * v01[..., 0]

    dL_v02 = jnp.stack(
        [
            -dL_b_pre[..., 0] * vp0p_y - dL_den * v01[..., 1],
            dL_b_pre[..., 0] * vp0p_x + dL_den * v01[..., 0],
        ],
        axis=-1,
    )
    dL_v01 = jnp.stack(
        [
            dL_b_pre[..., 1] * vp0p_y + dL_den * v02[..., 1],
            -dL_b_pre[..., 1] * vp0p_x - dL_den * v02[..., 0],
        ],
        axis=-1,
    )

    dL_p0 = -dL_v02 - dL_v01 - jnp.stack([dL_vp0p_x, dL_vp0p_y], axis=-1)
    dL_p1 = dL_v01
    dL_p2 = dL_v02

    # Per-pixel [N, H, W, 3(corner), 3(xyz)] gradient, then scatter to verts.
    grad_pix = jnp.stack(
        [
            jnp.concatenate([dL_p0, dL_z[..., 0:1]], axis=-1),
            jnp.concatenate([dL_p1, dL_z[..., 1:2]], axis=-1),
            jnp.concatenate([dL_p2, dL_z[..., 2:3]], axis=-1),
        ],
        axis=-2,
    )
    grad_pix = grad_pix * mask[..., None, None].astype(dtype)

    # Pixel -> face reduction via the binned-matmul accumulator (falls back
    # to a plain row scatter when the rasterizer's global list is
    # non-empty), then the cheap face -> vertex reduction. Like the
    # reference (render_kernel.cu:69-72), vi is used raw here — only
    # rasterize masks the wireframe nibble.
    from drtk_tpu.ops.segment_rows import scatter_rows_to_faces

    num_v = v.shape[1]
    f_cnt = vi.shape[1]
    grad_face = scatter_rows_to_faces(
        grad_pix.reshape(n, h, w, 9), index_img, v, vi,
        interpret=jax.devices()[0].platform != "tpu",
    ).astype(dtype)
    grad_face = grad_face.reshape(n, f_cnt * 3, 3)

    def scatter_vert(ids, vals):
        return jnp.zeros((num_v, 3), dtype).at[ids].add(vals)

    grad_v = jax.vmap(scatter_vert)(vi.reshape(n, -1), grad_face)
    return psum_cotangent(grad_v, v), None, None, jnp.zeros_like(y_offset)


_render_core.defvjp(_render_core_fwd, _render_core_bwd)


def render(
    v: jnp.ndarray,
    vi: jnp.ndarray,
    index_img: jnp.ndarray,
    y_offset: "int | jnp.ndarray" = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render depth and 3-D barycentric images from a rasterized index image.

    Mirrors ``drtk.render`` (drtk/render.py:18-39).

    Args:
        v: [N, V, 3] pixel-space vertex positions (x_pix, y_pix, z_cam).
        vi: [N, F, 3] or [F, 3] int32 triangle indices.
        index_img: [N, H, W] int32 triangle index image (-1 = background).
        y_offset: global row of index_img's first row, for row-tile
            rendering (may be traced; used by the shard_map pipeline in
            drtk_tpu.parallel.spmd). The per-pixel math is bit-identical to
            the corresponding rows of a full-frame render.

    Returns:
        (depth_img [N, H, W], bary_img [N, 3, H, W]); zeros at background.
        f16/bf16 ``v`` computes in float32 (autocast parity,
        render_module.cpp:81-99).
    """
    v = autocast_f32(v)
    if v.ndim != 3 or v.shape[-1] != 3:
        raise ValueError(f"render: expected v of shape [N, V, 3], got {v.shape}")
    vi = broadcast_vi(vi, v.shape[0])
    if index_img.ndim != 3:
        raise ValueError(
            f"render: expected index_img of shape [N, H, W], got {index_img.shape}"
        )
    return _render_core(v, vi, index_img, jnp.asarray(y_offset, jnp.float32))


def render_ref(
    v: jnp.ndarray, vi: jnp.ndarray, index_img: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Float64 reference oracle, mirroring ``drtk.render_ref``
    (drtk/render.py:61-131). Requires x64 enabled.

    Deliberately shares NO code with the op's forward: per-corner element
    gathers (not the packed row gather), ``lambda_0`` computed directly
    from its own edge function (the op derives ``b0 = 1 - b1 - b2``), and a
    local epsclamp — so a bug introduced into ``_render_fwd_math`` makes
    the oracle tests fail rather than cancel out.
    """
    orig_dtype = v.dtype
    f64 = jnp.float64
    v = v.astype(f64)
    vi = broadcast_vi(vi, v.shape[0])
    n, h, w = index_img.shape
    mask = (index_img != -1).astype(f64)

    def eps(x):  # the torch ref's epsclamp (render.py:97-98)
        return jnp.where(x < 0, jnp.minimum(x, -1e-16), jnp.maximum(x, 1e-16))

    safe = jnp.maximum(index_img, 0)
    vi_img = jax.vmap(lambda vib, ii: vib[ii])(vi, safe)  # [N, H, W, 3]
    gv = lambda k: jax.vmap(lambda vb, ii: vb[ii])(v, vi_img[..., k])
    p0, p1, p2 = gv(0), gv(1), gv(2)  # each [N, H, W, 3]

    e01 = p1 - p0
    e02 = p2 - p0
    e12 = p2 - p1
    den = eps(e01[..., 0] * e02[..., 1] - e01[..., 1] * e02[..., 0])

    xs = jnp.arange(w, dtype=f64)[None, None, :]
    ys = jnp.arange(h, dtype=f64)[None, :, None]
    d0x, d0y = xs - p0[..., 0], ys - p0[..., 1]
    d1x, d1y = xs - p1[..., 0], ys - p1[..., 1]

    lam0 = (d1y * e12[..., 0] - d1x * e12[..., 1]) / den
    lam1 = (d0x * e02[..., 1] - d0y * e02[..., 0]) / den
    lam2 = (d0y * e01[..., 0] - d0x * e01[..., 1]) / den

    w0 = lam0 / eps(p0[..., 2])
    w1 = lam1 / eps(p1[..., 2])
    w2 = lam2 / eps(p2[..., 2])
    depth = 1.0 / eps(w0 + w1 + w2)

    bary = jnp.stack([w0, w1, w2], axis=1) * depth[:, None] * mask[:, None]
    return (depth * mask).astype(orig_dtype), bary.astype(orig_dtype)
