"""Edge-gradient estimator: differentiability at visibility discontinuities.

TPU-native reimplementation of the reference's ``edge_grad_ext``
(`src/edge_grad/edge_grad_kernel.cu` in facebookresearch/DRTK), the
"Rasterized Edge Gradients" method (ECCV 2024, arXiv:2405.02508).

* Forward is the identity on ``img`` (edge_grad_module.cpp:118-137).

* Backward (edge_grad_kernel.cu:219-449) examines the Center/Right/Down (CRD)
  2x2-neighbourhood stencil at every pixel with ``x < W-1 && y < H-1``:
  horizontal/vertical index discontinuities are classified as *overlap* (one
  triangle hangs over the other), *intersection* (each pixel center lies
  inside the other pixel's triangle) or *adjacent*; the image-difference dot
  ``grad_dot = sum_c (img[nbr]-img[center]) * 0.5*(g[nbr]+g[center])`` is
  assigned to the moving side's x (or y), and for intersections spread into
  x/y *and z* through ``dp_dr`` computed from projected face normals
  (get_dp_dr, kernel.cu:102-203, Eqn. 14 / §S.3 of the paper), including the
  ``max_dp_dr`` magnitude clamp. Contributions are negated and accumulated
  into a [N, 3, H, W] ``grad_v_pix_img``.

  The CUDA kernel's per-pixel branches become masked vector ops here; the
  three ``atomicAdd`` targets (center/right/down) become three shifted adds.
  The pixel→vertex reduction applies interpolate's VJP formula (bary
  detached) — mathematically the reference's
  ``v_pix_img = interpolate(v_pix, vi, index_img, bary.detach())`` trick
  (drtk/edge_grad_estimator.py:168-175) — expressed directly through the
  binned-matmul accumulator (drtk_tpu/ops/segment_rows.py).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from drtk_tpu.ops.math import autocast_f32, epsclamp, psum_cotangent
from drtk_tpu.ops.rasterize import broadcast_vi

__all__ = ["edge_grad_estimator", "edge_grad_estimator_ref"]


def _safe_normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.where(n == 0, 1.0, n)


def _pix_in_tri(p0, p1, p2, px, py):
    """Vectorized ``pix_in_tri`` (edge_grad_kernel.cu:30-70): coverage of
    point (px, py) under the top-left fill rule. p* are [..., 2] arrays
    broadcastable against px/py."""
    v01 = p1 - p0
    v02 = p2 - p0
    v12 = p2 - p1
    den = v01[..., 0] * v02[..., 1] - v01[..., 1] * v02[..., 0]
    sgn = jnp.sign(den)

    vp0p_x = px - p0[..., 0]
    vp0p_y = py - p0[..., 1]
    vp1p_x = px - p1[..., 0]
    vp1p_y = py - p1[..., 1]

    b0 = (vp1p_y * v12[..., 0] - vp1p_x * v12[..., 1]) * sgn
    b1 = (vp0p_x * v02[..., 1] - vp0p_y * v02[..., 0]) * sgn
    b2 = (vp0p_y * v01[..., 0] - vp0p_x * v01[..., 1]) * sgn

    def topleft(e, invert):
        pos = (e[..., 1] < 0) | ((e[..., 1] == 0) & (e[..., 0] > 0))
        neg = (e[..., 1] > 0) | ((e[..., 1] == 0) & (e[..., 0] < 0))
        if invert:
            pos, neg = neg, pos
        return jnp.where(den > 0, pos, neg)

    tl0 = topleft(v12, False)
    tl1 = topleft(v02, True)
    tl2 = topleft(v01, False)

    inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0)
    reject = ((b0 == 0) & ~tl0) | ((b1 == 0) & ~tl1) | ((b2 == 0) & ~tl2)
    return inside & ~reject & (den != 0)


def _get_dp_dr(n_varying, n_fixed, max_dp_dr):
    """Vectorized ``get_dp_dr`` (edge_grad_kernel.cu:102-203).

    n_varying / n_fixed: [..., 2] projected face normals (XZ or YZ plane).
    Returns [..., 2]: (d p/d r, d p/d z-ish) used to spread grad_dot.
    """
    nv = _safe_normalize(n_varying)
    nf = _safe_normalize(n_fixed)
    b_x = -nf[..., 1]
    b_y = nf[..., 0]
    d = b_x * nv[..., 0] + b_y * nv[..., 1]
    if max_dp_dr > 0:
        abs_d = jnp.abs(d)
        abs_bx_over_m = jnp.abs(b_x) / max_dp_dr
        sign_d = jnp.where(d >= 0, 1.0, -1.0)
        safe_d = sign_d * epsclamp(jnp.maximum(abs_d, abs_bx_over_m))
        scale = b_x / safe_d
    else:
        scale = b_x / epsclamp(d)
    return scale[..., None] * nv


def _face_normals(v_pix: jnp.ndarray, vi: jnp.ndarray) -> jnp.ndarray:
    """Per-face normals, ``normalize(cross(p0 - p2, p1 - p0))``
    (get_tri_normal, edge_grad_kernel.cu:89-100). [N, F, 3]."""
    f = jax.vmap(lambda vb, vib: vb[vib])(v_pix, vi)  # [N, F, 3, 3]
    p0, p1, p2 = f[..., 0, :], f[..., 1, :], f[..., 2, :]
    return _safe_normalize(jnp.cross(p0 - p2, p1 - p0))


def _edge_grad_backward(v_pix, vi, img, index_img, grad_output, max_dp_dr,
                        y_offset=0, full_height=None):
    """Compute grad_v_pix_img [N, 3, H, W] (the CUDA backward kernel).

    ``y_offset``/``full_height`` support row-tile (shard_map) processing:
    the pixel grids are offset to global coordinates and stencil centers at
    global row ``full_height - 1`` are masked out (the full-frame kernel
    never evaluates them: edge_grad_kernel.cu:270 requires y < H-1).
    """
    dtype = v_pix.dtype
    n, c, h, w = img.shape

    # ---- stencil-center grids (pixels with x < W-1, y < H-1) -------------
    sh, sw = h - 1, w - 1

    idx = index_img
    c_idx = idx[:, :sh, :sw]
    r_idx = idx[:, :sh, 1:]
    d_idx = idx[:, 1:, :sw]

    c_valid = c_idx >= 0
    r_valid = r_idx >= 0
    d_valid = d_idx >= 0

    lr_diff = c_idx != r_idx
    ud_diff = c_idx != d_idx
    x_both = c_valid & r_valid
    y_both = c_valid & d_valid

    # ---- per-pixel triangle vertices + normals for C/R/D -------------------
    # One packed [16]-row gather per stencil position serves both the
    # triangle corners and the face normal (row gathers are ~2x faster than
    # small element gathers on TPU). Invalid pixels read all-zero rows ->
    # degenerate triangles -> pix_in_tri false, matching load_vec3_if_valid
    # (kernel.cu:205-215).
    face_verts = jax.vmap(lambda vb, vib: vb[vib])(v_pix, vi)  # [N, F, 3, 3]
    normals = _face_normals(v_pix, vi)  # [N, F, 3]
    table = jnp.concatenate(
        [face_verts.reshape(n, -1, 9), normals,
         jnp.zeros((n, normals.shape[1], 4), v_pix.dtype)],
        axis=-1,
    )  # [N, F, 16]

    # Gather once for the full image; the R and D stencil rows are shifted
    # slices of the same gathered image (1/3 the gather volume). The
    # binned-matmul fetch (segment_rows.gather_rows_by_index) is bit-exact
    # and already zero-fills invalid pixels, so the stencil wheres below
    # are identities there.
    from drtk_tpu.ops.segment_rows import gather_rows_by_index

    rows_full = gather_rows_by_index(
        table, idx, interpret=jax.devices()[0].platform != "tpu"
    )  # [N, H, W, 16]
    rows_c = jnp.where(c_valid[..., None], rows_full[:, :sh, :sw], 0.0)
    rows_r = jnp.where(r_valid[..., None], rows_full[:, :sh, 1:], 0.0)
    rows_d = jnp.where(d_valid[..., None], rows_full[:, 1:, :sw], 0.0)
    pts_c = rows_c[..., :9].reshape(rows_c.shape[:-1] + (3, 3))
    pts_r = rows_r[..., :9].reshape(rows_r.shape[:-1] + (3, 3))
    pts_d = rows_d[..., :9].reshape(rows_d.shape[:-1] + (3, 3))

    px = jnp.arange(sw, dtype=dtype)[None, None, :]
    py = (jnp.arange(sh) + y_offset).astype(dtype)[None, :, None]

    def in_tri(pts, ox, oy):
        return _pix_in_tri(
            pts[..., 0, :2], pts[..., 1, :2], pts[..., 2, :2], px + ox, py + oy
        )

    center_in_right = lr_diff & x_both & in_tri(pts_r, 0.0, 0.0)
    right_in_center = lr_diff & x_both & in_tri(pts_c, 1.0, 0.0)
    center_in_down = ud_diff & y_both & in_tri(pts_d, 0.0, 0.0)
    down_in_center = ud_diff & y_both & in_tri(pts_c, 0.0, 1.0)

    l_over_r = center_in_right & ~right_in_center
    r_over_l = right_in_center & ~center_in_right
    u_over_d = center_in_down & ~down_in_center
    d_over_u = down_in_center & ~center_in_down

    horiz_int = center_in_right & right_in_center
    vert_int = center_in_down & down_in_center

    horiz_adj = lr_diff & x_both & ~center_in_right & ~right_in_center
    vert_adj = ud_diff & y_both & ~center_in_down & ~down_in_center

    # ---- image-difference dot grad_output (kernel.cu:351-380) -------------
    g = grad_output
    gdx = jnp.sum(
        (img[:, :, :sh, 1:] - img[:, :, :sh, :sw])
        * (0.5 * (g[:, :, :sh, 1:] + g[:, :, :sh, :sw])),
        axis=1,
    )
    gdy = jnp.sum(
        (img[:, :, 1:, :sw] - img[:, :, :sh, :sw])
        * (0.5 * (g[:, :, 1:, :sw] + g[:, :, :sh, :sw])),
        axis=1,
    )
    gdx = jnp.where(lr_diff, gdx, 0.0)
    gdy = jnp.where(ud_diff, gdy, 0.0)

    # ---- face normals for dp_dr (intersection case) -----------------------
    # Already gathered in the packed stencil rows above.
    n_c = rows_c[..., 9:12]
    n_r = rows_r[..., 9:12]
    n_d = rows_d[..., 9:12]

    def dp(nv, nf, axes):
        return _get_dp_dr(nv[..., axes], nf[..., axes], max_dp_dr)

    xz = jnp.array([0, 2])
    yz = jnp.array([1, 2])

    dpx_c = dp(n_c, n_r, xz)  # center moves, right fixed (kernel.cu:395-399)
    dpx_r = dp(n_r, n_c, xz)  # right moves, center fixed
    dpy_c = dp(n_c, n_d, yz)
    dpy_d = dp(n_d, n_c, yz)

    # ---- assemble per-stencil contributions (kernel.cu:383-423) -----------
    zero = jnp.zeros_like(gdx)

    # horizontal, non-intersection
    gvc_x = jnp.where(
        ~horiz_int & ~(~c_valid | r_over_l | horiz_adj), gdx, zero
    )
    gvr_x = jnp.where(
        ~horiz_int & ~(~r_valid | l_over_r | horiz_adj), gdx, zero
    )
    # horizontal, intersection
    gvc_x = gvc_x + jnp.where(horiz_int, gdx * dpx_c[..., 0], zero)
    gvc_zx = jnp.where(horiz_int, gdx * dpx_c[..., 1], zero)
    gvr_x = gvr_x + jnp.where(horiz_int, gdx * dpx_r[..., 0], zero)
    gvr_z = jnp.where(horiz_int, gdx * dpx_r[..., 1], zero)

    # vertical, non-intersection
    gvc_y = jnp.where(~vert_int & ~(~c_valid | d_over_u | vert_adj), gdy, zero)
    gvd_y = jnp.where(~vert_int & ~(~d_valid | u_over_d | vert_adj), gdy, zero)
    # vertical, intersection
    gvc_y = gvc_y + jnp.where(vert_int, gdy * dpy_c[..., 0], zero)
    gvc_zy = jnp.where(vert_int, gdy * dpy_c[..., 1], zero)
    gvd_y = gvd_y + jnp.where(vert_int, gdy * dpy_d[..., 0], zero)
    gvd_z = jnp.where(vert_int, gdy * dpy_d[..., 1], zero)

    gvc = jnp.stack([gvc_x, gvc_y, gvc_zx + gvc_zy], axis=1)  # [N,3,sh,sw]
    gvr = jnp.stack([gvr_x, zero, gvr_z], axis=1)
    gvd = jnp.stack([zero, gvd_y, gvd_z], axis=1)

    if full_height is not None:
        # Row-tile mode: drop stencil centers at the last full-frame row.
        row_ok = ((jnp.arange(sh) + y_offset) < (full_height - 1)).astype(
            gvc.dtype
        )[None, None, :, None]
        gvc = gvc * row_ok
        gvr = gvr * row_ok
        gvd = gvd * row_ok

    # ---- negated scatter into the three stencil positions -----------------
    gvc = gvc.astype(dtype)
    gvr = gvr.astype(dtype)
    gvd = gvd.astype(dtype)
    grad_v_pix_img = jnp.zeros((n, 3, h, w), dtype)
    grad_v_pix_img = grad_v_pix_img.at[:, :, :sh, :sw].add(-gvc)
    grad_v_pix_img = grad_v_pix_img.at[:, :, :sh, 1:].add(-gvr)
    grad_v_pix_img = grad_v_pix_img.at[:, :, 1:, :sw].add(-gvd)
    return grad_v_pix_img


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _edge_grad_core(v_pix, vi, bary_img, img, index_img, max_dp_dr):
    return img


def _edge_grad_core_fwd(v_pix, vi, bary_img, img, index_img, max_dp_dr):
    return img, (v_pix, vi, bary_img, img, index_img)


def _edge_grad_core_bwd(max_dp_dr, res, grad_output):
    v_pix, vi, bary_img, img, index_img = res
    n, h, w = index_img.shape
    grad_v_pix_img = _edge_grad_backward(
        v_pix, vi, img, index_img, grad_output, max_dp_dr
    )
    # Pixel -> vertex reduction: interpolate's VJP with bary detached (the
    # reference routes the gradient through
    # v_pix_img = interpolate(v_pix, vi, index_img, bary.detach()),
    # edge_grad_estimator.py:168-175) — here expressed directly through the
    # binned-matmul accumulator.
    from drtk_tpu.ops.segment_rows import scatter_rows_to_faces

    mask = (index_img >= 0).astype(v_pix.dtype)
    g = jnp.moveaxis(grad_v_pix_img, 1, -1) * mask[..., None]  # [N,H,W,3]
    bary = jnp.moveaxis(bary_img, 1, -1)  # [N, H, W, 3(corner)]
    contrib = bary[..., :, None] * g[..., None, :]  # [N,H,W,corner,coord]
    grad_face = scatter_rows_to_faces(
        contrib.reshape(n, h, w, 9), index_img, v_pix, vi,
        interpret=jax.devices()[0].platform != "tpu",
    ).astype(v_pix.dtype)
    grad_face = grad_face.reshape(n, -1, 3)  # [N, F*3, 3]

    num_v = v_pix.shape[1]

    def scatter_vert(ids, vals):
        return jnp.zeros((num_v, 3), v_pix.dtype).at[ids].add(vals)

    grad_v_pix = jax.vmap(scatter_vert)(vi.reshape(n, -1), grad_face)
    # (grad_v_pix, grad_vi, grad_bary, grad_img, grad_index_img)
    return (grad_v_pix, None, None, grad_output, None)


_edge_grad_core.defvjp(_edge_grad_core_fwd, _edge_grad_core_bwd)


# --------------------------------------------------------------------------
# SPMD (shard_map) variant: row-sharded blocks with halo exchange
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _edge_grad_core_spmd(v_pix, vi, bary_img, img, index_img, y_offset,
                         max_dp_dr, axis_name, full_height):
    return img


def _edge_grad_core_spmd_fwd(v_pix, vi, bary_img, img, index_img, y_offset,
                             max_dp_dr, axis_name, full_height):
    return img, (v_pix, vi, bary_img, img, index_img, y_offset)


def _edge_grad_core_spmd_bwd(max_dp_dr, axis_name, full_height, res, g):
    """Per-shard CRD backward over a row block [y0, y0+hb) of the full frame.

    The CRD stencil at the block's last row needs the next shard's first row
    of img / grad_output / index / bary — fetched with one ``ppermute`` per
    tensor over the mesh axis (riding ICI on hardware). Contributions the
    stencil writes into that halo row are reduced to *vertex* space locally;
    the cross-shard sum happens in the psum the enclosing shard_map inserts
    when transposing the replicated ``v_pix`` broadcast. The last shard gets
    a synthetic background halo (index -1) and its final-frame row is masked
    inside ``_edge_grad_backward`` (full-frame semantics: y < H-1).
    """
    v_pix, vi, bary_img, img, index_img, y_offset = res
    n, hb, w = index_img.shape
    p_cnt = jax.lax.axis_size(axis_name)
    perm = [(j + 1, j) for j in range(p_cnt - 1)]

    def halo(x, row_axis):
        first = jax.lax.slice_in_dim(x, 0, 1, axis=row_axis)
        return jax.lax.ppermute(first, axis_name, perm)

    idx_h = halo(index_img, 1)
    # ppermute fills non-receiving shards (the last one) with zeros — face 0,
    # a *valid* id; overwrite with background so the fake halo is inert.
    is_last = jax.lax.axis_index(axis_name) == (p_cnt - 1)
    idx_h = jnp.where(is_last, jnp.full_like(idx_h, -1), idx_h)

    img_ext = jnp.concatenate([img, halo(img, 2)], axis=2)
    g_ext = jnp.concatenate([g, halo(g, 2)], axis=2)
    bary_ext = jnp.concatenate([bary_img, halo(bary_img, 2)], axis=2)
    idx_ext = jnp.concatenate([index_img, idx_h], axis=1)

    grad_v_pix_img = _edge_grad_backward(
        v_pix, vi, img_ext, idx_ext, g_ext, max_dp_dr, y_offset, full_height
    )

    # Pixel -> vertex reduction over the extended block. Plain row scatter
    # (shard_map-portable); interpolate's VJP formula with bary detached,
    # like the reference's v_pix_img indirection.
    dtype = v_pix.dtype
    mask = (idx_ext >= 0).astype(dtype)
    gg = jnp.moveaxis(grad_v_pix_img, 1, -1) * mask[..., None]
    bary_l = jnp.moveaxis(bary_ext, 1, -1)  # [N, hb+1, W, 3]
    contrib = bary_l[..., :, None] * gg[..., None, :]  # [.., corner, coord]
    f_cnt = vi.shape[1]
    rows = contrib.reshape(n, -1, 9)
    safe = jnp.maximum(idx_ext, 0).reshape(n, -1)

    def scatter_face(ids, vals):
        return jnp.zeros((f_cnt, 9), vals.dtype).at[ids].add(
            vals, mode="promise_in_bounds"
        )

    grad_face = jax.vmap(scatter_face)(safe, rows).reshape(n, f_cnt * 3, 3)
    num_v = v_pix.shape[1]

    def scatter_vert(ids, vals):
        return jnp.zeros((num_v, 3), vals.dtype).at[ids].add(vals)

    grad_v_pix = jax.vmap(scatter_vert)(vi.reshape(n, -1), grad_face)
    return (
        psum_cotangent(grad_v_pix.astype(dtype), v_pix),
        None,
        None,
        g,
        None,
        jnp.zeros_like(y_offset),
    )


_edge_grad_core_spmd.defvjp(_edge_grad_core_spmd_fwd, _edge_grad_core_spmd_bwd)


def edge_grad_estimator(
    v_pix: jnp.ndarray,
    vi: jnp.ndarray,
    bary_img: jnp.ndarray,
    img: jnp.ndarray,
    index_img: jnp.ndarray,
    v_pix_img_hook: Optional[Callable[[jnp.ndarray], None]] = None,
    max_dp_dr: float = 1e4,
    spmd_axis_name: Optional[str] = None,
    y_offset: "int | jnp.ndarray" = 0,
    full_height: Optional[int] = None,
) -> jnp.ndarray:
    """Make the rasterized image differentiable at visibility discontinuities.

    Mirrors ``drtk.edge_grad_estimator`` (drtk/edge_grad_estimator.py:20-175):
    returns ``img`` unchanged in the forward pass; in the backward pass,
    image-space discontinuity gradients are computed with the CRD stencil and
    reduced to ``v_pix`` with interpolate's VJP formula (``bary_img``
    detached), exactly the reference's ``v_pix_img`` indirection.

    Args:
        v_pix: [N, V, 3] pixel-space positions (x_pix, y_pix, z_cam).
        vi: [N, F, 3] or [F, 3] int32 face indices.
        bary_img: [N, 3, H, W] barycentrics (will be detached).
        img: [N, C, H, W] rendered image; must correspond exactly to
            index_img/bary_img (no spatial post-processing).
        index_img: [N, H, W] int32 index image.
        v_pix_img_hook: unsupported — JAX has no mutable backward hooks
            (the reference registers a tensor hook on ``v_pix_img`` to
            visualize the image-space edge gradient,
            drtk/edge_grad_estimator.py:96-99). The jax-idiomatic recipe
            for the same diagnostic: recompute the edge-gradient image
            explicitly and differentiate to it directly ::

                # g_img [N, 3, H, W] is exactly what the reference's hook
                # observes as v_pix_img.grad:
                from drtk_tpu.ops.edge_grad import edge_grad_image
                d_img = jax.grad(loss_through_img)(img)
                g_img = edge_grad_image(v_pix, vi, img, index_img, d_img)

            or, for a hook-like tap inside a live training step, insert
            ``jax.debug.callback(save_fn, g_img)`` on that value.
        max_dp_dr: magnitude clamp for dp/dr (0.0 disables, for
            finite-difference comparisons). Default 1e4.
        spmd_axis_name: if set, the inputs are row blocks of a frame sharded
            over this shard_map mesh axis; the backward exchanges one halo
            row per tensor with ``ppermute`` and reduces vertex gradients
            locally (summed by the shard_map transpose). Requires
            ``full_height``.
        y_offset: global row of this block's first row (traced OK).
        full_height: full-frame height (row-tile / SPMD mode only).

    Returns:
        ``img``, with discontinuity gradients attached.
    """
    if v_pix_img_hook is not None:
        raise NotImplementedError(
            "v_pix_img_hook is not supported in the JAX port; inspect "
            "gradients with jax.grad on v_pix_img instead"
        )
    # Autocast parity (edge_grad_module.cpp:189-197): f16/bf16 inputs
    # compute in float32.
    v_pix = autocast_f32(v_pix)
    bary_img = autocast_f32(bary_img)
    img = autocast_f32(img)
    vi = broadcast_vi(vi, v_pix.shape[0])
    if spmd_axis_name is not None:
        if full_height is None:
            raise ValueError(
                "edge_grad_estimator: full_height is required with "
                "spmd_axis_name"
            )
        return _edge_grad_core_spmd(
            v_pix, vi, jax.lax.stop_gradient(bary_img), img, index_img,
            jnp.asarray(y_offset, jnp.float32), float(max_dp_dr),
            spmd_axis_name, int(full_height),
        )
    return _edge_grad_core(
        v_pix, vi, jax.lax.stop_gradient(bary_img), img, index_img,
        float(max_dp_dr),
    )


def edge_grad_image(
    v_pix: jnp.ndarray,
    vi: jnp.ndarray,
    img: jnp.ndarray,
    index_img: jnp.ndarray,
    d_img: jnp.ndarray,
    max_dp_dr: float = 1e4,
) -> jnp.ndarray:
    """The image-space edge gradient [N, 3, H, W] — exactly the value the
    reference's ``v_pix_img_hook`` observes as ``v_pix_img.grad``
    (drtk/edge_grad_estimator.py:96-99): the CRD-stencil discontinuity
    gradient of the upstream image cotangent ``d_img``, before the
    pixel→vertex reduction. Diagnostic/visualization aid; JAX has no
    backward hooks, so this exposes the same quantity as a plain function
    (see the ``v_pix_img_hook`` note on :func:`edge_grad_estimator`).
    """
    vi = broadcast_vi(vi, v_pix.shape[0])
    return _edge_grad_backward(
        v_pix, vi, img, index_img, d_img, float(max_dp_dr)
    )


# Independent float64 oracle (a from-scratch second implementation of the
# kernel semantics — see drtk_tpu/ops/edge_grad_ref.py).
from drtk_tpu.ops.edge_grad_ref import edge_grad_estimator_ref  # noqa: E402
