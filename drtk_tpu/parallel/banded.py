"""Single-chip row banding: run the pipeline over row bands of a frame that
is too large for HBM as one XLA program.

The reference's CUDA kernels are O(1) memory per pixel and handle any frame
size by construction (grid-stride loops, recompute-not-store backwards, e.g.
/root/reference/src/mipmap_grid_sampler/mipmap_grid_sampler_kernel.cu:411-631,
/root/reference/src/msi/msi_kernel.cu:296-408). An XLA program instead
materializes whole-frame intermediates; at 4096² the full fwd+bwd residual
set exceeds a chip's HBM even under `jax.checkpoint` (the r4 avatar4k
compile OOM: 17.59 of 15.75 GB). The TPU-native equivalent of the
reference's O(1)-memory property is **row banding**:

* :func:`map_row_bands` runs a band function (typically rasterize → render
  → interpolate → shading, as a bit-exact row-tile viewport of the full
  frame) over ``n_bands`` horizontal bands under ``lax.scan``, with
  ``jax.checkpoint`` around each band so the backward rematerializes one
  band at a time. Live memory = the stacked band *outputs* (images) plus
  ONE band's interior residuals, instead of the whole frame's.

* :func:`edge_grad_estimator_banded` is ``edge_grad_estimator`` with a
  banded backward: the CRD stencil pass, whose full-frame temporaries are
  ~1 GB-per-16-float-row at 16 Mpix, runs per band with a one-row halo
  sliced from the full arrays — the same decomposition the shard_map path
  uses across chips (drtk_tpu/ops/edge_grad.py `_edge_grad_core_spmd_bwd`),
  with the ppermute replaced by a slice.

Viewport bit-exactness (rasterize/render/interpolate accept
``y_offset``/``full_height``; edge functions are affine in pixel
coordinates) makes the banded pipeline produce the SAME index/bary/attr
images as the full-frame run, so banding is a memory/scheduling choice,
not a numerics one (gradients differ only by f32 summation order).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from drtk_tpu.ops.edge_grad import _edge_grad_backward
from drtk_tpu.ops.math import autocast_f32
from drtk_tpu.ops.rasterize import broadcast_vi

__all__ = ["map_row_bands", "edge_grad_estimator_banded"]


def map_row_bands(
    band_fn: Callable,
    height: int,
    n_bands: int,
    remat: bool = True,
):
    """Map ``band_fn`` over ``n_bands`` row bands and merge to full height.

    Args:
        band_fn: ``band_fn(y0) -> pytree`` where every leaf is a row block
            of shape ``[..., hb, W]`` (row axis at -2, ``hb = height //
            n_bands``) covering global rows ``[y0, y0 + hb)``. ``y0`` is a
            traced int32 scalar — pass it to the viewport ops
            (``rasterize(..., y_offset=y0, full_height=height)`` etc.).
            Close over everything else (vertices, textures); their
            gradients accumulate across bands through the scan transpose.
        height: full-frame height; must divide evenly by ``n_bands``.
        n_bands: number of bands. Peak memory scales ~1/n_bands for the
            band interiors; the merged outputs are always full-frame.
        remat: wrap ``band_fn`` in ``jax.checkpoint`` (default) so the
            backward holds one band's residuals at a time. Set False only
            for debugging.

    Returns:
        The band outputs merged along the row axis: each leaf
        ``[..., height, W]``.
    """
    if height % n_bands != 0:
        raise ValueError(
            f"height {height} not divisible by n_bands {n_bands}"
        )
    hb = height // n_bands
    fn = jax.checkpoint(band_fn) if remat else band_fn
    ys = jnp.arange(n_bands, dtype=jnp.int32) * hb

    def body(carry, y0):
        return carry, fn(y0)

    _, stacked = jax.lax.scan(body, None, ys)

    def merge(leaf):
        # [B, ..., hb, W] -> [..., B, hb, W] -> [..., B*hb, W]
        a = jnp.moveaxis(leaf, 0, -3)
        return a.reshape(a.shape[:-3] + (a.shape[-3] * a.shape[-2],
                                         a.shape[-1]))

    return jax.tree_util.tree_map(merge, stacked)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _edge_grad_banded_core(v_pix, vi, bary_img, img, index_img, max_dp_dr,
                           n_bands):
    return img


def _edge_grad_banded_fwd(v_pix, vi, bary_img, img, index_img, max_dp_dr,
                          n_bands):
    return img, (v_pix, vi, bary_img, img, index_img)


def _edge_grad_banded_bwd(max_dp_dr, n_bands, res, g):
    """Full-frame edge_grad backward, one row band at a time.

    Band ``s`` owns stencil centers in global rows [s*hb, (s+1)*hb); the
    block passed to ``_edge_grad_backward`` is those rows plus ONE halo row
    (the next band's first row — the D leg of the CRD stencil), sliced from
    the full arrays. The frame is padded with one synthetic background row
    (index −1, zeros) so the last band's halo is inert and every band
    slices uniform shapes; centers at the true last frame row are masked
    inside ``_edge_grad_backward`` (full-frame semantics: y < H−1,
    edge_grad_kernel.cu:270). Contributions a band writes into its halo
    row reduce to vertex space locally and sum across bands in the scan
    carry — the same split the shard_map backward uses across chips, so
    the banded total equals the full-frame gradient up to f32 summation
    order.
    """
    from drtk_tpu.ops.segment_rows import scatter_rows_to_faces

    v_pix, vi, bary_img, img, index_img = res
    n, c, h, w = img.shape
    hb = h // n_bands
    dtype = v_pix.dtype

    img_p = jnp.pad(img, ((0, 0), (0, 0), (0, 1), (0, 0)))
    g_p = jnp.pad(g, ((0, 0), (0, 0), (0, 1), (0, 0)))
    bary_p = jnp.pad(bary_img, ((0, 0), (0, 0), (0, 1), (0, 0)))
    idx_p = jnp.pad(index_img, ((0, 0), (0, 1), (0, 0)), constant_values=-1)

    num_v = v_pix.shape[1]
    interpret = jax.devices()[0].platform != "tpu"

    def band(carry, y0):
        img_b = jax.lax.dynamic_slice_in_dim(img_p, y0, hb + 1, axis=2)
        g_b = jax.lax.dynamic_slice_in_dim(g_p, y0, hb + 1, axis=2)
        bary_b = jax.lax.dynamic_slice_in_dim(bary_p, y0, hb + 1, axis=2)
        idx_b = jax.lax.dynamic_slice_in_dim(idx_p, y0, hb + 1, axis=1)

        gv_img = _edge_grad_backward(
            v_pix, vi, img_b, idx_b, g_b, max_dp_dr, y0, full_height=h
        )  # [N, 3, hb+1, W]

        mask = (idx_b >= 0).astype(dtype)
        gg = jnp.moveaxis(gv_img, 1, -1) * mask[..., None]  # [N,hb+1,W,3]
        bary_l = jnp.moveaxis(bary_b, 1, -1)  # [N, hb+1, W, 3(corner)]
        contrib = bary_l[..., :, None] * gg[..., None, :]
        grad_face = scatter_rows_to_faces(
            contrib.reshape(n, hb + 1, w, 9), idx_b, v_pix, vi,
            interpret=interpret,
        ).astype(dtype)
        grad_face = grad_face.reshape(n, -1, 3)  # [N, F*3, 3]

        def scatter_vert(ids, vals):
            return jnp.zeros((num_v, 3), dtype).at[ids].add(vals)

        gv = jax.vmap(scatter_vert)(vi.reshape(n, -1), grad_face)
        return carry + gv, None

    ys = jnp.arange(n_bands, dtype=jnp.int32) * hb
    grad_v_pix, _ = jax.lax.scan(
        band, jnp.zeros((n, num_v, 3), dtype), ys
    )
    return (grad_v_pix, None, None, g, None)


_edge_grad_banded_core.defvjp(_edge_grad_banded_fwd, _edge_grad_banded_bwd)


def edge_grad_estimator_banded(
    v_pix: jnp.ndarray,
    vi: jnp.ndarray,
    bary_img: jnp.ndarray,
    img: jnp.ndarray,
    index_img: jnp.ndarray,
    n_bands: int,
    max_dp_dr: float = 1e4,
) -> jnp.ndarray:
    """:func:`drtk_tpu.edge_grad_estimator` with a row-banded backward.

    Identical semantics and arguments (see the main op's docstring); the
    backward CRD-stencil pass runs over ``n_bands`` row bands instead of
    the whole frame, bounding its temporaries to one band's rows. Use for
    frames whose full-frame backward does not fit HBM (e.g. 4096²).
    ``height`` must divide evenly by ``n_bands``.
    """
    v_pix = autocast_f32(v_pix)
    bary_img = autocast_f32(bary_img)
    img = autocast_f32(img)
    vi = broadcast_vi(vi, v_pix.shape[0])
    h = img.shape[2]
    if h % n_bands != 0:
        raise ValueError(f"height {h} not divisible by n_bands {n_bands}")
    return _edge_grad_banded_core(
        v_pix, vi, jax.lax.stop_gradient(bary_img), img, index_img,
        float(max_dp_dr), int(n_bands),
    )
