"""Independent float64 oracle of the edge-gradient estimator.

This is a from-scratch second implementation of the reference's shipped
backward semantics (the CUDA kernel, ``src/edge_grad/edge_grad_kernel.cu:
219-449``), kept deliberately free of any code shared with the main op in
:mod:`drtk_tpu.ops.edge_grad` so that a bug in the op's math makes the
parity tests fail (the package invariant: every op keeps an independent
float64 ``*_ref`` oracle):

* coverage / classification / dp_dr are re-derived here from the kernel
  sources, not imported from the op;
* the pixel->vertex reduction goes through jax autodiff of an explicit
  barycentric-gather expression — the reference's ``v_pix_img =
  interpolate(v_pix, vi, index_img, bary.detach())`` indirection
  (``drtk/edge_grad_estimator.py:160-175``) — instead of the op's
  binned-matmul accumulator (``drtk_tpu/ops/segment_rows.py``).

Note the reference also ships a pure-python ``EdgeGradEstimatorFunction``
(``drtk/edge_grad_estimator.py:210-449``); that code builds its pixel grid
transposed and skips the "adjacent" class the kernel excludes
(``kernel.cu:338-341, 392-393``). The shipped behaviour of the reference is
the CUDA kernel, so this oracle is pinned to the kernel semantics — the same
ruling as tests/torch_oracle.py, which provides the torch-autograd third
opinion.

Everything here computes in float64 (requires ``jax_enable_x64``).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["edge_grad_estimator_ref"]


def _eps(x, eps=1e-8):
    """The kernel ref's epsclamp (clamp away from zero, -0.0 -> +eps)."""
    return jnp.where(x < 0, jnp.minimum(x, -eps), jnp.maximum(x, eps))


def _normalize(x):
    n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.where(n == 0, 1.0, n)


def _gather_img(table, vi, index_img):
    """Per-pixel per-corner element gathers (the torch ref's ``index()``
    chain): table [N, V, C], -> [N, H, W, 3, C]. Background reads face 0."""
    safe = jnp.maximum(index_img, 0)
    vi_img = jax.vmap(lambda vib, ii: vib[ii])(vi, safe)  # [N, H, W, 3]
    return jax.vmap(lambda t, ii: t[ii])(
        table, vi_img.reshape(vi_img.shape[0], -1)
    ).reshape(vi_img.shape + (table.shape[-1],))


def _covered(pts2, px, py):
    """Coverage of (px, py) by triangles pts2 [..., 3, 2]: >=0 edge
    functions + top-left fill rule (edge_grad_kernel.cu:30-70); degenerate
    triangles cover nothing."""
    p0, p1, p2 = pts2[..., 0, :], pts2[..., 1, :], pts2[..., 2, :]
    e01 = p1 - p0
    e02 = p2 - p0
    e12 = p2 - p1
    den = e01[..., 0] * e02[..., 1] - e01[..., 1] * e02[..., 0]
    s = jnp.sign(den)

    w0 = ((py - p1[..., 1]) * e12[..., 0] - (px - p1[..., 0]) * e12[..., 1]) * s
    w1 = ((px - p0[..., 0]) * e02[..., 1] - (py - p0[..., 1]) * e02[..., 0]) * s
    w2 = ((py - p0[..., 1]) * e01[..., 0] - (px - p0[..., 0]) * e01[..., 1]) * s

    def top_left(e, flip):
        a = (e[..., 1] < 0) | ((e[..., 1] == 0) & (e[..., 0] > 0))
        b = (e[..., 1] > 0) | ((e[..., 1] == 0) & (e[..., 0] < 0))
        if flip:
            a, b = b, a
        return jnp.where(den > 0, a, b)

    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
    reject = (
        ((w0 == 0) & ~top_left(e12, False))
        | ((w1 == 0) & ~top_left(e02, True))
        | ((w2 == 0) & ~top_left(e01, False))
    )
    return inside & ~reject & (den != 0)


def _dp_dr(n_var, n_fix, max_dp_dr):
    """get_dp_dr (edge_grad_kernel.cu:102-203): the border-sliding
    derivative in a projected 2-D plane, magnitude-clamped."""
    n_var = _normalize(n_var)
    n_fix = _normalize(n_fix)
    bx, by = -n_fix[..., 1], n_fix[..., 0]
    d = bx * n_var[..., 0] + by * n_var[..., 1]
    if max_dp_dr > 0:
        sgn = jnp.where(d >= 0, 1.0, -1.0)
        d = sgn * jnp.maximum(jnp.abs(d), jnp.abs(bx) / max_dp_dr)
    return (bx / _eps(d))[..., None] * n_var


def _image_grad(v_pix, vi, img, index_img, grad_output, max_dp_dr):
    """grad w.r.t. v_pix_img, [N, 3, H, W] float64 — the CUDA backward
    kernel semantics over the full frame."""
    f64 = jnp.float64
    img = img.astype(f64)
    g = grad_output.astype(f64)
    n, _, h, w = img.shape
    sh, sw = h - 1, w - 1

    ci = index_img[:, :sh, :sw]
    ri = index_img[:, :sh, 1:]
    di = index_img[:, 1:, :sw]
    c_ok, r_ok, d_ok = ci >= 0, ri >= 0, di >= 0
    lr = ci != ri
    ud = ci != di

    pts = _gather_img(v_pix.astype(f64), vi, index_img)  # [N,H,W,3,3]
    pts = jnp.where((index_img >= 0)[..., None, None], pts, 0.0)
    # get_tri_normal (kernel.cu:89-100): normalize(cross(p0 - p2, p1 - p0))
    nrm = _normalize(
        jnp.cross(pts[..., 0, :] - pts[..., 2, :],
                  pts[..., 1, :] - pts[..., 0, :])
    )

    pts_c, nrm_c = pts[:, :sh, :sw], nrm[:, :sh, :sw]
    pts_r, nrm_r = pts[:, :sh, 1:], nrm[:, :sh, 1:]
    pts_d, nrm_d = pts[:, 1:, :sw], nrm[:, 1:, :sw]

    ys = jnp.arange(sh, dtype=f64)[None, :, None]
    xs = jnp.arange(sw, dtype=f64)[None, None, :]

    c_in_r = lr & c_ok & r_ok & _covered(pts_r[..., :2], xs, ys)
    r_in_c = lr & c_ok & r_ok & _covered(pts_c[..., :2], xs + 1, ys)
    c_in_d = ud & c_ok & d_ok & _covered(pts_d[..., :2], xs, ys)
    d_in_c = ud & c_ok & d_ok & _covered(pts_c[..., :2], xs, ys + 1)

    h_int = c_in_r & r_in_c
    v_int = c_in_d & d_in_c
    h_adj = lr & c_ok & r_ok & ~c_in_r & ~r_in_c
    v_adj = ud & c_ok & d_ok & ~c_in_d & ~d_in_c

    gx = jnp.sum(
        (img[:, :, :sh, 1:] - img[:, :, :sh, :sw])
        * 0.5 * (g[:, :, :sh, 1:] + g[:, :, :sh, :sw]),
        axis=1,
    ) * lr
    gy = jnp.sum(
        (img[:, :, 1:, :sw] - img[:, :, :sh, :sw])
        * 0.5 * (g[:, :, 1:, :sw] + g[:, :, :sh, :sw]),
        axis=1,
    ) * ud

    zero = jnp.zeros_like(gx)

    # horizontal pairs (kernel.cu:383-399)
    keep_c = ~h_int & ~(~c_ok | (r_in_c & ~c_in_r) | h_adj)
    keep_r = ~h_int & ~(~r_ok | (c_in_r & ~r_in_c) | h_adj)
    gc_x = jnp.where(keep_c, gx, zero)
    gr_x = jnp.where(keep_r, gx, zero)
    xz = jnp.array([0, 2])
    dp = _dp_dr(nrm_c[..., xz], nrm_r[..., xz], max_dp_dr)
    gc_x = gc_x + jnp.where(h_int, gx * dp[..., 0], zero)
    gc_z = jnp.where(h_int, gx * dp[..., 1], zero)
    dp = _dp_dr(nrm_r[..., xz], nrm_c[..., xz], max_dp_dr)
    gr_x = gr_x + jnp.where(h_int, gx * dp[..., 0], zero)
    gr_z = jnp.where(h_int, gx * dp[..., 1], zero)

    # vertical pairs (kernel.cu:401-423)
    keep_c = ~v_int & ~(~c_ok | (d_in_c & ~c_in_d) | v_adj)
    keep_d = ~v_int & ~(~d_ok | (c_in_d & ~d_in_c) | v_adj)
    gc_y = jnp.where(keep_c, gy, zero)
    gd_y = jnp.where(keep_d, gy, zero)
    yz = jnp.array([1, 2])
    dp = _dp_dr(nrm_c[..., yz], nrm_d[..., yz], max_dp_dr)
    gc_y = gc_y + jnp.where(v_int, gy * dp[..., 0], zero)
    gc_z = gc_z + jnp.where(v_int, gy * dp[..., 1], zero)
    dp = _dp_dr(nrm_d[..., yz], nrm_c[..., yz], max_dp_dr)
    gd_y = gd_y + jnp.where(v_int, gy * dp[..., 0], zero)
    gd_z = jnp.where(v_int, gy * dp[..., 1], zero)

    out = jnp.zeros((n, h, w, 3), f64)
    gc = jnp.stack([gc_x, gc_y, gc_z], axis=-1)
    gr = jnp.stack([gr_x, jnp.zeros_like(gr_x), gr_z], axis=-1)
    gd = jnp.stack([jnp.zeros_like(gd_y), gd_y, gd_z], axis=-1)
    out = out.at[:, :sh, :sw].add(-gc)
    out = out.at[:, :sh, 1:].add(-gr)
    out = out.at[:, 1:, :sw].add(-gd)
    return jnp.moveaxis(out, -1, 1)  # [N, 3, H, W]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _core(v_pix, vi, bary_img, img, index_img, max_dp_dr):
    return img


def _core_fwd(v_pix, vi, bary_img, img, index_img, max_dp_dr):
    return img, (v_pix, vi, bary_img, img, index_img)


def _core_bwd(max_dp_dr, res, grad_output):
    v_pix, vi, bary_img, img, index_img = res
    g_img = _image_grad(v_pix, vi, img, index_img, grad_output, max_dp_dr)
    g_img = g_img * (index_img >= 0)[:, None]

    # Pixel -> vertex through autodiff of the barycentric-gather expression
    # (the reference's v_pix_img indirection, bary detached).
    bary = jnp.moveaxis(bary_img, 1, -1).astype(jnp.float64)  # [N,H,W,3]

    def v_pix_img(vp):
        corners = _gather_img(vp, vi, index_img)  # [N,H,W,3,3]
        return jnp.moveaxis(
            jnp.sum(corners * bary[..., None], axis=-2), -1, 1
        )  # [N, 3, H, W]

    _, pull = jax.vjp(v_pix_img, v_pix.astype(jnp.float64))
    (grad_v_pix,) = pull(g_img)
    return (grad_v_pix.astype(v_pix.dtype), None, None, grad_output, None)


_core.defvjp(_core_fwd, _core_bwd)


def edge_grad_estimator_ref(
    v_pix: jnp.ndarray,
    vi: jnp.ndarray,
    bary_img: jnp.ndarray,
    img: jnp.ndarray,
    index_img: jnp.ndarray,
    v_pix_img_hook: Optional[Callable[[jnp.ndarray], None]] = None,
    max_dp_dr: float = 1e4,
) -> jnp.ndarray:
    """Float64 oracle of :func:`drtk_tpu.edge_grad_estimator` — see the
    module docstring. Mirrors the reference's ``edge_grad_estimator_ref``
    API (drtk/edge_grad_estimator.py:178-208). Requires x64 enabled."""
    if v_pix_img_hook is not None:
        raise NotImplementedError(
            "v_pix_img_hook is not supported in the JAX port; inspect "
            "gradients with jax.grad on v_pix_img instead"
        )
    from drtk_tpu.ops.rasterize import broadcast_vi

    vi = broadcast_vi(vi, v_pix.shape[0])
    return _core(
        v_pix, vi, jax.lax.stop_gradient(bary_img), img, index_img,
        float(max_dp_dr),
    )
