"""Pure-torch (CPU, float64) oracle of the reference pipeline for parity tests.

This is a test-only, independent reimplementation of the *semantics* of the
PyTorch reference (facebookresearch/DRTK), used to prove the BASELINE
contract "images & pixel/vertex grads allclose <=1e-4 vs PyTorch reference":

* ``render_oracle``       — drtk/render.py:61-131 (``render_ref``), float64
  perspective-correct barycentrics, differentiable by torch autograd (so the
  JAX custom VJP is checked against torch's autodiff of the same math).
* ``interpolate_oracle``  — drtk/interpolate.py:195-263 (``interpolate_ref``),
  including the -1..1 background sweep convention.
* ``EdgeGradOracle``      — the edge_grad backward *CUDA kernel* semantics
  (src/edge_grad/edge_grad_kernel.cu:219-449): CRD stencil, overlap /
  intersection / adjacency classification with the kernel's exact
  ``pix_in_tri`` (>=0 coverage + top-left rule, kernel.cu:30-70), and
  ``get_dp_dr`` with the ``max_dp_dr`` clamp (kernel.cu:102-203).

  Note: the reference also ships a pure-python ``EdgeGradEstimatorFunction``
  (drtk/edge_grad_estimator.py:210-449); its interior test builds the pixel
  grid with ``th.meshgrid(arange(H), arange(W))`` (indexing='ij') and then
  uses the first grid as the *x* coordinate — i.e. it tests the transposed
  point — and it does not exclude the "adjacent" edge class the CUDA kernel
  excludes (kernel.cu:338-341, 392-393). The shipped behaviour of the
  reference is the CUDA kernel, so parity here is pinned to the kernel
  semantics.

Everything runs on CPU in float64. Tensors in, tensors out; no JAX imports.
"""

from __future__ import annotations

from typing import Optional, Tuple

import torch as th
import torch.nn.functional as thf


def _epsclamp(x: th.Tensor, eps: float = 1e-16) -> th.Tensor:
    """Sign-preserving clamp away from zero (cuda_math_helper.h:1036-1059)."""
    return th.where(x < 0, x.clamp(max=-eps), x.clamp(min=eps))


def _pix_triangles(v: th.Tensor, vi: th.Tensor, index_img: th.Tensor) -> th.Tensor:
    """Per-pixel triangle vertices [N, H, W, 3(corner), 3(xyz)].

    Background pixels read face 0 (callers mask); matches the reference's
    clamp(min=0) gather convention.
    """
    n = v.shape[0]
    iimg = index_img.clamp(min=0).long()
    out = []
    for i in range(n):
        vi_img = vi[i][iimg[i]].long()  # [H, W, 3]
        out.append(v[i][vi_img])  # [H, W, 3, 3]
    return th.stack(out)


def render_oracle(
    v: th.Tensor, vi: th.Tensor, index_img: th.Tensor
) -> Tuple[th.Tensor, th.Tensor]:
    """Perspective-correct depth/bary images; float64, differentiable.

    Mirrors render_ref (drtk/render.py:61-131): 2-D barycentrics from edge
    cross products over an epsclamped determinant, then perspective
    correction ``bary_i = (lambda_i / z_i) * depth`` with
    ``depth = 1 / epsclamp(sum_i lambda_i / z_i)``.
    """
    v = v.double()
    n, h, w = index_img.shape
    mask = (index_img != -1).double()[:, None]

    pts = _pix_triangles(v, vi, index_img)  # [N,H,W,3,3]
    p0, p1, p2 = pts[..., 0, :], pts[..., 1, :], pts[..., 2, :]
    e01 = p1 - p0
    e02 = p2 - p0
    e12 = p2 - p1

    det = _epsclamp(e01[..., 0] * e02[..., 1] - e01[..., 1] * e02[..., 0])

    ys = th.arange(h, dtype=th.float64)[None, :, None]
    xs = th.arange(w, dtype=th.float64)[None, None, :]
    d0x, d0y = xs - p0[..., 0], ys - p0[..., 1]
    d1x, d1y = xs - p1[..., 0], ys - p1[..., 1]

    lam0 = (d1y * e12[..., 0] - d1x * e12[..., 1]) / det
    lam1 = (d0x * e02[..., 1] - d0y * e02[..., 0]) / det
    lam2 = (d0y * e01[..., 0] - d0x * e01[..., 1]) / det

    w0 = lam0 / _epsclamp(p0[..., 2])
    w1 = lam1 / _epsclamp(p1[..., 2])
    w2 = lam2 / _epsclamp(p2[..., 2])
    depth = 1.0 / _epsclamp(w0 + w1 + w2)

    bary = th.stack([w0, w1, w2], dim=1) * depth[:, None] * mask
    return depth * mask[:, 0], bary


def interpolate_oracle(
    attrs: th.Tensor, vi: th.Tensor, index_img: th.Tensor, bary_img: th.Tensor
) -> th.Tensor:
    """Barycentric attribute interpolation; float64, differentiable.

    Mirrors interpolate_ref (drtk/interpolate.py:195-263) including the
    deterministic -1..1 x/y sweep written to background pixels (which the
    reference CUDA kernel emits at interpolate_kernel.cu:104-109).
    """
    attrs = attrs.double()
    bary_img = bary_img.double()
    n, h, w = index_img.shape
    c = attrs.shape[-1]
    iimg = index_img.clamp(min=0).long()

    per_im = []
    for i in range(n):
        vi_img = vi[i][iimg[i]].long()  # [H, W, 3]
        corner_attrs = attrs[i][vi_img]  # [H, W, 3, C]
        b = bary_img[i].permute(1, 2, 0)  # [H, W, 3]
        per_im.append((corner_attrs * b[..., None]).sum(dim=-2))  # [H, W, C]
    out = th.stack(per_im)  # [N, H, W, C]

    sweep_x = (th.arange(w, dtype=th.float64) * 2.0 + 1.0) / w - 1.0
    sweep_y = (th.arange(h, dtype=th.float64) * 2.0 + 1.0) / h - 1.0
    sweep = th.stack(
        [sweep_x[None, :].expand(h, w), sweep_y[:, None].expand(h, w)], dim=-1
    )
    sweep = sweep.tile(1, 1, (c + 1) // 2)[..., :c]
    bg = index_img == -1
    out = th.where(bg[..., None], sweep[None], out)
    return out.permute(0, 3, 1, 2)


def _pix_in_tri(
    pts: th.Tensor, px: th.Tensor, py: th.Tensor, dtype: th.dtype = th.float64
) -> th.Tensor:
    """Coverage of point (px, py) by triangles ``pts`` [..., 3, 2]: >=0 edge
    functions in canonical vertex order plus the top-left fill rule
    (edge_grad_kernel.cu:30-70). Degenerate triangles cover nothing.

    ``dtype`` selects the precision of the coverage arithmetic: the shipped
    reference kernel classifies in the pipeline dtype (scalar_t), so parity
    tests of a float32 pipeline pass float32 here — the classification is
    discrete and pixels near an edge legitimately flip between precisions.
    """
    pts = pts.to(dtype)
    px = px.to(dtype)
    py = py.to(dtype)
    p0, p1, p2 = pts[..., 0, :], pts[..., 1, :], pts[..., 2, :]
    e01 = p1 - p0
    e02 = p2 - p0
    e12 = p2 - p1
    den = e01[..., 0] * e02[..., 1] - e01[..., 1] * e02[..., 0]
    s = th.sign(den)

    w0 = ((py - p1[..., 1]) * e12[..., 0] - (px - p1[..., 0]) * e12[..., 1]) * s
    w1 = ((px - p0[..., 0]) * e02[..., 1] - (py - p0[..., 1]) * e02[..., 0]) * s
    w2 = ((py - p0[..., 1]) * e01[..., 0] - (px - p0[..., 0]) * e01[..., 1]) * s

    def top_left(e, flip):
        a = (e[..., 1] < 0) | ((e[..., 1] == 0) & (e[..., 0] > 0))
        b = (e[..., 1] > 0) | ((e[..., 1] == 0) & (e[..., 0] < 0))
        if flip:
            a, b = b, a
        return th.where(den > 0, a, b)

    covered = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
    boundary_reject = (
        ((w0 == 0) & ~top_left(e12, False))
        | ((w1 == 0) & ~top_left(e02, True))
        | ((w2 == 0) & ~top_left(e01, False))
    )
    return covered & ~boundary_reject & (den != 0)


def _tri_normals(pts: th.Tensor) -> th.Tensor:
    """normalize(cross(p0 - p2, p1 - p0)) per pixel (kernel.cu:89-100)."""
    p0, p1, p2 = pts[..., 0, :], pts[..., 1, :], pts[..., 2, :]
    return thf.normalize(th.cross(p0 - p2, p1 - p0, dim=-1), dim=-1)


def _dp_dr(n_var: th.Tensor, n_fix: th.Tensor, max_dp_dr: float) -> th.Tensor:
    """get_dp_dr (edge_grad_kernel.cu:102-203): ∂p/∂r in a 2-D plane from
    the varying/fixed projected normals, magnitude-clamped to max_dp_dr."""
    n_var = thf.normalize(n_var, dim=-1)
    n_fix = thf.normalize(n_fix, dim=-1)
    bx, by = -n_fix[..., 1], n_fix[..., 0]
    d = bx * n_var[..., 0] + by * n_var[..., 1]
    if max_dp_dr > 0:
        sgn = th.where(d >= 0, th.ones_like(d), -th.ones_like(d))
        d = sgn * th.maximum(d.abs(), bx.abs() / max_dp_dr)
    return (bx / _epsclamp(d, 1e-8))[..., None] * n_var


def edge_grad_image_grad(
    v_pix: th.Tensor,
    vi: th.Tensor,
    img: th.Tensor,
    index_img: th.Tensor,
    grad_output: th.Tensor,
    max_dp_dr: float,
    classify_dtype: th.dtype = th.float64,
) -> th.Tensor:
    """grad w.r.t. v_pix_img, [N, 3, H, W] — the CUDA backward kernel
    (edge_grad_kernel.cu:219-449) as vectorized float64 torch.

    ``classify_dtype``: precision of the discrete pix_in_tri coverage test
    (see :func:`_pix_in_tri`).
    """
    img = img.double()
    grad_output = grad_output.double()
    n, _, h, w = img.shape
    sh, sw = h - 1, w - 1

    ci = index_img[:, :sh, :sw]
    ri = index_img[:, :sh, 1:]
    di = index_img[:, 1:, :sw]
    c_ok, r_ok, d_ok = ci >= 0, ri >= 0, di >= 0
    lr = ci != ri
    ud = ci != di

    pts = _pix_triangles(v_pix.double(), vi, index_img)  # [N,H,W,3,3]
    valid = (index_img >= 0)[..., None, None]
    pts = th.where(valid, pts, th.zeros_like(pts))
    nrm = _tri_normals(pts)

    pts_c, nrm_c = pts[:, :sh, :sw], nrm[:, :sh, :sw]
    pts_r, nrm_r = pts[:, :sh, 1:], nrm[:, :sh, 1:]
    pts_d, nrm_d = pts[:, 1:, :sw], nrm[:, 1:, :sw]

    ys = th.arange(sh, dtype=th.float64)[None, :, None]
    xs = th.arange(sw, dtype=th.float64)[None, None, :]

    cd = classify_dtype
    c_in_r = lr & c_ok & r_ok & _pix_in_tri(pts_r[..., :2], xs, ys, cd)
    r_in_c = lr & c_ok & r_ok & _pix_in_tri(pts_c[..., :2], xs + 1, ys, cd)
    c_in_d = ud & c_ok & d_ok & _pix_in_tri(pts_d[..., :2], xs, ys, cd)
    d_in_c = ud & c_ok & d_ok & _pix_in_tri(pts_c[..., :2], xs, ys + 1, cd)

    h_int = c_in_r & r_in_c
    v_int = c_in_d & d_in_c
    h_adj = lr & c_ok & r_ok & ~c_in_r & ~r_in_c
    v_adj = ud & c_ok & d_ok & ~c_in_d & ~d_in_c

    gx = (
        (img[:, :, :sh, 1:] - img[:, :, :sh, :sw])
        * 0.5
        * (grad_output[:, :, :sh, 1:] + grad_output[:, :, :sh, :sw])
    ).sum(1) * lr
    gy = (
        (img[:, :, 1:, :sw] - img[:, :, :sh, :sw])
        * 0.5
        * (grad_output[:, :, 1:, :sw] + grad_output[:, :, :sh, :sw])
    ).sum(1) * ud

    zeros = th.zeros_like(gx)
    gc = th.zeros((n, sh, sw, 3), dtype=th.float64)
    gr = th.zeros_like(gc)
    gd = th.zeros_like(gc)

    # horizontal pairs
    keep_c = ~h_int & ~(~c_ok | (r_in_c & ~c_in_r) | h_adj)
    keep_r = ~h_int & ~(~r_ok | (c_in_r & ~r_in_c) | h_adj)
    gc[..., 0] += th.where(keep_c, gx, zeros)
    gr[..., 0] += th.where(keep_r, gx, zeros)
    dp = _dp_dr(nrm_c[..., [0, 2]], nrm_r[..., [0, 2]], max_dp_dr)
    gc[..., 0] += th.where(h_int, gx * dp[..., 0], zeros)
    gc[..., 2] += th.where(h_int, gx * dp[..., 1], zeros)
    dp = _dp_dr(nrm_r[..., [0, 2]], nrm_c[..., [0, 2]], max_dp_dr)
    gr[..., 0] += th.where(h_int, gx * dp[..., 0], zeros)
    gr[..., 2] += th.where(h_int, gx * dp[..., 1], zeros)

    # vertical pairs
    keep_c = ~v_int & ~(~c_ok | (d_in_c & ~c_in_d) | v_adj)
    keep_d = ~v_int & ~(~d_ok | (c_in_d & ~d_in_c) | v_adj)
    gc[..., 1] += th.where(keep_c, gy, zeros)
    gd[..., 1] += th.where(keep_d, gy, zeros)
    dp = _dp_dr(nrm_c[..., [1, 2]], nrm_d[..., [1, 2]], max_dp_dr)
    gc[..., 1] += th.where(v_int, gy * dp[..., 0], zeros)
    gc[..., 2] += th.where(v_int, gy * dp[..., 1], zeros)
    dp = _dp_dr(nrm_d[..., [1, 2]], nrm_c[..., [1, 2]], max_dp_dr)
    gd[..., 1] += th.where(v_int, gy * dp[..., 0], zeros)
    gd[..., 2] += th.where(v_int, gy * dp[..., 1], zeros)

    out = th.zeros((n, h, w, 3), dtype=th.float64)
    out[:, :sh, :sw] -= gc
    out[:, :sh, 1:] -= gr
    out[:, 1:, :sw] -= gd
    return out.permute(0, 3, 1, 2)


class EdgeGradOracle(th.autograd.Function):
    """Identity on img; backward injects the discontinuity gradient into
    v_pix_img (whence torch autograd carries it to v_pix through
    interpolate_oracle's graph, the reference's indirection at
    drtk/edge_grad_estimator.py:168-175)."""

    @staticmethod
    def forward(ctx, v_pix_img, v_pix, vi, img, index_img, max_dp_dr,
                classify_dtype):
        ctx.save_for_backward(v_pix, vi, img, index_img)
        ctx.max_dp_dr = max_dp_dr
        ctx.classify_dtype = classify_dtype
        return img

    @staticmethod
    def backward(ctx, grad_output):
        v_pix, vi, img, index_img = ctx.saved_tensors
        g = edge_grad_image_grad(
            v_pix, vi, img, index_img, grad_output, ctx.max_dp_dr,
            ctx.classify_dtype,
        )
        # background pixels contribute nothing through interpolate's VJP
        g = g * (index_img != -1)[:, None]
        return (g.to(grad_output.dtype), None, None, grad_output, None, None,
                None)


def edge_grad_oracle(
    v_pix: th.Tensor,
    vi: th.Tensor,
    bary_img: th.Tensor,
    img: th.Tensor,
    index_img: th.Tensor,
    max_dp_dr: float = 1e4,
    classify_dtype: th.dtype = th.float64,
) -> th.Tensor:
    v_pix_img = interpolate_oracle(v_pix, vi, index_img, bary_img.detach())
    return EdgeGradOracle.apply(
        v_pix_img, v_pix, vi, img, index_img, max_dp_dr, classify_dtype
    )


def pipeline_oracle(
    v_pix: th.Tensor,
    vi: th.Tensor,
    vt: th.Tensor,
    vti: th.Tensor,
    tex: th.Tensor,
    index_img: th.Tensor,
    weight: th.Tensor,
    max_dp_dr: float = 1e4,
    classify_dtype: th.dtype = th.float64,
) -> Tuple[th.Tensor, th.Tensor, th.Tensor, th.Tensor]:
    """Full reference pipeline (the edge_grad_estimator docstring example,
    drtk/edge_grad_estimator.py:127-162) in float64 torch, returning
    (img, grad_v_pix, grad_vt, grad_tex) for loss = sum(img * weight)."""
    v_pix = v_pix.double().clone().requires_grad_(True)
    vt = vt.double().clone().requires_grad_(True)
    tex = tex.double().clone().requires_grad_(True)

    depth, bary = render_oracle(v_pix, vi, index_img)
    vt_img = interpolate_oracle(vt, vti, index_img, bary)
    img = thf.grid_sample(
        tex,
        vt_img.permute(0, 2, 3, 1) * 2.0 - 1.0,
        mode="bilinear",
        padding_mode="border",
        align_corners=False,
    )
    img = img * (index_img != -1)[:, None]
    img = edge_grad_oracle(
        v_pix, vi, bary, img, index_img, max_dp_dr, classify_dtype
    )
    loss = (img * weight.double()).sum()
    loss.backward()
    return img.detach(), v_pix.grad, vt.grad, tex.grad
