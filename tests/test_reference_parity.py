"""Full-pipeline gradient parity vs the PyTorch reference semantics.

This is the BASELINE contract test: "images & pixel/vertex grads allclose
<=1e-4 vs PyTorch reference". Both stacks get the *same* index_img (from our
rasterizer; the reference's rasterize output contract is pinned separately in
tests/test_rasterize.py) and run the canonical differentiable pipeline from
the reference's edge_grad_estimator docstring (drtk/edge_grad_estimator.py:
127-162):

    render -> interpolate(vt) -> grid_sample(tex) -> mask -> edge_grad

The torch side (tests/torch_oracle.py) is float64 and differentiated by
*torch autograd* through independently-written reference math, so agreement
checks every hand-written VJP (render's clamp-aware backward, interpolate's
scatter, edge_grad's CRD kernel) against an independent autodiff of the
reference formulas — a logic bug in a custom VJP cannot pass by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch as th

from drtk_tpu import (
    edge_grad_estimator,
    interpolate,
    rasterize,
    render,
)
from drtk_tpu.ops.grid_sample import grid_sample

from tests import torch_oracle as oracle
from tests.utils import grid_mesh, two_triangles_scene


def _jax_pipeline(v_pix, vi, vt, vti, tex, index_img, weight, max_dp_dr):
    mask = (index_img != -1)[:, None]

    def loss_fn(v_pix, vt, tex):
        depth, bary = render(v_pix, vi, index_img)
        vt_img = interpolate(vt, vti, index_img, bary)
        grid = jnp.moveaxis(vt_img, 1, -1) * 2.0 - 1.0
        img = grid_sample(
            tex, grid, mode="bilinear", padding_mode="border", align_corners=False
        )
        img = img * mask
        img = edge_grad_estimator(
            v_pix, vi, bary, img, index_img, max_dp_dr=max_dp_dr
        )
        return jnp.sum(img * weight), img

    (_, img), grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)(
        v_pix, vt, tex
    )
    return img, grads


def _scene_two_triangles(h=96, w=96):
    v, vi, _ = two_triangles_scene(h, w)
    rng = np.random.RandomState(3)
    vt = rng.uniform(0.05, 0.95, size=(1, v.shape[1], 2)).astype(np.float32)
    tex = rng.rand(1, 3, 32, 32).astype(np.float32)
    weight = rng.randn(1, 3, h, w).astype(np.float32)
    return v, vi, jnp.asarray(vt), vi, jnp.asarray(tex), jnp.asarray(weight)


def _scene_grid_mesh(h=80, w=80):
    v, vi = grid_mesh(h, w, gn=7, z0=5.0, z_amp=2.0, seed=5)
    rng = np.random.RandomState(11)
    vt = rng.uniform(0.05, 0.95, size=(1, v.shape[1], 2)).astype(np.float32)
    tex = rng.rand(1, 3, 32, 32).astype(np.float32)
    weight = rng.randn(1, 3, h, w).astype(np.float32)
    return v, vi, jnp.asarray(vt), vi, jnp.asarray(tex), jnp.asarray(weight)


def _run_both(scene, max_dp_dr, dtype):
    v, vi, vt, vti, tex, weight = scene
    v = v.astype(dtype)
    vt = vt.astype(dtype)
    tex = tex.astype(dtype)
    weight = weight.astype(dtype)

    index_img = rasterize(v, vi, height=weight.shape[2], width=weight.shape[3])
    img_j, (gv_j, gvt_j, gtex_j) = _jax_pipeline(
        v, vi, vt, vti, tex, index_img, weight, max_dp_dr
    )

    t = lambda x: th.from_numpy(np.asarray(x).copy())
    vi_t = t(vi)
    if vi_t.ndim == 2:
        vi_t = vi_t[None].expand(v.shape[0], -1, -1)
    # The discrete pix_in_tri coverage test runs in the pipeline dtype in the
    # shipped reference kernel; classify in the same precision so boundary
    # pixels don't legitimately flip between the stacks.
    classify_dtype = th.float32 if dtype == jnp.float32 else th.float64
    img_t, gv_t, gvt_t, gtex_t = oracle.pipeline_oracle(
        t(v), vi_t, t(vt), vi_t, t(tex), t(index_img).long(), t(weight),
        max_dp_dr, classify_dtype,
    )
    jax_out = (img_j, gv_j, gvt_j, gtex_j)
    torch_out = (img_t, gv_t, gvt_t, gtex_t)
    return [np.asarray(x) for x in jax_out], [x.numpy() for x in torch_out]


SCENES = {
    "two_triangles": _scene_two_triangles,
    "grid_mesh": _scene_grid_mesh,
}


@pytest.mark.parametrize("scene_name", list(SCENES))
@pytest.mark.parametrize("max_dp_dr", [1e4, 0.0])
def test_full_pipeline_parity_f64(scene_name, max_dp_dr):
    """float64 vs float64: pins the semantics to ~1e-9 — any drift in sign
    conventions, clamp sites, averaging rules, or classification fails."""
    jax_out, torch_out = _run_both(
        SCENES[scene_name](), max_dp_dr, jnp.float64
    )
    names = ["img", "grad_v_pix", "grad_vt", "grad_tex"]
    for name, a, b in zip(names, jax_out, torch_out):
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(
            a, b, rtol=1e-9, atol=1e-9 * scale, err_msg=f"{name} mismatch"
        )


@pytest.mark.parametrize("scene_name", list(SCENES))
def test_full_pipeline_parity_f32(scene_name):
    """float32 pipeline vs the float64 torch oracle: the BASELINE 1e-4
    contract as shipped (the reference's CUDA kernels are float32 against
    its float64 refs in exactly this way)."""
    jax_out, torch_out = _run_both(SCENES[scene_name](), 1e4, jnp.float32)
    names = ["img", "grad_v_pix", "grad_vt", "grad_tex"]
    for name, a, b in zip(names, jax_out, torch_out):
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(
            a, b, rtol=1e-4, atol=1e-4 * scale, err_msg=f"{name} mismatch"
        )


def test_intersection_and_silhouette_present():
    """The two-triangles scene must actually exercise the intersection
    (dp_dr z-path) and silhouette branches, otherwise the parity tests above
    prove less than they claim."""
    v, vi, _, _, _, weight = _scene_two_triangles()
    h, w = weight.shape[2], weight.shape[3]
    index_img = np.asarray(rasterize(v, vi, height=h, width=w))

    t = lambda x: th.from_numpy(np.asarray(x).copy())
    vi_t = t(vi)[None]
    pts = oracle._pix_triangles(t(v).double(), vi_t, t(index_img).long())
    valid = (t(index_img) >= 0)[..., None, None]
    pts = th.where(valid, pts, th.zeros_like(pts))

    ci = t(index_img)[:, : h - 1, : w - 1]
    ri = t(index_img)[:, : h - 1, 1:]
    ys = th.arange(h - 1, dtype=th.float64)[None, :, None]
    xs = th.arange(w - 1, dtype=th.float64)[None, None, :]
    both = (ci >= 0) & (ri >= 0) & (ci != ri)
    c_in_r = both & oracle._pix_in_tri(pts[:, : h - 1, 1:, :, :2], xs, ys)
    r_in_c = both & oracle._pix_in_tri(pts[:, : h - 1, : w - 1, :, :2], xs + 1, ys)

    n_int = int((c_in_r & r_in_c).sum())
    n_sil = int(((ci >= 0) != (ri >= 0)).sum())
    assert n_int > 0, "no intersection pixels - scene too weak"
    assert n_sil > 0, "no silhouette pixels - scene too weak"


def test_render_interpolate_grads_vs_torch_autograd():
    """render + interpolate only (no edge_grad): vertex/attr/bary grads from
    the hand-written VJPs vs torch autograd through the f64 reference math,
    on a random-ish connected mesh."""
    v, vi, vt, vti, tex, weight = _scene_grid_mesh()
    h, w = weight.shape[2], weight.shape[3]
    index_img = rasterize(v, vi, height=h, width=w)
    wub = jnp.asarray(np.random.RandomState(7).randn(1, 2, h, w))

    def loss_j(v, vt):
        _, bary = render(v, vi, index_img)
        vt_img = interpolate(vt, vti, index_img, bary)
        return jnp.sum(vt_img * wub)

    gv_j, gvt_j = jax.grad(loss_j, argnums=(0, 1))(
        v.astype(jnp.float64), vt.astype(jnp.float64)
    )

    t = lambda x: th.from_numpy(np.asarray(x).copy())
    v_t = t(v).double().requires_grad_(True)
    vt_t = t(vt).double().requires_grad_(True)
    vi_t = t(vi)[None]
    _, bary_t = oracle.render_oracle(v_t, vi_t, t(index_img).long())
    vt_img_t = oracle.interpolate_oracle(vt_t, vi_t, t(index_img).long(), bary_t)
    (vt_img_t * t(wub)).sum().backward()

    np.testing.assert_allclose(
        np.asarray(gv_j), v_t.grad.numpy(), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(gvt_j), vt_t.grad.numpy(), rtol=1e-9, atol=1e-12
    )


def test_autocast_f32_cast_through():
    """f16/bf16 inputs compute — and return — float32, the JAX analogue of
    the reference's Autocast registrations on every op module (fp32
    cached_cast, e.g. render_module.cpp:81-99, edge_grad_module.cpp:189-197,
    msi_module.cpp:145-171): a bf16 pipeline produces exactly the f32
    pipeline's results."""
    import drtk_tpu as dt
    from drtk_tpu.ops.grid_sample import grid_sample

    h = w = 48
    rng = np.random.RandomState(5)
    v32 = jnp.asarray(
        np.concatenate(
            [rng.uniform(0, 48, (1, 12, 2)), rng.uniform(3, 9, (1, 12, 1))],
            -1,
        ).astype(np.float32)
    )
    # Round to bf16-exact values so the bf16 run IS the f32 run after cast.
    v32 = v32.astype(jnp.bfloat16).astype(jnp.float32)
    vi = jnp.asarray(rng.randint(0, 12, (8, 3)).astype(np.int32))
    tex32 = jnp.asarray(
        rng.rand(1, 3, 16, 16).astype(np.float32)
    ).astype(jnp.bfloat16).astype(jnp.float32)
    vt32 = jnp.asarray(rng.rand(1, 12, 2).astype(np.float32)).astype(
        jnp.bfloat16
    ).astype(jnp.float32)

    def pipe(v, vt, tex):
        idx = dt.rasterize(v, vi, h, w)
        depth, bary = dt.render(v, vi, idx)
        vt_img = dt.interpolate(vt, vi, idx, bary)
        uv = jnp.moveaxis(vt_img, 1, -1) * 2.0 - 1.0
        img = grid_sample(tex, uv, padding_mode="border")
        img = img * (idx != -1)[:, None]
        return dt.edge_grad_estimator(
            v_pix=v, vi=vi, bary_img=bary, img=img, index_img=idx
        )

    out32 = pipe(v32, vt32, tex32)
    out_bf = pipe(
        v32.astype(jnp.bfloat16), vt32.astype(jnp.bfloat16),
        tex32.astype(jnp.bfloat16),
    )
    assert out_bf.dtype == jnp.float32, "autocast must return float32"
    np.testing.assert_array_equal(np.asarray(out_bf), np.asarray(out32))

    # texture ops
    grid = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 2)).astype(np.float32))
    grid = grid.astype(jnp.bfloat16).astype(jnp.float32)
    sc32 = dt.grid_scatter(tex32, grid, 16, 16)
    sc_bf = dt.grid_scatter(tex32.astype(jnp.bfloat16),
                            grid.astype(jnp.bfloat16), 16, 16)
    assert sc_bf.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(sc_bf), np.asarray(sc32))

    msi_tex = jnp.asarray(rng.rand(4, 4, 8, 16).astype(np.float32))
    msi_tex = msi_tex.astype(jnp.bfloat16).astype(jnp.float32)
    rd = jnp.asarray(
        np.array([[0.0, 0.0, 1.0], [0.6, 0.0, 0.8]], np.float32)
    ).astype(jnp.bfloat16).astype(jnp.float32)  # bf16-exact directions
    ro = jnp.zeros((2, 3), jnp.float32)
    m32 = dt.msi(ro, rd, msi_tex)
    m_bf = dt.msi(ro.astype(jnp.bfloat16), rd.astype(jnp.bfloat16),
                  msi_tex.astype(jnp.bfloat16))
    assert m_bf.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(m_bf), np.asarray(m32))

    levels = [tex32, tex32[:, :, ::2, ::2]]
    uvg = grid.reshape(1, 16, 16, 2)
    dxdy = jnp.full((1, 16, 16, 2, 2), 0.125, jnp.float32)
    mm32 = dt.mipmap_grid_sample(levels, uvg, dxdy, max_aniso=2)
    mm_bf = dt.mipmap_grid_sample(
        [l.astype(jnp.bfloat16) for l in levels],
        uvg.astype(jnp.bfloat16), dxdy.astype(jnp.bfloat16), max_aniso=2,
    )
    assert mm_bf.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(mm_bf), np.asarray(mm32))
