"""edge_grad_estimator(): identity forward, discontinuity gradients, and the
two-triangles inverse-rendering convergence test (the reference's integration
test, test/two_triangles.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import drtk_tpu as dt

from .utils import two_triangles_scene


def _render_colored(v, vi, colors, h, w):
    idx = dt.rasterize(v, vi, h, w)
    _, bary = dt.render(v, vi, idx)
    img = dt.interpolate(colors, vi, idx, bary)
    img = img * (idx != -1)[:, None]
    return img, idx, bary


def test_identity_forward_and_img_grad_passthrough():
    v, vi, _ = two_triangles_scene(64, 64)
    colors = jnp.ones((1, 6, 3))
    img, idx, bary = _render_colored(v, vi, colors, 64, 64)

    out = dt.edge_grad_estimator(v, vi, bary, img, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))

    # Upstream gradient passes through to img unchanged.
    w = jax.random.normal(jax.random.PRNGKey(0), img.shape)

    def loss(img):
        return jnp.sum(dt.edge_grad_estimator(v, vi, bary, img, idx) * w)

    g = jax.grad(loss)(img)
    np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6)


def test_silhouette_gradient_direction():
    # A white triangle on black background; target = the same triangle
    # shifted right. The x-gradient on the vertices must point right
    # (negative gradient for gradient descent).
    h = w = 64
    vi = jnp.array([[0, 1, 2]], jnp.int32)
    colors = jnp.ones((1, 3, 1))

    def make(shift):
        return jnp.array(
            [[[16.0 + shift, 16.0, 5.0], [48.0 + shift, 20.0, 5.0],
              [30.0 + shift, 52.0, 5.0]]]
        )

    v0 = make(0.0)
    img_t, _, _ = _render_colored(make(3.0), vi, colors, h, w)

    def loss(v):
        img, idx, bary = _render_colored(v, vi, colors, h, w)
        img = dt.edge_grad_estimator(v, vi, bary, img, idx)
        return jnp.mean((img - img_t) ** 2)

    g = jax.grad(loss)(v0)
    # all three vertices should be pushed in +x (grad < 0)
    assert bool(jnp.all(g[0, :, 0] < 0.0)), np.asarray(g)
    # y-gradient should be comparatively small
    assert float(jnp.abs(g[0, :, 1]).max()) < float(jnp.abs(g[0, :, 0]).min())


def test_z_gradient_at_intersections():
    # Two overlapping triangles at different depths (the two-triangles
    # scene): intersection pixels generate z gradients (the dp_dr path,
    # edge_grad_kernel.cu:394-423).
    v, vi, _ = two_triangles_scene(64, 64)
    colors = jnp.concatenate(
        [jnp.ones((1, 3, 3)), jnp.full((1, 3, 3), 0.3)], axis=1
    )
    img_t, _, _ = _render_colored(v, vi, colors, 64, 64)
    v_shift = v.at[0, 3:, 2].add(30.0)

    def loss(v):
        img, idx, bary = _render_colored(v, vi, colors, 64, 64)
        img = dt.edge_grad_estimator(v, vi, bary, img, idx)
        return jnp.mean((img - img_t) ** 2)

    g = jax.grad(loss)(v_shift)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g[0, :, 2]).max()) > 0.0


def test_max_dp_dr_clamp_keeps_grads_finite():
    # Nearly coplanar intersecting triangles: without clamping dp_dr blows
    # up; with the default clamp gradients stay bounded.
    v = jnp.array(
        [
            [
                [10.0, 10.0, 5.0],
                [50.0, 12.0, 5.0],
                [30.0, 50.0, 5.0],
                [10.0, 12.0, 5.0001],
                [50.0, 10.0, 5.0],
                [30.0, 48.0, 5.0001],
            ]
        ]
    )
    vi = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
    colors = jnp.concatenate([jnp.ones((1, 3, 1)), jnp.zeros((1, 3, 1))], axis=1)

    def loss(v, max_dp_dr):
        img, idx, bary = _render_colored(v, vi, colors, 64, 64)
        img = dt.edge_grad_estimator(v, vi, bary, img, idx, max_dp_dr=max_dp_dr)
        return jnp.mean(img**2)

    g = jax.grad(loss)(v, 1e4)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) < 1e3


def test_two_triangles_convergence():
    """Inverse rendering: perturb vertices, optimize back with Adam
    (test/two_triangles.py:40-86 of the reference, reduced size)."""
    h = w = 128
    v_gt, vi, _ = two_triangles_scene(h, w)
    colors = jnp.concatenate(
        [jnp.ones((1, 3, 3)), jnp.full((1, 3, 3), 0.5)], axis=1
    )
    img_gt, _, _ = _render_colored(v_gt, vi, colors, h, w)

    key = jax.random.PRNGKey(10)
    v = v_gt + jax.random.normal(key, v_gt.shape) * 5.0

    def loss_fn(v):
        img, idx, bary = _render_colored(v, vi, colors, h, w)
        img = dt.edge_grad_estimator(v, vi, bary, img, idx)
        return jnp.mean((img - img_gt) ** 2)

    opt = optax.adam(1e-1, b1=0.9, b2=0.999)
    state = opt.init(v)

    @jax.jit
    def step(v, state):
        l, g = jax.value_and_grad(loss_fn)(v)
        updates, state = opt.update(g, state)
        return optax.apply_updates(v, updates), state, l

    l0 = float(loss_fn(v))
    for _ in range(300):
        v, state, l = step(v, state)
    l_final = float(l)
    assert l_final < l0 / 10, f"loss did not converge: {l0} -> {l_final}"


def test_ref_oracle_matches_op():
    """edge_grad_estimator_ref (the independent in-package float64 oracle,
    drtk_tpu/ops/edge_grad_ref.py) must reproduce the op's v_pix gradients:
    different coverage/dp_dr code, autodiff pixel->vertex reduction vs the
    op's binned-matmul — agreement pins both to the kernel semantics."""
    from drtk_tpu.ops.grid_sample import grid_sample

    h = w = 96
    v, vi, _ = two_triangles_scene(h, w, dtype=jnp.float64)
    rng = np.random.RandomState(3)
    vt = jnp.asarray(rng.uniform(0.05, 0.95, (1, v.shape[1], 2)))
    tex = jnp.asarray(rng.rand(1, 3, 32, 32))
    weight = jnp.asarray(rng.randn(1, 3, h, w))

    def make_loss(eg):
        def loss(v):
            idx = dt.rasterize(v, vi, h, w)
            _, bary = dt.render(v, vi, idx)
            vt_img = dt.interpolate(vt, vi, idx, bary)
            uv = jnp.moveaxis(vt_img, 1, -1) * 2.0 - 1.0
            img = grid_sample(
                tex, uv, mode="bilinear", padding_mode="border",
                align_corners=False,
            )
            img = img * (idx != -1)[:, None]
            img = eg(v_pix=v, vi=vi, bary_img=bary, img=img, index_img=idx)
            return jnp.sum(img * weight)

        return loss

    g_op = jax.jit(jax.grad(make_loss(dt.edge_grad_estimator)))(v)
    g_rf = jax.jit(jax.grad(make_loss(dt.edge_grad_estimator_ref)))(v)
    scale = max(float(jnp.abs(g_rf).max()), 1e-6)
    np.testing.assert_allclose(
        np.asarray(g_op), np.asarray(g_rf), rtol=1e-9, atol=1e-9 * scale
    )


def test_edge_grad_image_is_the_hook_observable():
    """edge_grad_image (the v_pix_img_hook replacement) must be exactly the
    image-space cotangent the estimator's backward reduces to vertices:
    reducing it through the reference's own route — interpolate's VJP with
    bary detached (edge_grad_estimator.py:168-175) — reproduces
    grad(v_pix) from the estimator."""
    from drtk_tpu.ops.edge_grad import edge_grad_image

    h = w = 64
    v, vi, _ = two_triangles_scene(h, w)
    colors = jnp.asarray(
        np.random.RandomState(0).rand(1, v.shape[1], 3).astype(np.float32)
    )
    img, idx, bary = _render_colored(v, vi, colors, h, w)
    weight = jax.random.normal(jax.random.PRNGKey(2), img.shape)

    def loss(v_pix):
        out = dt.edge_grad_estimator(v_pix, vi, bary, img, idx)
        return jnp.sum(out * weight)

    g_est = jax.jit(jax.grad(loss))(v)

    g_img = jax.jit(edge_grad_image)(v, vi, img, idx, weight)
    vi_b = jnp.broadcast_to(vi[None], (1,) + vi.shape)

    def reduce_to_verts(v_pix):
        v_img = dt.interpolate(v_pix, vi_b, idx, jax.lax.stop_gradient(bary))
        mask = (idx != -1)[:, None].astype(v_img.dtype)
        return jnp.sum(v_img * mask * g_img)

    g_red = jax.jit(jax.grad(reduce_to_verts))(v)
    np.testing.assert_allclose(
        np.asarray(g_est), np.asarray(g_red), rtol=1e-5, atol=1e-6
    )
