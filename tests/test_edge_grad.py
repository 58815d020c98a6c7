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
