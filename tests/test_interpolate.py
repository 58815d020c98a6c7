"""interpolate(): oracle parity, background sweep, VJP vs finite differences,
and the sparse interpolation/normal matrices."""

import jax
import jax.numpy as jnp
import numpy as np

import drtk_tpu as dt
from drtk_tpu.ops.interpolate import _sweep_pattern

from .utils import assert_allclose, grid_mesh, random_mesh


def _setup(key=0, c=5, h=48, w=48):
    v, vi = grid_mesh(h=h, w=w)
    idx = dt.rasterize(v, vi, h, w)
    _, bary = dt.render(v, vi, idx)
    attrs = jax.random.normal(jax.random.PRNGKey(key), (1, v.shape[1], c))
    return v, vi, idx, bary, attrs.astype(jnp.float32)


def test_forward_matches_f64_oracle():
    _, vi, idx, bary, attrs = _setup()
    out = dt.interpolate(attrs, vi, idx, bary)
    out_ref = dt.interpolate_ref(attrs, vi, idx, bary)
    assert_allclose(out, out_ref, rtol=1e-4, atol=1e-4)


def test_background_sweep_pattern():
    """Background pixels carry the deterministic -1..1 x/y sweep
    (interpolate_kernel.cu:104-109)."""
    _, vi, idx, bary, attrs = _setup(c=3, h=32, w=32)
    out = dt.interpolate(attrs, vi, idx, bary)
    sweep = _sweep_pattern(32, 32, 3, out.dtype)
    bg = idx[0] == -1
    assert bool(bg.any())
    for ch in range(3):
        got = np.asarray(out[0, ch])[np.asarray(bg)]
        want = np.asarray(sweep[ch])[np.asarray(bg)]
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_grads_match_finite_differences():
    v, vi, idx, bary, attrs = _setup(c=2, h=32, w=32)
    attrs = attrs.astype(jnp.float64)
    bary = bary.astype(jnp.float64)
    wkey = jax.random.PRNGKey(7)
    wout = jax.random.normal(wkey, (1, 2, 32, 32), jnp.float64)

    def loss(attrs, bary):
        return jnp.sum(dt.interpolate(attrs, vi, idx, bary) * wout)

    ga, gb = jax.grad(loss, argnums=(0, 1))(attrs, bary)

    eps = 1e-6
    rng = np.random.RandomState(1)
    for _ in range(8):
        i = rng.randint(attrs.shape[1])
        c = rng.randint(attrs.shape[2])
        d = jnp.zeros_like(attrs).at[0, i, c].set(eps)
        fd = (loss(attrs + d, bary) - loss(attrs - d, bary)) / (2 * eps)
        np.testing.assert_allclose(float(ga[0, i, c]), float(fd), rtol=1e-4, atol=1e-7)
    fg = np.argwhere(np.asarray(idx[0]) != -1)
    for _ in range(8):
        y, x = fg[rng.randint(len(fg))]
        b = rng.randint(3)
        d = jnp.zeros_like(bary).at[0, b, y, x].set(eps)
        fd = (loss(attrs, bary + d) - loss(attrs, bary - d)) / (2 * eps)
        np.testing.assert_allclose(float(gb[0, b, y, x]), float(fd), rtol=1e-4, atol=1e-7)


def test_background_gets_zero_bary_grad():
    _, vi, idx, bary, attrs = _setup(c=2, h=32, w=32)

    def loss(bary):
        return jnp.sum(dt.interpolate(attrs, vi, idx, bary) ** 2)

    g = jax.grad(loss)(bary)
    bg = (idx == -1)[:, None]
    assert float(jnp.abs(jnp.where(bg, g, 0.0)).max()) == 0.0


def test_interpolation_matrix_matvec_matches_interpolate():
    v, vi, idx, bary, attrs = _setup(c=4, h=32, w=32)
    a = dt.interpolation_matrix(vi, idx, bary, num_vertices=v.shape[1])
    out_mat = a.matvec(attrs).reshape(1, 32, 32, 4)
    out_img = jnp.moveaxis(dt.interpolate(attrs, vi, idx, bary), 1, -1)
    fg = (idx != -1)[..., None]
    assert_allclose(
        jnp.where(fg, out_mat, 0.0), jnp.where(fg, out_img, 0.0), rtol=1e-5, atol=1e-5
    )
    # columns sorted within each row
    cols = np.asarray(a.cols)[np.asarray(a.row_valid)]
    assert (np.diff(cols, axis=-1) >= 0).all()


def test_normal_matrix_equals_ata():
    v, vi, idx, bary, _ = _setup(h=24, w=24)
    nv = v.shape[1]
    a = dt.interpolation_matrix(vi, idx, bary, num_vertices=nv)
    ata = jnp.einsum("npi,npj->nij", a.todense(), a.todense())
    nm = dt.interpolation_normal_matrix(vi, idx, bary, num_vertices=nv)
    assert_allclose(nm.todense(), ata, rtol=1e-4, atol=1e-4)
    # matvec agrees with the dense product
    x = jax.random.normal(jax.random.PRNGKey(3), (1, nv, 2), jnp.float32)
    assert_allclose(nm.matvec(x), jnp.einsum("nij,njc->nic", ata, x), rtol=1e-4, atol=1e-4)


def test_normal_matrix_grad_flows_to_bary():
    v, vi, idx, bary, _ = _setup(h=24, w=24)

    def loss(bary):
        nm = dt.interpolation_normal_matrix(vi, idx, bary, num_vertices=v.shape[1])
        return jnp.sum(nm.vals**2)

    g = jax.grad(loss)(bary)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0.0


def test_geometry_hint_matches_plain():
    # drtk_tpu extension: passing the pixel-space geometry routes the
    # attribute gradient through the binned-matmul accumulator; results
    # must match the plain path.
    import jax
    import numpy as np
    from tests.utils import grid_mesh

    v, vi = grid_mesh(h=64, w=128, gn=6)
    index_img = dt.rasterize(v, vi, 64, 128, impl="xla")
    _, bary = dt.render(v, vi, index_img)
    rng = np.random.RandomState(0)
    attrs = jnp.asarray(rng.rand(1, v.shape[1], 5).astype(np.float32))

    def loss(fn):
        return jax.grad(
            lambda a: jnp.sum(fn(a) ** 2)
        )(attrs)

    g_plain = loss(lambda a: dt.interpolate(a, vi, index_img, bary))
    g_hint = loss(lambda a: dt.interpolate(a, vi, index_img, bary, v_pix=v))
    np.testing.assert_allclose(g_plain, g_hint, rtol=1e-4, atol=1e-5)

    # Forward values identical.
    np.testing.assert_allclose(
        dt.interpolate(attrs, vi, index_img, bary),
        dt.interpolate(attrs, vi, index_img, bary, v_pix=v),
        rtol=1e-6,
    )


def test_normal_matrix_values_reuses_structure_across_frames():
    """Explicit value-only recompute (interpolation_normal_matrix_values,
    mirroring the reference's cached-structure value kernel,
    interpolate_module.cpp:538-582): one structure serves many frames under
    jit, values match the full build, and gradients flow to bary."""
    v, vi, idx, bary, _ = _setup(h=24, w=24)
    nv = v.shape[1]
    structure = dt.interpolation_normal_structure(vi, num_vertices=nv)

    @jax.jit
    def frame_vals(idx, bary):
        return dt.interpolation_normal_matrix_values(structure, vi, idx, bary)

    # frame 1: parity with the one-shot builder
    nm = dt.interpolation_normal_matrix(vi, idx, bary, num_vertices=nv)
    assert_allclose(frame_vals(idx, bary), nm.vals, rtol=1e-6, atol=1e-7)

    # frame 2: new rasterization (shifted geometry), same structure
    v2 = v + jnp.asarray([0.7, -1.3, 0.2])
    idx2 = dt.rasterize(v2, vi, idx.shape[1], idx.shape[2])
    _, bary2 = dt.render(v2, vi, idx2)
    nm2 = dt.interpolation_normal_matrix(vi, idx2, bary2, num_vertices=nv)
    assert_allclose(frame_vals(idx2, bary2), nm2.vals, rtol=1e-6, atol=1e-7)

    # gradient to bary against finite differences (f64 for a clean FD)
    bary64 = bary.astype(jnp.float64)

    def loss(b):
        return jnp.sum(
            dt.interpolation_normal_matrix_values(structure, vi, idx, b) ** 2
        )

    g = jax.grad(loss)(bary64)
    eps = 1e-6
    probe = jnp.zeros_like(bary64).at[0, 1, 12, 12].set(1.0)
    fd = (loss(bary64 + eps * probe) - loss(bary64 - eps * probe)) / (2 * eps)
    np.testing.assert_allclose(
        float(jnp.vdot(g, probe)), float(fd), rtol=1e-6, atol=1e-9
    )


def test_viewport_sweep_matches_full_frame():
    """interpolate(y_offset, full_height): each row block — including the
    -1..1 background sweep — is bit-exact with the corresponding rows of
    the full-frame call (the sharded pipeline's contract; y_offset may be
    traced, as shard_map's axis_index is)."""
    v, vi, idx, bary, attrs = _setup(h=32, w=24)
    full = dt.interpolate(attrs, vi, idx, bary)
    hb = 8
    for y0 in (0, 8, 16, 24):
        blk = dt.interpolate(
            attrs, vi, idx[:, y0 : y0 + hb], bary[:, :, y0 : y0 + hb],
            y_offset=jnp.int32(y0), full_height=32,
        )
        np.testing.assert_array_equal(
            np.asarray(blk), np.asarray(full[:, :, y0 : y0 + hb])
        )
