"""Tests: the C++ pair-structure builder matches the numpy fallback and the
normal matrix built through it is correct."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from drtk_tpu.ops import interpolate as interp_mod


def numpy_pair_structure(vi, num_vertices):
    f = vi.shape[0]
    vi64 = vi.astype(np.int64)
    rows = np.repeat(vi64, 3, axis=1).reshape(f, 9)
    cols = np.tile(vi64, (1, 3)).reshape(f, 9)
    keys = rows * num_vertices + cols
    uniq, inverse = np.unique(keys.reshape(-1), return_inverse=True)
    return (
        (uniq // num_vertices).astype(np.int32),
        (uniq % num_vertices).astype(np.int32),
        inverse.reshape(f, 9).astype(np.int32),
    )


def test_native_matches_numpy():
    native = pytest.importorskip("drtk_tpu.native")
    rng = np.random.RandomState(0)
    for f_cnt, v_cnt in [(1, 3), (17, 12), (400, 100), (1000, 50)]:
        vi = rng.randint(0, v_cnt, (f_cnt, 3)).astype(np.int32)
        r_n, c_n, s_n = native.build_pair_structure(vi, v_cnt)
        r_p, c_p, s_p = numpy_pair_structure(vi, v_cnt)
        np.testing.assert_array_equal(r_n, r_p)
        np.testing.assert_array_equal(c_n, c_p)
        np.testing.assert_array_equal(s_n, s_p)


def test_native_rejects_bad_indices():
    native = pytest.importorskip("drtk_tpu.native")
    vi = np.array([[0, 1, 5]], np.int32)
    with pytest.raises(ValueError):
        native.build_pair_structure(vi, 3)
    with pytest.raises(ValueError):
        native.build_pair_structure(np.zeros((2, 4), np.int32), 3)


def test_normal_matrix_uses_native_and_is_correct():
    # interpolation_normal_matrix must equal A^T A from the dense matrix.
    pytest.importorskip("drtk_tpu.native")
    from tests.utils import random_mesh
    import drtk_tpu as dt

    v, vi = random_mesh(jax.random.PRNGKey(0), n=1, num_v=24, num_f=30,
                        h=32, w=32)
    index_img = dt.rasterize(v, vi, 32, 32)
    _, bary = dt.render(v, vi, index_img)
    a = dt.interpolation_matrix(vi, index_img, bary, 24)
    m = dt.interpolation_normal_matrix(vi, index_img, bary, 24)
    ata_dense = jnp.einsum("npi,npj->nij", a.todense(), a.todense())
    np.testing.assert_allclose(m.todense(), ata_dense, rtol=1e-4, atol=1e-6)
