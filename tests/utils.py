"""Shared test fixtures: random meshes and tiny rendering helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def two_triangles_scene(h=128, w=128, dtype=jnp.float32):
    """The canonical overlapping-triangles scene from
    test/two_triangles.py:18-37 of the reference, rescaled to (h, w)."""
    v = np.array(
        [
            [10, 200, 100],
            [300, 50, 100],
            [400, 500, 100],
            [50, 400, 200],
            [400, 50, 50],
            [300, 500, 200],
        ],
        dtype=np.float32,
    )
    v[:, 0] *= w / 512.0
    v[:, 1] *= h / 512.0
    vi = np.arange(6, dtype=np.int32).reshape(2, 3)
    vt = np.zeros((1, 6, 2), dtype=np.float32)
    vt[:, 3:6, 0] = 1.0
    return (
        jnp.asarray(v[None], dtype),
        jnp.asarray(vi),
        jnp.asarray(vt, dtype),
    )


def random_mesh(key, n=1, num_v=64, num_f=96, h=64, w=64, zmin=3.0, zmax=9.0,
                dtype=jnp.float32):
    """Random well-conditioned triangle soup covering the canvas."""
    k1, k2, k3 = jax.random.split(key, 3)
    xy = jax.random.uniform(
        k1, (n, num_v, 2), minval=-0.2, maxval=1.2
    ) * jnp.array([w, h])
    z = jax.random.uniform(k2, (n, num_v, 1), minval=zmin, maxval=zmax)
    v = jnp.concatenate([xy, z], axis=-1).astype(dtype)
    vi = jax.random.randint(k3, (num_f, 3), 0, num_v, dtype=jnp.int32)
    return v, vi


def grid_mesh(h=64, w=64, gn=6, z0=5.0, z_amp=1.0, dtype=jnp.float32, seed=0):
    """A regular (gn x gn) grid of vertices triangulated into 2*(gn-1)^2
    faces — a connected, watertight-in-2D mesh good for gradient tests."""
    rng = np.random.RandomState(seed)
    ys, xs = np.meshgrid(
        np.linspace(0.1 * h, 0.9 * h, gn), np.linspace(0.1 * w, 0.9 * w, gn),
        indexing="ij",
    )
    z = z0 + z_amp * rng.uniform(-1, 1, size=xs.shape)
    v = np.stack([xs, ys, z], axis=-1).reshape(-1, 3).astype(np.float32)
    faces = []
    for i in range(gn - 1):
        for j in range(gn - 1):
            a = i * gn + j
            b = a + 1
            c = a + gn
            d = c + 1
            faces.append([a, b, c])
            faces.append([b, d, c])
    vi = np.asarray(faces, np.int32)
    return jnp.asarray(v[None], dtype), jnp.asarray(vi)


def assert_allclose(a, b, rtol=1e-4, atol=1e-4, err_msg=""):
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=rtol, atol=atol, err_msg=err_msg
    )
