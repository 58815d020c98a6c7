"""Gather helper (JAX port of drtk/utils/indexing.py)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["index"]


def index(x: jnp.ndarray, idxs: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Index ``x`` along ``dim`` with an arbitrary-shape index tensor,
    replacing that axis with the index tensor's shape
    (drtk/utils/indexing.py:11-27).

    Example: x [8, 7306, 3], idxs [11000, 3], dim=1 -> [8, 11000, 3, 3].
    """
    target_shape = list(x.shape)
    del target_shape[dim]
    target_shape[dim:dim] = list(idxs.shape)
    return jnp.take(x, idxs.reshape(-1), axis=dim).reshape(target_shape)
