"""Core numeric helpers shared by every op.

These mirror the semantics of the reference's shared native infra
(`src/include/cuda_math_helper.h:1036-1059` in facebookresearch/DRTK): the
library-wide singularity guard ``epsclamp`` keeps values away from zero while
preserving sign, with a dtype-dependent epsilon (1e-8 for float32, 1e-16 for
float64).

Everything here is pure ``jax.numpy`` and is used both inside jitted code and
inside Pallas kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["epsclamp", "eps_for_dtype"]


def eps_for_dtype(dtype) -> float:
    """Epsilon used by :func:`epsclamp` for a given floating dtype.

    Matches the reference's ``epsclamp`` specialisations: 1e-8 for float32
    (and below), 1e-16 for float64.
    """
    if jnp.dtype(dtype) == jnp.float64:
        return 1e-16
    return 1e-8


def epsclamp(x: jnp.ndarray) -> jnp.ndarray:
    """Clamp ``x`` away from zero, preserving sign.

    ``epsclamp(v) = v < 0 ? min(v, -eps) : max(v, eps)``

    Note the asymmetry at exactly zero: ``epsclamp(0.0) == +eps`` and
    ``epsclamp(-0.0) == +eps`` (the reference's branch tests ``v < 0``, which
    is false for negative zero). This detail matters for gradient parity at
    degenerate configurations.
    """
    eps = eps_for_dtype(x.dtype)
    return jnp.where(x < 0, jnp.minimum(x, -eps), jnp.maximum(x, eps))
