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

import jax
import jax.numpy as jnp

__all__ = ["autocast_f32", "epsclamp", "eps_for_dtype", "vary_like"]


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


def vary_like(x: jnp.ndarray, *refs: jnp.ndarray) -> jnp.ndarray:
    """Mark ``x`` as varying over the shard_map manual axes that any of the
    ``refs`` vary over. A no-op outside shard_map (or when ``x`` already
    matches).

    Needed wherever a constant initial value (e.g. a scan carry of
    -inf / INT32_MAX) meets per-shard data under jax's varying-manual-axes
    type system.
    """
    try:
        want = set()
        for r in refs:
            want |= set(jax.typeof(r).vma)
        missing = want - set(jax.typeof(x).vma)
    except AttributeError:  # pragma: no cover - older jax without vma
        return x
    if not missing:
        return x
    return jax.lax.pcast(x, tuple(sorted(missing)), to="varying")


def psum_cotangent(g: jnp.ndarray, primal: jnp.ndarray) -> jnp.ndarray:
    """Sum a custom-VJP cotangent over the shard_map axes the primal does
    not vary over. A no-op outside shard_map.

    Inside shard_map, a replicated primal (e.g. the vertex buffer) gets
    per-shard partial cotangents; the transpose machinery cannot see inside
    a custom_vjp to insert the reduction, so every custom VJP in the
    pipeline calls this on its vertex/attribute gradients. This is also
    exactly the collective SURVEY.md §7.3.6 calls for — the cross-shard
    vertex-grad psum, placed where XLA can overlap it with the remaining
    backward.
    """
    try:
        extra = set(jax.typeof(g).vma) - set(jax.typeof(primal).vma)
    except AttributeError:  # pragma: no cover - older jax
        return g
    if not extra:
        return g
    return jax.lax.psum(g, tuple(sorted(extra)))


def autocast_f32(x):
    """fp32 cast-through for half-precision floating inputs — the JAX
    analogue of the reference's Autocast impls
    (``at::autocast::cached_cast(torch::kFloat32, t)``, registered for
    every op module, e.g. render_module.cpp:81-99): when an op is fed
    f16/bf16 tensors it computes — and returns — float32, exactly what
    reference users get under ``torch.autocast``. Ints and f32/f64 pass
    through untouched; ``None`` passes through for optional args."""
    if x is not None and x.dtype in (jnp.float16, jnp.bfloat16):
        return x.astype(jnp.float32)
    return x
