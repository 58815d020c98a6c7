"""Grid scatter: the splatting counterpart of ``grid_sample``.

TPU-native equivalent of the reference's ``grid_scatter_ext``
(`src/grid_scatter/grid_scatter_kernel.cu` and `drtk/grid_scatter.py` in
facebookresearch/DRTK). Each *input* pixel writes its value, weighted by the
interpolation kernel, to the destination described by ``grid``
(kernel.cu:18-181); contributions accumulate.

TPU-first design: ``grid_sample(tex, grid)`` is a *linear* map in ``tex``
for any fixed grid (gathers x fixed weights), and grid_scatter is exactly
its adjoint. The CUDA implementation realizes the adjoint with per-thread
``safe_add_2d`` atomics; on TPU we take the transpose literally —
``jax.linear_transpose`` of our :func:`drtk_tpu.ops.grid_sample.grid_sample`
— which XLA lowers to a deterministic sorted scatter-add. This guarantees
bit-consistent adjointness with our sampler for every (mode, padding_mode,
align_corners) combination by construction, instead of maintaining a
hand-written twin of the coordinate math.

The backward mirrors the reference (kernel.cu:183-423):
  * grad wrt input  = ``grid_sample(grad_output, grid)`` (a pure gather);
  * grad wrt grid   = the sampling derivative evaluated against ``input``
    (obtained here by differentiating the sampler).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from drtk_tpu.ops.grid_sample import grid_sample

__all__ = ["grid_scatter", "grid_scatter_ref"]


def _scatter_adjoint(input, grid, output_height, output_width, mode,
                     padding_mode, align_corners):
    """Transpose of tex -> grid_sample(tex, grid) applied to ``input``."""
    n, c = input.shape[:2]
    tex_spec = jax.ShapeDtypeStruct(
        (n, c, output_height, output_width), input.dtype
    )

    def sample_from(tex):
        return grid_sample(
            tex, grid, mode=mode, padding_mode=padding_mode,
            align_corners=align_corners,
        )

    (out,) = jax.linear_transpose(sample_from, tex_spec)(input)
    return out


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6)
)
def _grid_scatter_core(input, grid, output_height, output_width, mode,
                       padding_mode, align_corners):
    return _scatter_adjoint(
        input, grid, output_height, output_width, mode, padding_mode,
        align_corners,
    )


def _grid_scatter_fwd(input, grid, output_height, output_width, mode,
                      padding_mode, align_corners):
    out = _scatter_adjoint(
        input, grid, output_height, output_width, mode, padding_mode,
        align_corners,
    )
    return out, (input, grid)


def _grid_scatter_bwd(output_height, output_width, mode, padding_mode,
                      align_corners, res, grad_output):
    input, grid = res

    # grad wrt input: gather grad_output at the scatter destinations
    # (grid_scatter_kernel.cu:183-423 — the backward is a grid_sample).
    def sample_at(g):
        return grid_sample(
            grad_output, g, mode=mode, padding_mode=padding_mode,
            align_corners=align_corners,
        )

    grad_input, pullback = jax.vjp(sample_at, grid)
    # grad wrt grid: sampling derivative contracted with ``input``.
    (grad_grid,) = pullback(input)
    return grad_input, grad_grid


_grid_scatter_core.defvjp(_grid_scatter_fwd, _grid_scatter_bwd)


def grid_scatter(
    input: jnp.ndarray,
    grid: jnp.ndarray,
    output_height: int,
    output_width: int,
    mode: str = "bilinear",
    padding_mode: str = "border",
    align_corners: Optional[bool] = None,
) -> jnp.ndarray:
    """Scatter an image through a normalized sampling grid.

    Mirrors ``drtk.grid_scatter`` (drtk/grid_scatter.py:18-105): the
    splatting counterpart of ``grid_sample`` — each input pixel writes its
    value to the destination described by ``grid``; overlapping
    contributions accumulate.

    Args:
        input: [N, C, H, W] source values.
        grid: [N, H, W, 2] normalized destination coordinates ([-1, 1],
            same conventions as grid_sample).
        output_height / output_width: size of the scattered output.
        mode: "bilinear" | "bicubic".
        padding_mode: "zeros" | "border" | "reflection".
        align_corners: as in grid_sample; None -> False.

    Returns:
        [N, C, output_height, output_width] accumulated values.
    """
    if mode not in ("bilinear", "bicubic"):
        raise ValueError(
            "grid_scatter(): only 'bilinear' and 'bicubic' modes are "
            f"supported but got: '{mode}'"
        )
    if padding_mode not in ("zeros", "border", "reflection"):
        raise ValueError(
            "grid_scatter(): expected padding_mode to be 'zeros', 'border', "
            f"or 'reflection', but got: '{padding_mode}'"
        )
    if input.ndim != 4:
        raise ValueError(
            f"grid_scatter(): expected [N, C, H, W] input, got {input.shape}"
        )
    if grid.ndim != 4 or grid.shape[-1] != 2:
        raise ValueError(
            f"grid_scatter(): expected [N, H, W, 2] grid, got {grid.shape}"
        )
    if grid.shape[0] != input.shape[0] or grid.shape[1:3] != input.shape[2:4]:
        raise ValueError(
            "grid_scatter(): grid spatial shape must match input, got "
            f"{grid.shape} vs {input.shape}"
        )
    if align_corners is None:
        align_corners = False
    return _grid_scatter_core(
        input, grid, int(output_height), int(output_width), mode,
        padding_mode, bool(align_corners),
    )


def grid_scatter_ref(
    input: jnp.ndarray,
    grid: jnp.ndarray,
    output_height: int,
    output_width: int,
    mode: str = "bilinear",
    padding_mode: str = "border",
    align_corners: Optional[bool] = None,
) -> jnp.ndarray:
    """Reference implementation via the autograd trick of the reference's
    ``grid_scatter_ref`` (drtk/grid_scatter.py:108-191): the forward is the
    VJP of ``grid_sample`` w.r.t. a ones-texture with cotangent ``input``;
    gradients come from plain JAX autodiff of that composition."""
    if align_corners is None:
        align_corners = False
    n, c = input.shape[:2]
    ones = jnp.ones((n, c, output_height, output_width), input.dtype)

    def sample_from(tex, g):
        return grid_sample(
            tex, g, mode=mode, padding_mode=padding_mode,
            align_corners=bool(align_corners),
        )

    def scatter(inp, g):
        _, pullback = jax.vjp(lambda tex: sample_from(tex, g), ones)
        (tex_grad,) = pullback(inp)
        return tex_grad

    return scatter(input, grid)
