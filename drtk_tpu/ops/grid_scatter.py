"""Grid scatter: the splatting counterpart of ``grid_sample``.

TPU-native equivalent of the reference's ``grid_scatter_ext``
(`src/grid_scatter/grid_scatter_kernel.cu` and `drtk/grid_scatter.py` in
facebookresearch/DRTK). Each *input* pixel writes its value, weighted by the
interpolation kernel, to the destination described by ``grid``
(kernel.cu:18-181); contributions accumulate.

TPU-first design: ``grid_sample(tex, grid)`` is a *linear* map in ``tex``
for any fixed grid (gathers x fixed weights), and grid_scatter is exactly
its adjoint. The CUDA implementation realizes the adjoint with per-thread
``safe_add_2d`` atomics; on TPU the fast path computes the sampler's tap
set explicitly (same coordinate helpers as
:func:`drtk_tpu.ops.grid_sample.grid_sample`, so the splat targets are the
sampler's gather sources by construction) and accumulates it with
:func:`drtk_tpu.ops.window_accum.window_accumulate` — dense per-block MXU
windows instead of XLA's sort-based scatter-add, exploiting the spatial
coherence of real grids (warps, uv unwraps). float64 (oracle mode) and
shard_map-varying operands keep the literal ``jax.linear_transpose`` of
the sampler, which lowers to the deterministic sorted scatter.

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

from drtk_tpu.ops.grid_sample import (
    _compute_source_index,
    _cubic_weights,
    _reflect,
    _unnormalize,
    grid_sample,
)
from drtk_tpu.ops.window_accum import blocked_taps, window_accumulate

__all__ = ["grid_scatter", "grid_scatter_ref"]


def _scatter_adjoint(input, grid, output_height, output_width, mode,
                     padding_mode, align_corners):
    """Transpose of tex -> grid_sample(tex, grid) applied to ``input``.

    Realized with ``jax.vjp`` around a zero texture pre-varied
    (:func:`drtk_tpu.ops.math.vary_like`) over every shard_map axis the
    operands vary over, NOT ``jax.linear_transpose`` on a bare
    ShapeDtypeStruct: a spec carries no vma, and under shard_map the
    vma-blind transpose returned a per-shard partial stamped as
    shard-invariant — downstream ``psum_cotangent`` then skipped the
    cross-shard reduction (found by tests/test_spmd.py grad_tex). With the
    primal varied over the union, autodiff inserts no psum and the result
    is the correctly-typed local partial splat; the unused forward
    evaluation of the zero texture is dead code under jit."""
    from drtk_tpu.ops.grid_sample import _grid_sample_impl
    from drtk_tpu.ops.math import vary_like

    n, c = input.shape[:2]
    tex0 = vary_like(
        jnp.zeros((n, c, output_height, output_width), input.dtype),
        input, grid,
    )

    def sample_from(tex):
        # The RAW sampler (plain autodiff, no custom_vjp): this function's
        # own caller IS grid_sample's input-grad, so the public path's
        # custom VJP would recurse the splat right back.
        return _grid_sample_impl(tex, grid, mode, padding_mode, align_corners)

    _, pull = jax.vjp(sample_from, tex0)
    (out,) = pull(input)
    return out


def _scatter_taps(grid, out_h, out_w, mode, padding_mode, align_corners):
    """Destination taps of one input pixel: (iy, ix, weight) lists, each
    [N, T, H, W] (T = 4 bilinear / 16 bicubic), with out-of-bounds taps
    marked iy = -1. Exactly the adjoint tap set of
    :func:`drtk_tpu.ops.grid_sample.grid_sample` (same coordinate helpers:
    unnormalize + padding fold, per-tap bound() for bicubic)."""
    gx = grid[..., 0]
    gy = grid[..., 1]
    iys, ixs, wts = [], [], []
    if mode == "bilinear":
        x = _compute_source_index(gx, out_w, padding_mode, align_corners)
        y = _compute_source_index(gy, out_h, padding_mode, align_corners)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = (x - x0).astype(jnp.float32)
        ty = (y - y0).astype(jnp.float32)
        ix0 = x0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)
        for dy, wy in ((0, 1.0 - ty), (1, ty)):
            for dx, wx in ((0, 1.0 - tx), (1, tx)):
                iys.append(iy0 + dy)
                ixs.append(ix0 + dx)
                wts.append(wx * wy)
    else:  # bicubic: per-tap bound folding, like the sampler
        x = _unnormalize(gx, out_w, align_corners)
        y = _unnormalize(gy, out_h, align_corners)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = _cubic_weights((x - x0).astype(jnp.float32))
        wy = _cubic_weights((y - y0).astype(jnp.float32))
        ix0 = x0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)

        def bound(v, size):
            vf = v.astype(x.dtype)
            if padding_mode == "border":
                vf = jnp.clip(vf, 0, size - 1)
            elif padding_mode == "reflection":
                if align_corners:
                    vf = _reflect(vf, 0.0, float(size - 1))
                else:
                    vf = _reflect(vf, -0.5, size - 0.5)
                vf = jnp.clip(vf, 0, size - 1)
            return vf.astype(jnp.int32)

        for j in range(4):
            raw_iy = iy0 + (j - 1)
            iy = raw_iy if padding_mode == "zeros" else bound(raw_iy, out_h)
            for i in range(4):
                raw_ix = ix0 + (i - 1)
                ix = (
                    raw_ix if padding_mode == "zeros" else bound(raw_ix, out_w)
                )
                iys.append(iy)
                ixs.append(ix)
                wts.append(wx[i] * wy[j])

    iy_t = jnp.stack(iys, axis=1)  # [N, T, H, W]
    ix_t = jnp.stack(ixs, axis=1)
    w_t = jnp.stack(wts, axis=1)
    inb = (iy_t >= 0) & (iy_t < out_h) & (ix_t >= 0) & (ix_t < out_w)
    iy_t = jnp.where(inb, iy_t, -1)
    ix_t = jnp.where(inb, ix_t, 0)
    return iy_t, ix_t, w_t


def _windowed_scatter(input, grid, out_h, out_w, mode, padding_mode,
                      align_corners):
    """TPU fast path: explicit splat taps accumulated by
    :func:`drtk_tpu.ops.window_accum.window_accumulate` — spatially
    coherent grids (the normal case: warps, uv unwraps) hit dense window
    accumulation instead of XLA's sort-based scatter-add. Incoherent
    batch elements fall back to the plain scatter inside
    ``window_accumulate`` (identical result)."""
    n, c, h, w = input.shape
    iy_t, ix_t, w_t = _scatter_taps(
        grid, out_h, out_w, mode, padding_mode, align_corners
    )
    # rows[n, c, t, h, w] = input * tap weight (weights exclude channels)
    rows = input[:, :, None].astype(jnp.float32) * w_t[:, None]
    t = iy_t.shape[1]
    rows_b = blocked_taps(rows)  # [N, C, P]
    iy_b = blocked_taps(iy_t)  # [N, P]
    ix_b = blocked_taps(ix_t)
    # Inert taps (iy = -1): blocked_taps padding, and taps whose source
    # pixel is zero in EVERY channel — scattering zeros is exact identity,
    # and dropping them keeps the window bounds tight when the grid has
    # wild coords at zero-valued pixels. The canonical case is grid_sample's
    # texture-grad VJP routed through this path: background pixels carry
    # interpolate's -1..1 sweep as uv (taps spanning the whole texture) but
    # a masked pipeline zeroes exactly those cotangents.
    live = jnp.any(input != 0, axis=1).astype(jnp.int32)  # [N, H, W]
    inert = blocked_taps(jnp.broadcast_to(live[:, None], iy_t.shape)) == 0
    iy_b = jnp.where(inert, -1, iy_b)

    hp = max(48, -(-out_h // 8) * 8)
    wp = max(512, -(-out_w // 128) * 128)
    interpret = jax.devices()[0].platform != "tpu"
    # Tap block: ONE 8x128-pixel rect's taps for bilinear (t=4); bicubic's
    # 16 taps/rect are split into 4 sub-blocks (same rect -> same window
    # bbox, so coherence is preserved). An unsplit t=16 block is B=16384
    # taps, and the kernel's packed one-hot lhs (3 bf16 terms x
    # [128//K*K, B]) plus the [128, B] one-hot then needs ~18.7 MB of
    # Mosaic stack — past the 16 MB scoped-vmem limit on v5e (found by
    # bench.py --parity; interpret mode accepted it).
    acc = window_accumulate(
        rows_b, iy_b, ix_b, hp, wp, block=min(t, 4) * 8 * 128, win_h=48,
        win_w=512, interpret=interpret,
    )
    return acc[:, :, :out_h, :out_w].astype(input.dtype)


def _varying(x):
    try:
        return bool(jax.typeof(x).vma)
    except AttributeError:  # pragma: no cover - older jax
        return False


def _scatter_dispatch(input, grid, output_height, output_width, mode,
                      padding_mode, align_corners):
    # f64 (oracle mode) and shard_map-varying operands keep the
    # linear-transpose scatter (dtype-preserving / no full-frame blocking);
    # everything else takes the windowed accumulation.
    if (
        input.dtype == jnp.float64
        or _varying(input)
        or _varying(grid)
    ):
        return _scatter_adjoint(
            input, grid, output_height, output_width, mode, padding_mode,
            align_corners,
        )
    return _windowed_scatter(
        input, grid, output_height, output_width, mode, padding_mode,
        align_corners,
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6)
)
def _grid_scatter_core(input, grid, output_height, output_width, mode,
                       padding_mode, align_corners):
    return _scatter_dispatch(
        input, grid, output_height, output_width, mode, padding_mode,
        align_corners,
    )


def _grid_scatter_fwd(input, grid, output_height, output_width, mode,
                      padding_mode, align_corners):
    out = _scatter_dispatch(
        input, grid, output_height, output_width, mode, padding_mode,
        align_corners,
    )
    return out, (input, grid)


def _grid_scatter_bwd(output_height, output_width, mode, padding_mode,
                      align_corners, res, grad_output):
    input, grid = res

    # grad wrt input: gather grad_output at the scatter destinations
    # (grid_scatter_kernel.cu:183-423 — the backward is a grid_sample).
    # Raw sampler: this VJP wants plain autodiff for the grid derivative,
    # not grid_sample's custom VJP (which would splat right back).
    def sample_at(g):
        from drtk_tpu.ops.grid_sample import _grid_sample_impl

        return _grid_sample_impl(
            grad_output, g, mode, padding_mode, align_corners
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
        [N, C, output_height, output_width] accumulated values. f16/bf16
        inputs compute in float32 (autocast parity,
        grid_scatter_module.cpp:120-146).
    """
    from drtk_tpu.ops.math import autocast_f32

    input = autocast_f32(input)
    grid = autocast_f32(grid)
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
        # Raw sampler: the oracle wants PLAIN autodiff through the whole
        # composition (its own gradients are second-order through this
        # vjp, which a custom_vjp boundary would reject).
        from drtk_tpu.ops.grid_sample import _grid_sample_impl

        return _grid_sample_impl(
            tex, g, mode, padding_mode, bool(align_corners)
        )

    def scatter(inp, g):
        _, pullback = jax.vjp(lambda tex: sample_from(tex, g), ones)
        (tex_grad,) = pullback(inp)
        return tex_grad

    return scatter(input, grid)
