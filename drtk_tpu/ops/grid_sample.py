"""2-D grid sampling with ``torch.nn.functional.grid_sample`` semantics.

JAX has no grid_sample; the reference relies on ATen's grid-sampler internals
(`src/include/grid_utils.h:10-23` in facebookresearch/DRTK re-exports
``clip_coordinates`` / ``reflect_coordinates`` /
``grid_sampler_compute_source_index`` / ``cubic_interp1d``). This module
reimplements those semantics in pure XLA:

* modes: ``bilinear``, ``nearest``, ``bicubic`` (cubic convolution, A=-0.75);
* padding: ``zeros``, ``border``, ``reflection``;
* ``align_corners`` True/False with the exact unnormalization and
  reflection windows used by ATen.

Everything is expressed as gathers + elementwise math, so reverse-mode
autodiff gives the texture gradient as the transposed scatter-add
(equivalent to the reference's ``safe_add_2d`` atomics) and the grid
gradient through the interpolation weights — no custom VJP needed.

This op is also the semantic foundation of :mod:`drtk_tpu.ops.
mipmap_grid_sample` and :mod:`drtk_tpu.ops.grid_scatter`.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp

__all__ = ["grid_sample"]


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    """[-1, 1] -> pixel index space (grid_sampler_unnormalize)."""
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def _reflect(coord: jnp.ndarray, low: float, high: float) -> jnp.ndarray:
    """Reflect ``coord`` into [low, high] (ATen reflect_coordinates)."""
    if low == high:
        return jnp.zeros_like(coord)
    span = high - low
    c = jnp.abs(coord - low)
    extra = jnp.mod(c, span)
    flips = jnp.floor(c / span)
    flipped = jnp.where(jnp.mod(flips, 2.0) == 0.0, extra + low, span - extra + low)
    return flipped


def _compute_source_index(
    coord: jnp.ndarray, size: int, padding_mode: str, align_corners: bool
) -> jnp.ndarray:
    """grid_sampler_compute_source_index: unnormalize + padding fold."""
    x = _unnormalize(coord, size, align_corners)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, size - 1)
    elif padding_mode == "reflection":
        if align_corners:
            x = _reflect(x, 0.0, float(size - 1))
        else:
            x = _reflect(x, -0.5, size - 0.5)
        x = jnp.clip(x, 0.0, size - 1)
    return x


def _gather_2d(
    img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray, zero_fill: bool
) -> jnp.ndarray:
    """Gather img[n, c, iy, ix] with out-of-bounds handling.

    img: [N, C, H, W]; ix/iy: [N, *S] int32. Returns [N, C, *S].
    When zero_fill, out-of-bounds taps return 0; otherwise indices are
    assumed pre-clamped.

    TPU note: lowered as ONE row gather per tap from a channels-last
    [N, H*W, C] view (row gathers are ~2x faster than per-channel element
    gathers; XLA CSEs the transpose across the taps of one sample).
    """
    n, c, h, w = img.shape
    inb = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc = jnp.clip(ix, 0, w - 1)
    iyc = jnp.clip(iy, 0, h - 1)

    rows_img = jnp.moveaxis(img, 1, -1).reshape(n, h * w, c)
    flat = (iyc * w + ixc).reshape(n, -1)
    if ix.ndim == 3:
        # Image-shaped taps: the row_gather primitive, whose transpose is
        # the windowed MXU splat instead of XLA's sort-based scatter.
        from drtk_tpu.ops.row_gather import row_gather

        out = row_gather(
            rows_img, flat, rows_hw=ix.shape[1:], table_hw=(h, w)
        )
    else:
        out = jax.vmap(lambda t, ii: t[ii])(rows_img, flat)  # [N, S, C]
    out = jnp.moveaxis(out, -1, 1).reshape((n, c) + ix.shape[1:])
    if zero_fill:
        out = jnp.where(inb[:, None], out, 0.0)
    return out


def _cubic_weights(t: jnp.ndarray, a: float = -0.75):
    """Cubic convolution weights for taps at offsets -1, 0, 1, 2
    (ATen cubic_interp1d / get_cubic_upsample_coefficients)."""
    t2 = t * t
    t3 = t2 * t
    w0 = a * (t3 - 2 * t2 + t)
    w1 = (a + 2) * t3 - (a + 3) * t2 + 1
    w2 = -(a + 2) * t3 + (2 * a + 3) * t2 - a * t
    w3 = a * (t2 - t3)
    # note w0 uses ((A*(t+1) - 5A)*(t+1) + 8A)*(t+1) - 4A form in ATen;
    # expanded it equals a*(t^3 - 2t^2 + t) ... verify: A((t+1)^3) -5A(t+1)^2
    # + 8A(t+1) - 4A = A(t^3+3t^2+3t+1 -5t^2-10t-5 +8t+8 -4) = A(t^3-2t^2+t).
    return w0, w1, w2, w3


def _grid_sample_impl(
    input: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str,
    padding_mode: str,
    align_corners: bool,
) -> jnp.ndarray:
    n, c, h, w = input.shape
    gx = grid[..., 0]
    gy = grid[..., 1]

    x = _compute_source_index(gx, w, padding_mode, align_corners)
    y = _compute_source_index(gy, h, padding_mode, align_corners)
    zeros = padding_mode == "zeros"

    if mode == "nearest":
        # ATen uses round-half-away... actually std::nearbyint -> round half
        # to even is NOT used; grid_sampler uses static_cast<index_t>(
        # std::nearbyint(x)) = round-half-to-even.
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        return _gather_2d(input, ix, iy, zeros)

    if mode == "bilinear":
        # All four taps come from ONE row gather out of a "quad table": the
        # texture concatenated with its x-, y-, and xy-shifted copies, so a
        # single [4C]-row per pixel replaces four separate gathers (row
        # gathers are the fast path on TPU; the 4x table build is a cheap
        # contiguous copy). The VJP is correspondingly ONE row scatter plus
        # shifted adds.
        n, c, h, w = input.shape
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = x - x0
        ty = y - y0
        ix0 = x0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)

        t = jnp.moveaxis(input, 1, -1)  # [N, H, W, C]
        if zeros:
            # Pad one zero ring so an in-range-but-boundary base reads true
            # zeros; fully out-of-range taps are masked below.
            t = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))
            bx = jnp.clip(ix0 + 1, 0, w)
            by = jnp.clip(iy0 + 1, 0, h)
        else:
            # Folded coords are already in [0, size-1]; the +1 taps only get
            # nonzero weight strictly inside, so zero-filled shifts suffice.
            bx = jnp.clip(ix0, 0, w - 1)
            by = jnp.clip(iy0, 0, h - 1)
        hq, wq = t.shape[1], t.shape[2]
        tx1 = jnp.concatenate([t[:, :, 1:], jnp.zeros_like(t[:, :, :1])], 2)
        ty1 = jnp.concatenate([t[:, 1:], jnp.zeros_like(t[:, :1])], 1)
        txy = jnp.concatenate([ty1[:, :, 1:], jnp.zeros_like(t[:, :, :1])], 2)
        quad = jnp.concatenate([t, tx1, ty1, txy], -1).reshape(n, hq * wq, 4 * c)

        flat = (by * wq + bx).reshape(n, -1)
        if ix0.ndim == 3:
            # row_gather primitive: transpose = windowed MXU splat of the
            # quad-row cotangents (folded back to the texture by the quad
            # build's own transpose — four shifted adds), built only when
            # the texture is differentiated.
            from drtk_tpu.ops.row_gather import row_gather

            rows = row_gather(
                quad, flat, rows_hw=ix0.shape[1:], table_hw=(hq, wq)
            )
        else:
            rows = jax.vmap(lambda q, ii: q[ii])(quad, flat)  # [N, P, 4C]
        rows = rows.reshape(ix0.shape + (4, c))

        wx1 = tx[..., None]
        wy1 = ty[..., None]
        wts = jnp.stack(
            [
                (1 - wx1[..., 0]) * (1 - wy1[..., 0]),
                wx1[..., 0] * (1 - wy1[..., 0]),
                (1 - wx1[..., 0]) * wy1[..., 0],
                wx1[..., 0] * wy1[..., 0],
            ],
            axis=-1,
        )
        if zeros:
            inb_x0 = (ix0 >= 0) & (ix0 < w)
            inb_x1 = (ix0 + 1 >= 0) & (ix0 + 1 < w)
            inb_y0 = (iy0 >= 0) & (iy0 < h)
            inb_y1 = (iy0 + 1 >= 0) & (iy0 + 1 < h)
            tap_mask = jnp.stack(
                [inb_x0 & inb_y0, inb_x1 & inb_y0,
                 inb_x0 & inb_y1, inb_x1 & inb_y1],
                axis=-1,
            )
            wts = wts * tap_mask
        out = jnp.einsum("...kc,...k->...c", rows, wts.astype(rows.dtype))
        return jnp.moveaxis(out, -1, 1)

    if mode == "bicubic":
        # Bicubic ignores the padding fold above for coordinate computation:
        # ATen unnormalizes without clipping, then bounds each tap with
        # get_value_bounded (which applies clip/reflect per-tap).
        x = _unnormalize(gx, w, align_corners)
        y = _unnormalize(gy, h, align_corners)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = x - x0
        ty = y - y0
        wx = _cubic_weights(tx)
        wy = _cubic_weights(ty)

        def bound(v, size):
            # compute_coordinates per-tap (grid_utils.h:68-81)
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

        out = 0.0
        for j in range(4):
            iy = bound(y0.astype(jnp.int32) + (j - 1), h)
            row = 0.0
            for i in range(4):
                ix = bound(x0.astype(jnp.int32) + (i - 1), w)
                # zeros padding: tap outside -> 0 (use raw index for the
                # bounds test)
                if padding_mode == "zeros":
                    raw_ix = x0.astype(jnp.int32) + (i - 1)
                    raw_iy = y0.astype(jnp.int32) + (j - 1)
                    tap = _gather_2d(input, raw_ix, raw_iy, True)
                else:
                    tap = _gather_2d(input, ix, iy, False)
                row = row + tap * wx[i][:, None]
            out = out + row * wy[j][:, None]
        return out

    raise ValueError(f"grid_sample: unknown mode {mode!r}")


@functools.partial(jax.jit, static_argnames=("mode", "padding_mode", "align_corners"))
def _grid_sample_jit(input, grid, mode, padding_mode, align_corners):
    return _grid_sample_impl(input, grid, mode, padding_mode, align_corners)


def grid_sample(
    input: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Sample ``input`` at normalized ``grid`` locations, exactly matching
    ``torch.nn.functional.grid_sample`` (2-D).

    Args:
        input: [N, C, H, W] texture.
        grid: [N, Hg, Wg, 2] (or [N, ..., 2]) normalized coords in [-1, 1],
            ``grid[..., 0]`` = x (width), ``grid[..., 1]`` = y (height).
        mode: "bilinear" | "nearest" | "bicubic".
        padding_mode: "zeros" | "border" | "reflection".
        align_corners: corner-alignment convention.

    Returns:
        [N, C, *grid.shape[1:-1]] sampled values. f16/bf16 inputs compute
        in float32 (ATen autocasts grid_sampler to fp32; autocast parity).
    """
    from drtk_tpu.ops.math import autocast_f32

    input = autocast_f32(input)
    grid = autocast_f32(grid)
    if input.ndim != 4:
        raise ValueError(f"grid_sample: expected [N, C, H, W] input, got {input.shape}")
    if grid.shape[-1] != 2:
        raise ValueError(f"grid_sample: expected grid[..., 2], got {grid.shape}")
    if mode not in ("bilinear", "nearest", "bicubic"):
        raise ValueError(f"grid_sample: unknown mode {mode!r}")
    if padding_mode not in ("zeros", "border", "reflection"):
        raise ValueError(f"grid_sample: unknown padding_mode {padding_mode!r}")
    return _grid_sample_jit(input, grid, mode, padding_mode, bool(align_corners))
