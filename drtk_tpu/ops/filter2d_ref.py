"""Pure-JAX reference implementations for filter2d (oracle).

Port of the reference's `drtk/filter2d_ref.py` (403 LoC pure torch): the
explicit insert-zeros -> pad -> correlate -> stride pipeline, materialized
step by step (no dilated-conv fusion), used by tests as an independent code
path against :mod:`drtk_tpu.ops.filter2d`.

Like the upstream ref, this module:
  * supports ``"border"`` padding in addition to zeros/reflection (the fused
    op supports only zeros/reflection);
  * applies the filter as *correlation* (no flip) — identical to the native
    path for the symmetric Kaiser/Lanczos kernels it is used with;
  * relies on plain autodiff for gradients (the exact adjoint), whereas the
    fused op reproduces the reference's swap-construction backward.
"""

from __future__ import annotations

import jax.numpy as jnp

from drtk_tpu.ops.filter2d import (  # noqa: F401  (re-exported like upstream)
    FilterOptions,
    FilterType,
    make_resampling_kernel,
    _calc_pad_0,
    _calc_pad_1,
)

__all__ = [
    "FilterType",
    "FilterOptions",
    "resample_filter",
    "filter",
    "low_pass_filter",
    "downsample",
    "upsample",
    "make_resampling_kernel",
]

_PAD_MODE = {"zeros": "constant", "border": "edge", "reflection": "reflect"}


def check_padding_mode(padding_mode: str) -> None:
    if padding_mode not in _PAD_MODE:
        raise ValueError(
            "filter2d.resample_filter(): expected padding_mode to be "
            f"'zeros', 'border', or 'reflection', but got: '{padding_mode}'"
        )


def ceildiv(a: int, b: int) -> int:
    return -(a // -b)


def insert_zeros(x: jnp.ndarray, up: int) -> jnp.ndarray:
    """Zero-interleave each sample (trailing zeros after each), like the
    upstream ``insert_zeros`` (filter2d_ref.py:148-157)."""
    if up == 1:
        return x
    n, c, h, w = x.shape
    x = x.reshape(n, c, h, 1, w, 1)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, up - 1), (0, 0), (0, up - 1)))
    return x.reshape(n, c, h * up, w * up)


def _correlate_1d(x: jnp.ndarray, f: jnp.ndarray, axis: int, down: int):
    """Valid correlation along one spatial axis with stride, materialized
    as a shifted weighted sum (independent of lax conv)."""
    k = f.shape[0]
    size = x.shape[axis]
    out_len = (size - k) // down + 1
    acc = 0.0
    for i in range(k):
        sl = [slice(None)] * 4
        sl[axis] = slice(i, i + (out_len - 1) * down + 1, down)
        acc = acc + x[tuple(sl)] * f[i]
    return acc


def resample_filter(
    x: jnp.ndarray,
    f: jnp.ndarray,
    up: int = 1,
    down: int = 1,
    padding_mode: str = "reflection",
) -> jnp.ndarray:
    """Reference ``resample_filter`` (filter2d_ref.py:41-123)."""
    assert x.ndim == 4
    assert f.ndim == 1
    check_padding_mode(padding_mode)
    mode = _PAD_MODE[padding_mode]
    k = f.shape[0]

    pad0 = _calc_pad_0(k, down, up)
    pad1 = _calc_pad_1(k, down, up)

    if padding_mode == "zeros":
        x = insert_zeros(x, up)
        x = jnp.pad(x, ((0, 0), (0, 0), (pad0, pad1), (pad0, pad1)))
    else:
        ip0, ip1 = ceildiv(pad0, up), ceildiv(pad1, up)
        x = jnp.pad(x, ((0, 0), (0, 0), (ip0, ip1), (ip0, ip1)), mode=mode)
        x = insert_zeros(x, up)
        c0, c1 = ip0 * up - pad0, ip1 * up - pad1
        if c0 or c1:
            x = x[:, :, c0 : x.shape[2] - c1, c0 : x.shape[3] - c1]

    f = f.astype(x.dtype)
    x = _correlate_1d(x, f, 3, down)
    x = _correlate_1d(x, f, 2, down)
    return x


def filter(x: jnp.ndarray, f: jnp.ndarray,
           padding_mode: str = "reflection") -> jnp.ndarray:
    return resample_filter(x, f, 1, 1, padding_mode)


def upsample(x, filter_options: FilterOptions, upsample_factor: int = 2,
             padding_mode: str = "reflection"):
    f = make_resampling_kernel(
        filter_options, upsample_factor, 1.0, float(upsample_factor)
    )
    return resample_filter(x, f, upsample_factor, 1, padding_mode)


def downsample(x, filter_options: FilterOptions, downsample_factor: int = 2,
               padding_mode: str = "reflection"):
    f = make_resampling_kernel(filter_options, downsample_factor, 1.0, 1.0)
    return resample_filter(x, f, 1, downsample_factor, padding_mode)


def low_pass_filter(x, filter_options: FilterOptions, freq_div: float = 1.0,
                    padding_mode: str = "reflection"):
    f = make_resampling_kernel(filter_options, 1, freq_div, 1.0)
    return resample_filter(x, f, 1, 1, padding_mode)
