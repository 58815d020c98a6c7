"""Mutually-transposed row gather / row scatter primitives.

``row_gather(table [N,R,K], idx [N,P]) -> [N,P,K]`` is the pipeline's
universal "per-pixel row fetch" (grid_sample's quad-table rows, bicubic
taps). It is linear in ``table``, and its transpose — the texture-gradient
splat — is the single most expensive thing plain autodiff produces on TPU:
XLA lowers the scatter-add to a sort pipeline (measured 137 ms + ~52 ms of
sort fusions per 8x512² inverse-rendering step, ~60 % of the step; the
reference does it with ``safe_add_2d`` atomics,
grid_scatter_kernel.cu:18-181). Registering the pair as custom JAX
primitives — rather than a ``custom_vjp`` around grid_sample — buys
exactly the properties a transpose should have:

* the scatter is built ONLY when the table cotangent is actually needed
  (a ``custom_vjp`` bwd always traces both cotangents, and Mosaic
  custom-calls defeat XLA DCE — a dead windowed scatter cost the textured
  benchmark ~6 %);
* transpose-of-transpose returns to the gather, so second-order autodiff
  (oracle refs differentiate through VJPs) works;
* shard_map vma propagation is the standard union rule plus an explicit
  ``vary_like`` at the bind site, so the cross-shard psum on a replicated
  table comes from jax's own pvary transposition — no hand-inserted
  collective;
* vmap gets a real batching rule (leading axes collapse into N).

The scatter implementation dispatches: float64 (oracle mode) and very wide
rows keep the exact per-channel XLA scatter; float32 image-shaped rows take
:func:`drtk_tpu.ops.window_accum.window_accumulate` — dense per-block MXU
windows exploiting the spatial coherence of sampling grids, with a
runtime fallback (never wrong) for incoherent blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax._src import core as jcore
from jax.interpreters import ad, batching, mlir

from drtk_tpu.ops.window_accum import blocked_taps, window_accumulate

__all__ = ["row_gather"]

# Widest K the windowed scatter accepts: the window scratch is
# K x 48 x 512 f32 VMEM (98 KB per channel); 32 keeps it ~3 MB.
_MAX_WIN_K = 32

row_gather_p = jcore.Primitive("drtk_row_gather")
row_scatter_p = jcore.Primitive("drtk_row_scatter")


def _vary_like(x, *refs):
    from drtk_tpu.ops.math import vary_like

    return vary_like(x, *refs)


def row_gather(table, idx, *, rows_hw, table_hw):
    """Gather ``table[n, idx[n, p], :]`` -> [N, P, K].

    Args:
        table: [N, R, K] float rows (R = table_hw[0] * table_hw[1]).
        idx: [N, P] int32 in [0, R) (P = rows_hw[0] * rows_hw[1]).
        rows_hw: static (H, W) image shape that P flattens — gives the
            transpose its spatially-coherent tap blocking.
        table_hw: static (Hq, Wq) spatial shape of the table rows — gives
            the transpose its 2-D scatter windows.
    """
    n, r, k = table.shape
    assert r == table_hw[0] * table_hw[1], (r, table_hw)
    assert idx.shape[1] == rows_hw[0] * rows_hw[1], (idx.shape, rows_hw)
    # Equalize shard_map vma across operands HERE (pvary is autodiff-aware:
    # its transpose is the psum a replicated table's cotangent needs).
    table = _vary_like(table, idx)
    idx = _vary_like(idx, table)
    return row_gather_p.bind(
        table, idx, rows_hw=tuple(rows_hw), table_hw=tuple(table_hw)
    )


def _row_scatter(rows, idx, *, rows_hw, table_hw):
    rows = _vary_like(rows, idx)
    idx = _vary_like(idx, rows)
    return row_scatter_p.bind(
        rows, idx, rows_hw=tuple(rows_hw), table_hw=tuple(table_hw)
    )


# --------------------------------------------------------------------------
# Implementations
# --------------------------------------------------------------------------


def _gather_impl(table, idx, *, rows_hw, table_hw):
    del rows_hw, table_hw
    return jax.vmap(lambda t, ii: t[ii])(table, idx)


def _scatter_plain(rows, idx, r_cnt):
    """Exact K-batched per-channel scatters (dtype preserving). Channels
    ride the batch axis so the big P/R axes stay minor — a [P, K] row
    scatter would lane-pad K to 128 in HBM (see segment_rows)."""
    rows_cl = jnp.moveaxis(rows, -1, 1)  # [N, K, P]

    def one(ii, vals):
        return jax.vmap(
            lambda col: jnp.zeros((r_cnt,), rows.dtype).at[ii].add(
                col, mode="promise_in_bounds"
            )
        )(vals)

    out = jax.vmap(one)(idx, rows_cl)  # [N, K, R]
    return jnp.moveaxis(out, 1, -1)


def _varying(x):
    try:
        return bool(jax.typeof(x).vma)
    except AttributeError:  # pragma: no cover - older jax
        return False


def _scatter_impl(rows, idx, *, rows_hw, table_hw):
    n, p, k = rows.shape
    hq, wq = table_hw
    interpret = jax.devices()[0].platform != "tpu"
    if (
        rows.dtype == jnp.float64
        or k > _MAX_WIN_K
        # Interpret-mode pallas evaluates the kernel body with jax ops,
        # where shard_map's vma checks reject the kernel's internal mixed
        # constants; real Mosaic compiles the body and is fine. CPU tests
        # under shard_map take the exact plain scatter instead.
        or (interpret and (_varying(rows) or _varying(idx)))
    ):
        return _scatter_plain(rows, idx, hq * wq)

    h, w = rows_hw
    rows_cl = jnp.moveaxis(rows, -1, 1).astype(jnp.float32)  # [N, K, P]
    iy = (idx // wq).astype(jnp.int32)
    ix = (idx % wq).astype(jnp.int32)
    # Inert taps (iy = -1): blocked_taps padding, plus rows that are zero
    # in every channel — dropping zero cotangents is exact and keeps the
    # window bounds tight when masked pipelines leave wild coords at
    # background pixels (their uv carries interpolate's -1..1 sweep).
    live = jnp.any(rows_cl != 0, axis=1).astype(jnp.int32)  # [N, P]

    def bt(x):
        return blocked_taps(x.reshape(x.shape[:-1] + (1, h, w)))

    rows_b = bt(rows_cl)
    iy_b = bt(iy)
    ix_b = bt(ix)
    live_b = bt(live)
    iy_b = jnp.where(live_b == 0, -1, iy_b)

    hp = max(48, -(-hq // 8) * 8)
    wp = max(512, -(-wq // 128) * 128)
    acc = window_accumulate(
        rows_b, iy_b, ix_b, hp, wp, block=8 * 128, win_h=48, win_w=512,
        interpret=interpret,
    )
    out = acc[:, :, :hq, :wq].reshape(n, k, hq * wq)
    return jnp.moveaxis(out, 1, -1).astype(rows.dtype)


# --------------------------------------------------------------------------
# Rules
# --------------------------------------------------------------------------


def _out_aval(x_aval, idx_aval, shape, dtype):
    vma = jcore.standard_vma_rule("drtk_row_gather", x_aval, idx_aval)
    return x_aval.update(shape=shape, dtype=dtype, vma=vma, weak_type=False)


def _gather_abstract(table, idx, *, rows_hw, table_hw):
    n, r, k = table.shape
    return _out_aval(table, idx, (n, idx.shape[1], k), table.dtype)


def _scatter_abstract(rows, idx, *, rows_hw, table_hw):
    n, p, k = rows.shape
    return _out_aval(rows, idx, (n, table_hw[0] * table_hw[1], k), rows.dtype)


row_gather_p.def_impl(_gather_impl)
row_gather_p.def_abstract_eval(_gather_abstract)
mlir.register_lowering(
    row_gather_p, mlir.lower_fun(_gather_impl, multiple_results=False)
)
row_scatter_p.def_impl(_scatter_impl)
row_scatter_p.def_abstract_eval(_scatter_abstract)
mlir.register_lowering(
    row_scatter_p, mlir.lower_fun(_scatter_impl, multiple_results=False)
)

# Linear in the value operand; idx is integer (no tangent).
ad.defjvp(
    row_gather_p,
    lambda g, table, idx, **kw: row_gather_p.bind(g, idx, **kw),
    None,
)
ad.defjvp(
    row_scatter_p,
    lambda g, rows, idx, **kw: row_scatter_p.bind(g, idx, **kw),
    None,
)


def _gather_transpose(ct, table, idx, *, rows_hw, table_hw):
    assert ad.is_undefined_primal(table)
    assert not ad.is_undefined_primal(idx)
    if type(ct) is ad.Zero:
        return [ad.Zero(table.aval), None]
    return [
        _row_scatter(ct, idx, rows_hw=rows_hw, table_hw=table_hw),
        None,
    ]


def _scatter_transpose(ct, rows, idx, *, rows_hw, table_hw):
    assert ad.is_undefined_primal(rows)
    assert not ad.is_undefined_primal(idx)
    if type(ct) is ad.Zero:
        return [ad.Zero(rows.aval), None]
    return [
        row_gather(ct, idx, rows_hw=rows_hw, table_hw=table_hw),
        None,
    ]


ad.primitive_transposes[row_gather_p] = _gather_transpose
ad.primitive_transposes[row_scatter_p] = _scatter_transpose


def _batch_rule(prim, args, dims, **params):
    """vmap: collapse the mapped axis into the N (batch) axis."""
    x, idx = args
    dx, di = dims
    size = x.shape[dx] if dx is not None else idx.shape[di]
    if dx is None:
        x = jnp.broadcast_to(x[None], (size,) + x.shape)
    else:
        x = jnp.moveaxis(x, dx, 0)
    if di is None:
        idx = jnp.broadcast_to(idx[None], (size,) + idx.shape)
    else:
        idx = jnp.moveaxis(idx, di, 0)
    b, n = x.shape[0], x.shape[1]
    out = prim.bind(
        x.reshape((b * n,) + x.shape[2:]),
        idx.reshape((b * n,) + idx.shape[2:]),
        **params,
    )
    return out.reshape((b, n) + out.shape[1:]), 0


batching.primitive_batchers[row_gather_p] = functools.partial(
    _batch_rule, row_gather_p
)
batching.primitive_batchers[row_scatter_p] = functools.partial(
    _batch_rule, row_scatter_p
)
