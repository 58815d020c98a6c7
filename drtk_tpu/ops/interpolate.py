"""Barycentric interpolation of vertex attributes + sparse system builders.

TPU-native equivalent of the reference's ``interpolate_ext``
(`src/interpolate/interpolate_kernel.cu` / ``interpolate_module.cpp`` in
facebookresearch/DRTK). Four capabilities:

* :func:`interpolate` — per-pixel gather of the 3 vertex attribute rows of the
  rasterized triangle, dotted with the barycentric image
  (interpolate_kernel.cu:73-110). Background pixels get the deterministic
  -1..1 x/y sweep pattern of the CUDA kernel (:104-109) rather than zeros.
  Backward produces barycentric grads per pixel and vertex-attribute grads.
  The reference uses warp-level segmented reductions + ``fastAtomicAdd``
  (:205-280); on TPU this becomes a batched scatter-add, which XLA lowers to
  a sorted segment reduction — no atomics.

* :func:`interpolation_matrix` — the sparse pixel-to-vertex matrix ``A`` with
  one row per *foreground* pixel and the 3 barycentric weights at the
  triangle's vertex columns (interpolate_module.cpp / drtk/interpolate.py:
  54-120). Dynamic ``nonzero`` shapes are banned under ``jit``; we return a
  fixed-capacity masked CSR-like structure (see :class:`InterpolationMatrix`).

* :func:`interpolation_normal_matrix` — ``A.T @ A`` without materializing
  ``A`` (drtk/interpolate.py:124-192): per foreground pixel the nine products
  ``bary_i * bary_j`` accumulate into the COO entry for vertex pair
  ``(vi_i, vi_j)``. The reference memoizes the topology-dependent CSR
  structure in a mutex-guarded LRU (interpolate_module.cpp:36-113); we
  memoize the same structure in a Python-level LRU keyed on the topology
  buffer, built either by the C++ native helper (drtk_tpu/native) or numpy.

* :func:`interpolate_ref` — float64 oracle mirroring drtk/interpolate.py:
  195-263 including the background-sweep convention.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from drtk_tpu.ops.math import autocast_f32, psum_cotangent
import numpy as np

from drtk_tpu.ops.rasterize import broadcast_vi

__all__ = [
    "interpolate",
    "interpolate_ref",
    "interpolation_matrix",
    "interpolation_normal_matrix",
    "interpolation_normal_matrix_values",
    "interpolation_normal_structure",
    "InterpolationMatrix",
    "NormalMatrix",
    "NormalStructure",
]


def _sweep_pattern(height: int, width: int, channels: int, dtype) -> jnp.ndarray:
    """Background sweep written by the CUDA kernel for index==-1 pixels
    (interpolate_kernel.cu:104-109): channel c gets
    ``(x*2+1)/W - 1`` when c is even, ``(y*2+1)/H - 1`` when c is odd.

    Computed in numpy at trace time and embedded as a literal: XLA is free
    to contract a runtime ``(x*2+1)/W - 1`` inside whatever fusion consumes
    it (observed on CPU: a reciprocal-multiply giving 1-ulp drift), which
    would break the bit-exact viewport/banding contract."""
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    sx = jnp.asarray(
        (np.arange(width, dtype=np_dtype) * np_dtype.type(2) + np_dtype.type(1))
        / np_dtype.type(width) - np_dtype.type(1))
    sy = jnp.asarray(
        (np.arange(height, dtype=np_dtype) * np_dtype.type(2) + np_dtype.type(1))
        / np_dtype.type(height) - np_dtype.type(1))
    img_x = jnp.broadcast_to(sx[None, :], (height, width))
    img_y = jnp.broadcast_to(sy[:, None], (height, width))
    chans = [img_x if c % 2 == 0 else img_y for c in range(channels)]
    return jnp.stack(chans, axis=0)  # [C, H, W]


def _sweep_pattern_viewport(
    height: int, width: int, channels: int, dtype, y_offset, full_height: int
) -> jnp.ndarray:
    """Rows [y_offset, y_offset+height) of the FULL-frame sweep pattern —
    bit-exact with _sweep_pattern(full_height, ...) at those rows.
    ``y_offset`` may be traced (shard_map axis_index / scan carry), so the
    row values are GATHERED from the numpy-computed full-height sweep
    vector (same literals as :func:`_sweep_pattern` — see its docstring
    for why the values must not be recomputed in XLA)."""
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    y_off = jnp.asarray(y_offset, jnp.int32)
    sx = jnp.asarray(
        (np.arange(width, dtype=np_dtype) * np_dtype.type(2) + np_dtype.type(1))
        / np_dtype.type(width) - np_dtype.type(1))
    sy_full = jnp.asarray(
        (np.arange(full_height, dtype=np_dtype) * np_dtype.type(2)
         + np_dtype.type(1)) / np_dtype.type(full_height) - np_dtype.type(1))
    rows = jnp.arange(height, dtype=jnp.int32) + y_off
    sy = sy_full[rows]
    img_x = jnp.broadcast_to(sx[None, :], (height, width))
    img_y = jnp.broadcast_to(sy[:, None], (height, width))
    chans = [img_x if c % 2 == 0 else img_y for c in range(channels)]
    return jnp.stack(chans, axis=0)  # [C, H, W]


def _pix_vi(vi: jnp.ndarray, index_img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    mask = index_img >= 0
    safe = jnp.maximum(index_img, 0)
    pix_vi = jax.vmap(lambda vib, ii: vib[ii])(vi, safe)  # [N, H, W, 3]
    return pix_vi, mask


def _gather_face_attrs(vert_attributes, vi, index_img):
    """Per-pixel [N, H, W, 3, C] attribute rows via ONE packed row gather
    from the [N, F, 3C] face-attribute table (row gathers are ~2x faster
    than small element gathers on TPU).

    The table rows are padded to a multiple of 8 and the gather result is
    reshaped to image-major form immediately: a bare [P, 3C] gather output
    with small 3C tile-pads its minor dim to 128 in HBM (21x expansion —
    8 GB at 4K for uv attributes), while the image-major reshape lets XLA
    lay the buffer out along the big pixel axes.
    """
    n, h, w = index_img.shape
    c = vert_attributes.shape[-1]
    table = jax.vmap(lambda ab, vib: ab[vib])(vert_attributes, vi)  # [N,F,3,C]
    # Binned-matmul row fetch (segment_rows.gather_rows_by_index):
    # bit-exact, ~4x the XLA element-rate gather; background pixels read
    # zero rows (the caller masks against the sweep either way).
    from drtk_tpu.ops.segment_rows import gather_rows_by_index

    rows = gather_rows_by_index(
        table.reshape(n, -1, 3 * c), index_img,
        interpret=jax.devices()[0].platform != "tpu",
    )  # [N, H, W, 3C]
    return rows.reshape(n, h, w, 3, c)


def _interpolate_fwd_math(vert_attributes, vi, index_img, bary_img):
    n, h, w = index_img.shape
    c = vert_attributes.shape[-1]
    dtype = vert_attributes.dtype

    mask = index_img >= 0
    attrs = _gather_face_attrs(vert_attributes, vi, index_img)
    bary = jnp.moveaxis(bary_img, 1, -1)  # [N, H, W, 3]
    out = jnp.sum(attrs * bary[..., None], axis=-2)  # [N, H, W, C]
    out = jnp.moveaxis(out, -1, 1)  # [N, C, H, W]

    sweep = _sweep_pattern(h, w, c, dtype)[None]
    return jnp.where(mask[:, None], out, sweep)


@jax.custom_vjp
def _interpolate_core(vert_attributes, vi, index_img, bary_img):
    return _interpolate_fwd_math(vert_attributes, vi, index_img, bary_img)


def _interpolate_core_fwd(vert_attributes, vi, index_img, bary_img):
    out = _interpolate_fwd_math(vert_attributes, vi, index_img, bary_img)
    return out, (vert_attributes, vi, index_img, bary_img)


def _interpolate_core_bwd(res, grad_out):
    """Mirrors interpolate_backward_kernel (interpolate_kernel.cu:115-299):
    grad_bary_i = sum_c grad_out_c * attr[vi_i, c];
    grad_attr[vi_i, c] += bary_i * grad_out_c. Background pixels contribute
    nothing (the sweep is a constant)."""
    vert_attributes, vi, index_img, bary_img = res
    dtype = vert_attributes.dtype
    n = index_img.shape[0]
    num_v = vert_attributes.shape[1]
    c = vert_attributes.shape[-1]

    mask = index_img >= 0
    maskf = mask.astype(dtype)

    g = jnp.moveaxis(grad_out, 1, -1) * maskf[..., None]  # [N, H, W, C]

    # grad wrt bary_img
    attrs = _gather_face_attrs(vert_attributes, vi, index_img)
    grad_bary = jnp.einsum("nhwc,nhwkc->nhwk", g, attrs)
    grad_bary_img = jnp.moveaxis(grad_bary, -1, 1)  # [N, 3, H, W]

    # grad wrt vertex attributes: pixel -> face reduction through the
    # binned-matmul accumulator with bins derived from index_img itself
    # (no geometry hint needed), then the cheap face -> vertex reduction.
    # Wide (x64) cotangents and shard_map blocks take the plain
    # dtype-preserving scatter inside scatter_rows_to_faces.
    from drtk_tpu.ops.segment_rows import scatter_rows_to_faces

    h, w = index_img.shape[1:]
    bary = jnp.moveaxis(bary_img, 1, -1)  # [N, H, W, 3]
    contrib = bary[..., None] * g[..., None, :]  # [N, H, W, 3, C]
    f_cnt = vi.shape[1]
    grad_face = scatter_rows_to_faces(
        contrib.reshape(n, h, w, 3 * c), index_img, None, vi,
        interpret=jax.devices()[0].platform != "tpu",
    ).reshape(n, f_cnt * 3, c)

    def scatter_vert(ids, vals):
        return jnp.zeros((num_v, c), grad_face.dtype).at[ids].add(vals)

    grad_attr = jax.vmap(scatter_vert)(vi.reshape(n, -1), grad_face)
    return (
        psum_cotangent(grad_attr.astype(dtype), vert_attributes),
        None,
        None,
        grad_bary_img.astype(bary_img.dtype),
    )


_interpolate_core.defvjp(_interpolate_core_fwd, _interpolate_core_bwd)


@jax.custom_vjp
def _interpolate_core_geom(vert_attributes, vi, index_img, bary_img, geom):
    return _interpolate_fwd_math(vert_attributes, vi, index_img, bary_img)


def _interpolate_core_geom_fwd(vert_attributes, vi, index_img, bary_img, geom):
    out = _interpolate_fwd_math(vert_attributes, vi, index_img, bary_img)
    return out, (vert_attributes, vi, index_img, bary_img, geom)


def _interpolate_core_geom_bwd(res, grad_out):
    """Same math as _interpolate_core_bwd, but the attribute-gradient
    reduction goes through the binned-matmul accumulator using the caller's
    pixel-space geometry (the same (v_pix, vi) that produced index_img)."""
    vert_attributes, vi, index_img, bary_img, geom = res
    dtype = vert_attributes.dtype
    n, h, w = index_img.shape
    num_v = vert_attributes.shape[1]
    c = vert_attributes.shape[-1]

    mask = index_img >= 0
    g = jnp.moveaxis(grad_out, 1, -1) * mask[..., None].astype(dtype)

    attrs = _gather_face_attrs(vert_attributes, vi, index_img)
    grad_bary = jnp.einsum("nhwc,nhwkc->nhwk", g, attrs)
    grad_bary_img = jnp.moveaxis(grad_bary, -1, 1)

    from drtk_tpu.ops.segment_rows import scatter_rows_to_faces

    bary = jnp.moveaxis(bary_img, 1, -1)
    contrib = (bary[..., None] * g[..., None, :]).reshape(n, h, w, 3 * c)
    grad_face = scatter_rows_to_faces(
        contrib, index_img, geom, vi,
        interpret=jax.devices()[0].platform != "tpu",
    ).astype(dtype)
    grad_face = grad_face.reshape(n, -1, c)

    def scatter_vert(ids, vals):
        return jnp.zeros((num_v, c), grad_face.dtype).at[ids].add(vals)

    grad_attr = jax.vmap(scatter_vert)(vi.reshape(n, -1), grad_face)
    return (
        psum_cotangent(grad_attr.astype(dtype), vert_attributes),
        None,
        None,
        grad_bary_img.astype(bary_img.dtype),
        jnp.zeros_like(geom),
    )


_interpolate_core_geom.defvjp(
    _interpolate_core_geom_fwd, _interpolate_core_geom_bwd
)


def interpolate(
    vert_attributes: jnp.ndarray,
    vi: jnp.ndarray,
    index_img: jnp.ndarray,
    bary_img: jnp.ndarray,
    v_pix: jnp.ndarray = None,
    y_offset: "int | jnp.ndarray" = 0,
    full_height: int | None = None,
) -> jnp.ndarray:
    """Linearly interpolate vertex attributes over rasterized pixels.

    Mirrors ``drtk.interpolate`` (drtk/interpolate.py:20-51).

    Args:
        vert_attributes: [N, V, C] vertex attributes.
        vi: [N, F, 3] or [F, 3] int32 face indices.
        index_img: [N, H, W] int32 triangle index image (-1 = background).
        bary_img: [N, 3, H, W] barycentric image.
        v_pix: optional [N, V, 3] pixel-space geometry that produced
            ``index_img`` (drtk_tpu extension): when given, the
            attribute-gradient reduction uses the binned-matmul accumulator
            on TPU instead of a plain scatter (~2x faster backward for
            attribute fits). Results are identical up to fp accumulation
            order.
        y_offset/full_height: row-tile viewport (drtk_tpu extension, as on
            :func:`drtk_tpu.rasterize`): when this block holds rows
            [y_offset, y_offset+H) of a full_height-row frame, the
            background sweep is computed with GLOBAL rows, so the block is
            bit-exact with the corresponding rows of the full-frame call
            even at background pixels. ``y_offset`` may be traced.

    Returns:
        [N, C, H, W] interpolated image. Background pixels contain the
        deterministic -1..1 sweep pattern and must be ignored by the caller
        (matching the reference's documented contract).
    """
    # Autocast parity (interpolate_module.cpp Autocast impls): f16/bf16
    # inputs compute in float32.
    vert_attributes = autocast_f32(vert_attributes)
    bary_img = autocast_f32(bary_img)
    if vert_attributes.ndim != 3:
        raise ValueError(
            f"interpolate: expected [N, V, C] attributes, got {vert_attributes.shape}"
        )
    vi = broadcast_vi(vi, vert_attributes.shape[0])
    if bary_img.ndim != 4 or bary_img.shape[1] != 3:
        raise ValueError(
            f"interpolate: expected bary_img [N, 3, H, W], got {bary_img.shape}"
        )
    if v_pix is not None:
        out = _interpolate_core_geom(
            vert_attributes, vi, index_img, bary_img, v_pix
        )
    else:
        out = _interpolate_core(vert_attributes, vi, index_img, bary_img)
    if full_height is not None:
        # Replace the block-local sweep with the global-row sweep OUTSIDE
        # the custom-VJP cores: the sweep is constant, and the where passes
        # foreground cotangents through unchanged (background grads are
        # masked inside the cores anyway), so gradients are identical.
        n, h, w = index_img.shape
        sweep = _sweep_pattern_viewport(
            h, w, vert_attributes.shape[-1], out.dtype, y_offset,
            int(full_height),
        )
        out = jnp.where((index_img >= 0)[:, None], out, sweep[None])
    return out


def interpolate_ref(
    vert_attributes: jnp.ndarray,
    vi: jnp.ndarray,
    index_img: jnp.ndarray,
    bary_img: jnp.ndarray,
) -> jnp.ndarray:
    """Float64 oracle mirroring drtk/interpolate.py:195-263.

    Deliberately shares NO code with the op's forward: per-corner element
    gathers (not the packed face-row gather), the sum formed corner by
    corner, and the background sweep assembled with the torch ref's
    tile-the-xy-pair trick — so a bug introduced into
    ``_interpolate_fwd_math`` makes the oracle tests fail.
    """
    orig_dtype = vert_attributes.dtype
    f64 = jnp.float64
    va = vert_attributes.astype(f64)
    bary = jnp.moveaxis(bary_img.astype(f64), 1, -1)  # [N, H, W, 3]
    vi = broadcast_vi(vi, va.shape[0])
    n, h, w = index_img.shape
    c = va.shape[-1]

    safe = jnp.maximum(index_img, 0)
    vi_img = jax.vmap(lambda vib, ii: vib[ii])(vi, safe)  # [N, H, W, 3]
    out = jnp.zeros((n, h, w, c), f64)
    for k in range(3):
        corner = jax.vmap(lambda ab, ii: ab[ii])(va, vi_img[..., k])
        out = out + corner * bary[..., k : k + 1]

    # -1..1 sweep at background (interpolate_kernel.cu:104-109), built as
    # the torch ref does: tile the (x, y) channel pair out to C channels.
    sx = (jnp.arange(w, dtype=f64) * 2.0 + 1.0) / w - 1.0
    sy = (jnp.arange(h, dtype=f64) * 2.0 + 1.0) / h - 1.0
    pair = jnp.stack(
        [jnp.broadcast_to(sx[None, :], (h, w)),
         jnp.broadcast_to(sy[:, None], (h, w))],
        axis=-1,
    )
    sweep = jnp.tile(pair, (1, 1, (c + 1) // 2))[..., :c]
    out = jnp.where((index_img != -1)[..., None], out, sweep[None])
    return jnp.moveaxis(out, -1, 1).astype(orig_dtype)


# --------------------------------------------------------------------------
# Sparse interpolation matrix (fixed-capacity, jit-safe)
# --------------------------------------------------------------------------


class InterpolationMatrix(NamedTuple):
    """Masked fixed-capacity replacement for the reference's CSR tensor.

    The reference builds rows with ``nonzero(index_img != -1)``
    (interpolate_kernel.cu:735-737) — a dynamic shape, which is banned under
    ``jit`` (SURVEY.md §5.8). Instead every pixel owns a row slot; background
    rows are masked out. ``A @ x`` and ``A.T @ y`` are provided as methods so
    downstream solvers don't need to materialize anything.

    Attributes:
        cols: [N, H*W, 3] int32 vertex column indices (0 for masked rows).
        vals: [N, H*W, 3] barycentric values, already sorted by column within
            each row (matching sorted_corner_order, interpolate_kernel.cu:
            17-36); zeros for masked rows.
        row_valid: [N, H*W] bool, True where index_img != -1.
        num_vertices: static int, number of columns.
    """

    cols: jnp.ndarray
    vals: jnp.ndarray
    row_valid: jnp.ndarray
    num_vertices: int

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """A @ x. x: [N, V, C] -> [N, H*W, C] (zeros at masked rows)."""
        gathered = jax.vmap(lambda xb, cb: xb[cb])(x, self.cols)  # [N,P,3,C]
        out = jnp.sum(gathered * self.vals[..., None], axis=-2)
        return out * self.row_valid[..., None]

    def rmatvec(self, y: jnp.ndarray) -> jnp.ndarray:
        """A.T @ y. y: [N, H*W, C] -> [N, V, C]."""
        n, p, c = y.shape
        contrib = self.vals[..., None] * (y * self.row_valid[..., None])[..., None, :]

        def scatter_one(ids, vals):
            return jnp.zeros((self.num_vertices, c), y.dtype).at[ids].add(vals)

        return jax.vmap(scatter_one)(
            self.cols.reshape(n, -1), contrib.reshape(n, -1, c)
        )

    def todense(self) -> jnp.ndarray:
        """[N, H*W, V] dense matrix (tests / small problems only)."""
        n, p, _ = self.cols.shape

        def dense_one(cols, vals, valid):
            a = jnp.zeros((p, self.num_vertices), self.vals.dtype)
            rows = jnp.broadcast_to(jnp.arange(p)[:, None], (p, 3))
            return a.at[rows.reshape(-1), cols.reshape(-1)].add(
                (vals * valid[:, None]).reshape(-1)
            )

        return jax.vmap(dense_one)(self.cols, self.vals, self.row_valid)


def interpolation_matrix(
    vi: jnp.ndarray,
    index_img: jnp.ndarray,
    bary_img: jnp.ndarray,
    num_vertices: int,
) -> InterpolationMatrix:
    """Build the pixel-to-vertex interpolation matrix.

    JIT-safe analogue of ``drtk.interpolation_matrix``
    (drtk/interpolate.py:54-120): same values and in-row column sorting, but
    rows are a fixed [N, H*W] grid with a validity mask instead of compacted
    CSR (dynamic shapes are not expressible under jit; background rows are
    masked). Gradients flow to ``bary_img`` through ``vals``.
    """
    bary_img = autocast_f32(bary_img)
    vi = broadcast_vi(vi, index_img.shape[0])
    n, h, w = index_img.shape
    pix_vi, mask = _pix_vi(vi, index_img)
    bary = jnp.moveaxis(bary_img, 1, -1)  # [N, H, W, 3]

    cols = pix_vi.reshape(n, h * w, 3)
    vals = bary.reshape(n, h * w, 3)
    # Sort the 3 entries of each row by column index (kernel.cu:17-36).
    order = jnp.argsort(cols, axis=-1)
    cols = jnp.take_along_axis(cols, order, axis=-1)
    vals = jnp.take_along_axis(vals, order, axis=-1)

    valid = mask.reshape(n, h * w)
    cols = jnp.where(valid[..., None], cols, 0)
    vals = vals * valid[..., None]
    return InterpolationMatrix(cols, vals, valid, int(num_vertices))


class NormalMatrix(NamedTuple):
    """COO-ish representation of A.T @ A (shared across the batch dim is NOT
    assumed: values have a batch axis; the structure is per-topology).

    Attributes:
        rows/cols: [nnz] int32 COO structure (upper+lower, deduplicated),
            topology-only.
        vals: [N, nnz] accumulated ``bary_i * bary_j`` products.
        num_vertices: static int.
    """

    rows: jnp.ndarray
    cols: jnp.ndarray
    vals: jnp.ndarray
    num_vertices: int

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """(A.T A) @ x with x: [N, V, C] -> [N, V, C]."""

        def one(vals_b, xb):
            gathered = xb[self.cols] * vals_b[:, None]
            return jnp.zeros_like(xb).at[self.rows].add(gathered)

        return jax.vmap(one)(self.vals, x)

    def todense(self) -> jnp.ndarray:
        def one(vals_b):
            a = jnp.zeros((self.num_vertices, self.num_vertices), vals_b.dtype)
            return a.at[self.rows, self.cols].add(vals_b)

        return jax.vmap(one)(self.vals)


# Topology-structure cache, mirroring the reference's LRU
# (interpolate_module.cpp:36-113). Keyed outside jit on the topology bytes.
_NORMAL_STRUCTURE_CACHE: dict = {}
_NORMAL_STRUCTURE_CACHE_MAX = 128


def _build_normal_structure(vi_np: np.ndarray, num_vertices: int):
    """Build the deduplicated pair structure on host (the reference does this
    on CPU too: interpolate_module.cpp:124-219). Returns (rows, cols,
    pair_slot [F, 9]) where pair_slot maps face-pair k=i*3+j to its nnz slot.

    Uses the C++ native helper when available, else numpy sort/unique.
    """
    try:
        from drtk_tpu.native import build_pair_structure

        return build_pair_structure(vi_np, num_vertices)
    except Exception:
        pass

    f = vi_np.shape[0]
    vi64 = vi_np.astype(np.int64)
    # directed pairs (i, j) for all 9 combinations per face
    rows = np.repeat(vi64, 3, axis=1).reshape(f, 9)  # i index repeated
    cols = np.tile(vi64, (1, 3)).reshape(f, 9)  # j index tiled
    keys = rows * num_vertices + cols
    uniq, inverse = np.unique(keys.reshape(-1), return_inverse=True)
    out_rows = (uniq // num_vertices).astype(np.int32)
    out_cols = (uniq % num_vertices).astype(np.int32)
    pair_slot = inverse.reshape(f, 9).astype(np.int32)
    return out_rows, out_cols, pair_slot


def _normal_structure_cached(vi: jnp.ndarray, num_vertices: int):
    vi_np = np.asarray(jax.device_get(vi))
    key = (vi_np.tobytes(), vi_np.shape, int(num_vertices))
    hit = _NORMAL_STRUCTURE_CACHE.get(key)
    if hit is None:
        hit = _build_normal_structure(vi_np, num_vertices)
        if len(_NORMAL_STRUCTURE_CACHE) >= _NORMAL_STRUCTURE_CACHE_MAX:
            _NORMAL_STRUCTURE_CACHE.pop(next(iter(_NORMAL_STRUCTURE_CACHE)))
        _NORMAL_STRUCTURE_CACHE[key] = hit
    return hit


class NormalStructure(NamedTuple):
    """Topology-only sparsity structure of A.T @ A (the part the reference's
    C++ module caches per face tensor, interpolate_module.cpp:36-113):

    Attributes:
        rows/cols: [nnz] int32 COO pair structure (deduplicated).
        pair_slot: [F, 9] int32, mapping face-pair k = i*3+j to its nnz slot
            (the per-face lookup table the value kernel consumes,
            interpolate_module.cpp:538-582).
        num_vertices: static int.
    """

    rows: jnp.ndarray
    cols: jnp.ndarray
    pair_slot: jnp.ndarray
    num_vertices: int


def interpolation_normal_structure(
    vi: jnp.ndarray, num_vertices: int
) -> NormalStructure:
    """Build (or fetch from the LRU cache) the topology-only structure of
    the normal matrix for face tensor ``vi`` ([F, 3] or [N, F, 3] with
    shared topology). Host-side, like the reference's CSR analysis."""
    vi2d = vi if vi.ndim == 2 else vi[0]
    rows, cols, pair_slot = _normal_structure_cached(vi2d, int(num_vertices))
    return NormalStructure(
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(pair_slot),
        int(num_vertices),
    )


def interpolation_normal_matrix_values(
    structure: NormalStructure,
    vi: jnp.ndarray,
    index_img: jnp.ndarray,
    bary_img: jnp.ndarray,
) -> jnp.ndarray:
    """Value-only recompute of the normal matrix against a cached structure
    — the explicit analogue of the reference's value kernel
    (interpolate_module.cpp:538-582 + normal_matrix_kernel.cu), which reuses
    the CSR analysis across frames and only re-accumulates the nine
    ``bary_i * bary_j`` products per foreground pixel.

    Fully jit-safe (the structure is ordinary arrays, so iterative solvers
    can close over one structure and call this every rasterization) and
    differentiable w.r.t. ``bary_img`` via the product rule.

    Returns [N, nnz] values aligned with ``structure.rows/cols``.
    """
    bary_img = autocast_f32(bary_img)
    vi_b = broadcast_vi(vi, index_img.shape[0])
    n, h, w = index_img.shape
    _, mask = _pix_vi(vi_b, index_img)
    bary = jnp.moveaxis(bary_img, 1, -1)  # [N, H, W, 3]
    maskf = mask.astype(bary.dtype)

    # Nine products per pixel: prod[k] = bary_i * bary_j, k = i*3+j.
    prod = (bary[..., :, None] * bary[..., None, :]).reshape(n, h * w, 9)
    prod = prod * maskf.reshape(n, h * w, 1)

    safe_index = jnp.maximum(index_img, 0).reshape(n, h * w)
    slots = structure.pair_slot[safe_index]  # [N, H*W, 9]
    nnz = structure.rows.shape[0]

    def scatter_one(slots_b, prod_b):
        return jnp.zeros((nnz,), bary.dtype).at[slots_b.reshape(-1)].add(
            prod_b.reshape(-1)
        )

    return jax.vmap(scatter_one)(slots, prod)


def interpolation_normal_matrix(
    vi: jnp.ndarray,
    index_img: jnp.ndarray,
    bary_img: jnp.ndarray,
    num_vertices: int,
) -> NormalMatrix:
    """Assemble A.T @ A directly (drtk/interpolate.py:124-192).

    The topology structure is built on host and cached (like the reference's
    CSR LRU) via :func:`interpolation_normal_structure`; the numeric
    accumulation runs on device through
    :func:`interpolation_normal_matrix_values` and is differentiable w.r.t.
    ``bary_img``. ``vi`` must be [F, 3] (shared topology) or [N, F, 3] with
    identical topology per batch element — the reference has the same
    restriction via its per-tensor cache.
    """
    structure = interpolation_normal_structure(vi, int(num_vertices))
    vals = interpolation_normal_matrix_values(
        structure, vi, index_img, bary_img
    )
    return NormalMatrix(
        structure.rows, structure.cols, vals, int(num_vertices)
    )
