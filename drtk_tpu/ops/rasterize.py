"""Differentiable-pipeline rasterizer (non-differentiable stage), TPU-native.

Replicates the behaviour of the reference rasterizer
(`src/rasterize/rasterize_kernel.cu` in facebookresearch/DRTK) with a
TPU-first design:

* The reference launches one CUDA thread per (batch, triangle) and resolves
  depth with a packed ``atomicMin`` over ``(float_bits(depth) << 32) | id``
  (rasterize_kernel.cu:155-161). Atomics do not exist on TPU; instead we do a
  **triangle setup pass** in plain XLA (edge equations as affine functions of
  pixel coordinates) followed by a **tile-local z-buffer resolve** where the
  running minimum lives in registers/VMEM. The packed-key ordering is
  reproduced exactly: smaller depth wins, ties broken by smaller triangle id.

* Conventions preserved (rasterize_kernel.cu:69-168):
  - pixel centers at integer coordinates,
  - canonical edge functions ordered by vertex index so shared edges are
    watertight (rasterize_kernel.cu:29-40),
  - top-left fill rule (:133-145),
  - z > 1e-8 near-plane cull, canvas cull, degenerate-triangle (padding) skip,
  - perspective depth via linear interpolation of 1/z (:150-153),
  - output contract: int32 ``index_img`` with -1 background, float32 depth
    with 0 background (unpack_kernel :402-415),
  - most significant nibble of ``vi[..., 0]`` is masked off (:74), capping
    vertex count at 2**28 (checked in the wrapper like rasterize_kernel.cu
    :459-462).

* Wireframe mode replicates ``rasterize_lines_kernel`` (:220-399): diamond-exit
  line rasterization with per-edge visibility bits in the top nibble of
  ``vi[..., 0]``.

The forward is completely non-differentiable, like the reference
(`rasterize_module.cpp:43-51`): gradients at visibility discontinuities come
from :func:`drtk_tpu.edge_grad_estimator`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from drtk_tpu.ops.math import epsclamp, vary_like

__all__ = ["rasterize", "rasterize_with_depth"]

_INT32_MAX = jnp.iinfo(jnp.int32).max
# Near-plane epsilon: all three camera-space z must exceed this
# (rasterize_kernel.cu:96).
_Z_CULL_EPS = 1e-8


def broadcast_vi(vi: jnp.ndarray, batch: int) -> jnp.ndarray:
    """[F, 3] -> [N, F, 3] broadcast, mirroring drtk/rasterize.py:61-62."""
    if vi.ndim == 2:
        vi = jnp.broadcast_to(vi[None], (batch,) + vi.shape)
    return vi


class TriangleSetup(NamedTuple):
    """Per-triangle screen-space setup, all shapes [N, F, ...].

    Edge i's signed value at pixel (x, y) is ``ea[i]*x + eb[i]*y + ec[i]``,
    equal (up to fp rounding) to ``sign(den) * canonical_edge_function_i`` in
    rasterize_kernel.cu:120-125. The inverse depth at a covered pixel is
    ``sum_i e_i * q[i]`` with ``q[i] = (1/epsclamp(z_i)) / |den|``.
    """

    ea: jnp.ndarray  # [N, F, 3] edge x-coefficients
    eb: jnp.ndarray  # [N, F, 3] edge y-coefficients
    ec: jnp.ndarray  # [N, F, 3] edge constants
    topleft: jnp.ndarray  # [N, F, 3] bool, top-left fill-rule flag per edge
    q: jnp.ndarray  # [N, F, 3] inverse-depth coefficients
    valid: jnp.ndarray  # [N, F] bool, triangle participates at all
    bbox: jnp.ndarray  # [N, F, 4] float32: min_x, min_y, max_x, max_y (pixels)


def _gather_faces(v: jnp.ndarray, vi: jnp.ndarray) -> jnp.ndarray:
    """Gather per-face vertex rows: v [N,V,C], vi [N,F,3] -> [N,F,3,C]."""
    return jax.vmap(lambda vb, vib: vb[vib])(v, vi)


def triangle_setup(v: jnp.ndarray, vi: jnp.ndarray) -> TriangleSetup:
    """Screen-space triangle setup (the XLA analogue of the per-thread
    prologue in rasterize_kernel.cu:73-114)."""
    # Mask the wireframe nibble off vi_0 (rasterize_kernel.cu:74).
    vi0 = (vi[..., 0].astype(jnp.uint32) & jnp.uint32(0x0FFFFFFF)).astype(jnp.int32)
    vi1 = vi[..., 1]
    vi2 = vi[..., 2]
    vi_m = jnp.stack([vi0, vi1, vi2], axis=-1)

    degenerate = (vi0 == vi1) & (vi1 == vi2)

    f = _gather_faces(v, vi_m)  # [N, F, 3, 3]
    p = f[..., :2]  # [N, F, 3(corner), 2(xy)]
    z = f[..., 2]  # [N, F, 3]

    p0, p1, p2 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    v01 = p1 - p0
    v02 = p2 - p0
    v12 = p2 - p1

    den = v01[..., 0] * v02[..., 1] - v01[..., 1] * v02[..., 0]  # [N, F]
    sgn = jnp.sign(den)

    min_p = jnp.minimum(jnp.minimum(p0, p1), p2)
    max_p = jnp.maximum(jnp.maximum(p0, p1), p2)

    all_z_pos = jnp.all(z > _Z_CULL_EPS, axis=-1)
    # Canvas cull happens in the resolve (needs H/W); record bbox instead.
    bbox = jnp.concatenate([min_p, max_p], axis=-1)

    valid = all_z_pos & (den != 0) & (~degenerate)

    # --- Canonical edge functions as affine coefficients -------------------
    # edge(pa, pb, p) = vab.x*(p.y - pa.y) - vab.y*(p.x - pa.x)
    #   -> a = -vab.y, b = vab.x, c = vab.y*pa.x - vab.x*pa.y
    # canonical_edge(via, vib, ...) anchors c at pa when via <= vib, at pb
    # otherwise (equivalent to the swap in rasterize_kernel.cu:29-40).
    def edge_coeffs(via, vib, pa, pb):
        vab = pb - pa
        a = -vab[..., 1]
        b = vab[..., 0]
        swap = via > vib
        anchor = jnp.where(swap[..., None], pb, pa)
        c = vab[..., 1] * anchor[..., 0] - vab[..., 0] * anchor[..., 1]
        return a, b, c

    # Edge order mirrors the bary components (rasterize_kernel.cu:120-124):
    # bary.x <- edge(vi1, vi2), bary.y <- edge(vi2, vi0), bary.z <- edge(vi0, vi1)
    a0, b0, c0 = edge_coeffs(vi1, vi2, p1, p2)
    a1, b1, c1 = edge_coeffs(vi2, vi0, p2, p0)
    a2, b2, c2 = edge_coeffs(vi0, vi1, p0, p1)

    ea = jnp.stack([a0, a1, a2], axis=-1) * sgn[..., None]
    eb = jnp.stack([b0, b1, b2], axis=-1) * sgn[..., None]
    ec = jnp.stack([c0, c1, c2], axis=-1) * sgn[..., None]

    # --- Top-left fill-rule flags (rasterize_kernel.cu:133-141) ------------
    def topleft(e):
        pos = (e[..., 1] < 0) | ((e[..., 1] == 0) & (e[..., 0] > 0))
        neg = (e[..., 1] > 0) | ((e[..., 1] == 0) & (e[..., 0] < 0))
        return jnp.where(den > 0, pos, neg)

    def topleft_inv(e):
        # edge 1 uses the opposite orientation (v_02 in the reference).
        pos = (e[..., 1] > 0) | ((e[..., 1] == 0) & (e[..., 0] < 0))
        neg = (e[..., 1] < 0) | ((e[..., 1] == 0) & (e[..., 0] > 0))
        return jnp.where(den > 0, pos, neg)

    tl = jnp.stack([topleft(v12), topleft_inv(v02), topleft(v01)], axis=-1)

    # --- Inverse-depth plane coefficients ----------------------------------
    d_inv = 1.0 / epsclamp(z)  # [N, F, 3]
    q = d_inv / jnp.abs(jnp.where(den == 0, jnp.ones_like(den), den))[..., None]

    return TriangleSetup(ea, eb, ec, tl, q, valid, bbox)


def _canvas_cull(setup: TriangleSetup, height: int, width: int) -> jnp.ndarray:
    """in_canvas test of rasterize_kernel.cu:97-98 (perf-only in a per-pixel
    design except for boundary-exact cases, so preserved for parity)."""
    min_x, min_y = setup.bbox[..., 0], setup.bbox[..., 1]
    max_x, max_y = setup.bbox[..., 2], setup.bbox[..., 3]
    in_canvas = (
        (min_x <= (width - 1)) & (min_y <= (height - 1)) & (max_x > 0) & (max_y > 0)
    )
    return setup.valid & in_canvas


def _resolve_chunk(
    carry: Tuple[jnp.ndarray, jnp.ndarray],
    chunk: Tuple[jnp.ndarray, ...],
    px: jnp.ndarray,
    py: jnp.ndarray,
):
    """Z-buffer merge of one chunk of K triangles over all pixels.

    carry: (best_di [N,H,W] f32 (inverse depth; larger = closer),
            best_id [N,H,W] i32 (INT32_MAX = none))
    chunk: per-triangle setup slices, each [N, K, ...].
    """
    best_di, best_id = carry
    ea, eb, ec, tl, q, valid, tri_id = chunk

    # e: [N, K, 3, H, W] via affine evaluation at pixel centers.
    e = (
        ea[..., None, None] * px
        + eb[..., None, None] * py
        + ec[..., None, None]
    )
    keep_edge = (e > 0) | ((e == 0) & tl[..., None, None])
    inside = jnp.all(e >= 0, axis=2)
    keep = inside & jnp.all(keep_edge | (e != 0), axis=2) & valid[..., None, None]
    # 'keep_edge | (e != 0)' == 'not (on_edge and not top_left)'

    di = jnp.sum(e * q[..., None, None], axis=2)  # [N, K, H, W]

    di = jnp.where(keep, di, -jnp.inf)
    ids = jnp.where(keep, tri_id[..., None, None], _INT32_MAX)

    # Within-chunk reduction: max inverse depth, ties -> min id.
    di_c = jnp.max(di, axis=1)  # [N, H, W]
    id_c = jnp.min(jnp.where(di == di_c[:, None], ids, _INT32_MAX), axis=1)

    take = (di_c > best_di) | ((di_c == best_di) & (id_c < best_id))
    best_di = jnp.where(take, di_c, best_di)
    best_id = jnp.where(take, id_c, best_id)
    return (best_di, best_id), None


def _rasterize_xla(
    v: jnp.ndarray,
    vi: jnp.ndarray,
    height: int,
    width: int,
    chunk: int = 32,
    y_offset=0,
    full_height: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Portable XLA rasterizer: scan over triangle chunks, vectorize over
    pixels. Used on CPU and as the semantics oracle for the Pallas kernel.

    ``y_offset``/``full_height`` select a row-tile viewport: the output is
    rows [y_offset, y_offset + height) of the ``full_height`` x ``width``
    full-frame rasterization, **bit-exactly** — the pixel grid is offset (the
    edge functions are affine in pixel coordinates, so the per-pixel float
    math is identical to the full-frame evaluation) and the canvas cull stays
    against the full canvas. ``y_offset`` may be a traced value (it is a
    per-device quantity under shard_map).
    """
    n, f_cnt = vi.shape[0], vi.shape[1]
    dtype = v.dtype
    setup = triangle_setup(v, vi)
    valid = _canvas_cull(setup, full_height or height, width)

    # Pad triangle count to a multiple of the chunk size.
    f_pad = -f_cnt % chunk
    pad3 = ((0, 0), (0, f_pad), (0, 0))
    ea = jnp.pad(setup.ea, pad3)
    eb = jnp.pad(setup.eb, pad3)
    ec = jnp.pad(setup.ec, pad3)
    tl = jnp.pad(setup.topleft, pad3)
    q = jnp.pad(setup.q, pad3)
    valid = jnp.pad(valid, ((0, 0), (0, f_pad)))
    tri_id = jnp.broadcast_to(
        jnp.arange(f_cnt + f_pad, dtype=jnp.int32)[None], valid.shape
    )

    n_chunks = (f_cnt + f_pad) // chunk

    def to_chunks(x):
        return jnp.moveaxis(
            x.reshape((n, n_chunks, chunk) + x.shape[2:]), 1, 0
        )

    chunks = tuple(to_chunks(x) for x in (ea, eb, ec, tl, q, valid, tri_id))

    px = jnp.arange(width, dtype=dtype)[None, :]
    py = (jnp.arange(height) + y_offset).astype(dtype)[:, None]

    best_di = vary_like(
        jnp.full((n, height, width), -jnp.inf, dtype=dtype), py, setup.ea
    )
    best_id = vary_like(
        jnp.full((n, height, width), _INT32_MAX, dtype=jnp.int32), py, setup.ea
    )

    (best_di, best_id), _ = jax.lax.scan(
        functools.partial(_resolve_chunk, px=px, py=py),
        (best_di, best_id),
        chunks,
    )

    covered = best_id != _INT32_MAX
    index_img = jnp.where(covered, best_id, -1)
    depth_img = jnp.where(covered, 1.0 / epsclamp(best_di), 0.0).astype(dtype)
    return depth_img, index_img


# --------------------------------------------------------------------------
# Wireframe (diamond-exit) mode — rasterize_lines_kernel (kernel.cu:220-399)
# --------------------------------------------------------------------------


def _diamond_crossing(p1x, p1y, p2x, p2y, px, py):
    """True where segment (p1, p2) crosses the unit diamond centred at pixel
    (px, py) — is_crossing_dimond, rasterize_kernel.cu:220-259.

    p1*/p2* are [...] arrays broadcastable against px/py pixel grids.
    """
    # Line through p1, p2: a*x + b*y + c = 0 (get_line, kernel.cu:170-180).
    a0 = p1y - p2y
    b0 = p2x - p1x
    c0 = p1x * p2y - p2x * p1y

    half = jnp.asarray(0.5, p1x.dtype)

    def in_seg(ax, ay, bx, by, cx, cy):
        # is_point_in_segment (kernel.cu:182-190)
        return (
            (((bx >= cx) & (cx >= ax)) | ((bx <= cx) & (cx <= ax)))
            & (((by >= cy) & (cy >= ay)) | ((by <= cy) & (cy <= ay)))
        )

    def seg_cross(s0x, s0y, s1x, s1y):
        # Intersection of the triangle-edge line with diamond side (s0, s1).
        a2 = s0y - s1y
        b2 = s1x - s0x
        c2 = s0x * s1y - s1x * s0y
        d = a0 * b2 - a2 * b0
        big = jnp.asarray(jnp.finfo(p1x.dtype).max, p1x.dtype)
        safe_d = jnp.where(d == 0, 1.0, d)
        cx = jnp.where(d == 0, big, (b0 * c2 - b2 * c0) / safe_d)
        cy = jnp.where(d == 0, big, (a2 * c0 - a0 * c2) / safe_d)
        return in_seg(s0x, s0y, s1x, s1y, cx, cy) & in_seg(p1x, p1y, p2x, p2y, cx, cy)

    hit = seg_cross(px, py - half, px + half, py)
    hit |= seg_cross(px + half, py, px, py + half)
    hit |= seg_cross(px, py + half, px - half, py)
    hit |= seg_cross(px - half, py, px, py - half)
    return hit


def _rasterize_lines_impl(
    v: jnp.ndarray,
    vi: jnp.ndarray,
    height: int,
    width: int,
    chunk: int = 8,
    y_offset=0,
    full_height: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Actual wireframe implementation (see _rasterize_lines_xla docstring).
    ``y_offset``/``full_height``: row-tile viewport, as in _rasterize_xla
    (the border test stays against the full canvas)."""
    n, f_cnt = vi.shape[0], vi.shape[1]
    dtype = v.dtype
    setup = triangle_setup(v, vi)
    valid = _canvas_cull(setup, full_height or height, width)

    flags = (vi[..., 0].astype(jnp.uint32) >> jnp.uint32(28)).astype(jnp.int32)
    vis = jnp.stack([(flags & 1) != 0, (flags & 2) != 0, (flags & 4) != 0], axis=-1)

    vi0 = (vi[..., 0].astype(jnp.uint32) & jnp.uint32(0x0FFFFFFF)).astype(jnp.int32)
    vi_m = jnp.stack([vi0, vi[..., 1], vi[..., 2]], axis=-1)
    fverts = _gather_faces(v, vi_m)  # [N, F, 3, 3]
    p = fverts[..., :2]
    z = fverts[..., 2]
    d_inv = 1.0 / epsclamp(z)  # [N, F, 3]

    p0, p1, p2 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    v01 = p1 - p0
    v02 = p2 - p0
    den_abs = jnp.abs(v01[..., 0] * v02[..., 1] - v01[..., 1] * v02[..., 0])
    inv_den = 1.0 / jnp.where(den_abs == 0, 1.0, den_abs)

    f_pad = -f_cnt % chunk
    pad3 = ((0, 0), (0, f_pad), (0, 0))

    arrs = dict(
        p=jnp.pad(p, ((0, 0), (0, f_pad), (0, 0), (0, 0))),
        ea=jnp.pad(setup.ea, pad3),
        eb=jnp.pad(setup.eb, pad3),
        ec=jnp.pad(setup.ec, pad3),
        tl=jnp.pad(setup.topleft, pad3),
        d_inv=jnp.pad(d_inv, pad3),
        inv_den=jnp.pad(inv_den, ((0, 0), (0, f_pad))),
        valid=jnp.pad(valid, ((0, 0), (0, f_pad))),
        vis=jnp.pad(vis, pad3),
    )
    tri_id = jnp.broadcast_to(
        jnp.arange(f_cnt + f_pad, dtype=jnp.int32)[None], arrs["valid"].shape
    )
    arrs["tri_id"] = tri_id

    n_chunks = (f_cnt + f_pad) // chunk

    def to_chunks(x):
        return jnp.moveaxis(x.reshape((n, n_chunks, chunk) + x.shape[2:]), 1, 0)

    keys = list(arrs)
    chunks = tuple(to_chunks(arrs[k]) for k in keys)

    px = jnp.arange(width, dtype=dtype)[None, :]
    py = (jnp.arange(height) + y_offset).astype(dtype)[:, None]
    xs = jnp.arange(width)
    ys = jnp.arange(height) + y_offset
    border_ok = (
        ((xs >= 1) & (xs <= width - 2))[None, :]
        & ((ys >= 1) & (ys <= (full_height or height) - 2))[:, None]
    )

    def step(carry, chunk_data):
        best_di, best_id = carry
        c = dict(zip(keys, chunk_data))
        pc = c["p"]

        def seg(i, j):
            return _diamond_crossing(
                pc[..., i, 0, None, None],
                pc[..., i, 1, None, None],
                pc[..., j, 0, None, None],
                pc[..., j, 1, None, None],
                px,
                py,
            )

        crossing = (
            (seg(0, 1) & c["vis"][..., 0, None, None])
            | (seg(1, 2) & c["vis"][..., 1, None, None])
            | (seg(0, 2) & c["vis"][..., 2, None, None])
        )

        e = (
            c["ea"][..., :, None, None] * px
            + c["eb"][..., :, None, None] * py
            + c["ec"][..., :, None, None]
        )  # [N, K, 3, H, W]
        keep_edge = (e > 0) | ((e == 0) & c["tl"][..., None, None])
        inside = jnp.all(e >= 0, axis=2) & jnp.all(keep_edge | (e != 0), axis=2)

        write = (inside | crossing) & c["valid"][..., None, None] & border_ok

        # bary_i = clip(e_i / |den|, 0, 1), renormalised (kernel.cu:377-380).
        b = jnp.clip(e * c["inv_den"][..., None, None, None], 0.0, 1.0)
        b = b / jnp.sum(b, axis=2, keepdims=True)
        di = jnp.sum(b * c["d_inv"][..., None, None], axis=2)

        di = jnp.where(write, di, -jnp.inf)
        # Non-crossing interior pixels write id 0xFFFFFFFF == -1 as uint
        # (kernel.cu:387-389); in the packed-min that behaves as id 2^32-1,
        # i.e. it loses id ties but still occludes by depth.
        ids = jnp.where(crossing, c["tri_id"][..., None, None], _INT32_MAX)
        ids = jnp.where(write, ids, _INT32_MAX)

        di_c = jnp.max(di, axis=1)
        id_c = jnp.min(jnp.where(di == di_c[:, None], ids, _INT32_MAX), axis=1)

        take = (di_c > best_di) | ((di_c == best_di) & (id_c < best_id))
        best_di = jnp.where(take, di_c, best_di)
        best_id = jnp.where(take, id_c, best_id)
        return (best_di, best_id), None

    best_di = vary_like(
        jnp.full((n, height, width), -jnp.inf, dtype=dtype), py, setup.ea
    )
    best_id = vary_like(
        jnp.full((n, height, width), _INT32_MAX, dtype=jnp.int32), py, setup.ea
    )
    (best_di, best_id), _ = jax.lax.scan(step, (best_di, best_id), chunks)

    covered = jnp.isfinite(best_di)
    index_img = jnp.where(covered & (best_id != _INT32_MAX), best_id, -1)
    depth_img = jnp.where(covered, 1.0 / epsclamp(best_di), 0.0).astype(dtype)
    return depth_img, index_img


# --------------------------------------------------------------------------
# Public API
# --------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "wireframe", "impl", "full_height"),
)
def _rasterize_dispatch(v, vi, height, width, wireframe, impl, y_offset=0,
                        full_height=None):
    if wireframe:
        if impl == "xla":
            return _rasterize_lines_impl(
                v, vi, height, width, y_offset=y_offset,
                full_height=full_height,
            )
        from drtk_tpu.ops.rasterize_pallas import rasterize_lines_pallas

        return rasterize_lines_pallas(
            v, vi, height, width, y_offset=y_offset, full_height=full_height
        )
    if impl == "xla":
        return _rasterize_xla(
            v, vi, height, width, y_offset=y_offset, full_height=full_height
        )
    # Pallas tile kernel (TPU fast path); row-tile viewports bin against
    # viewport-local tiles and stay bit-exact with the full frame.
    from drtk_tpu.ops.rasterize_pallas import rasterize_pallas

    return rasterize_pallas(
        v, vi, height, width, y_offset=y_offset, full_height=full_height
    )


def _choose_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend at all
        platform = "cpu"
    if platform != "tpu":
        return "xla"
    try:
        from drtk_tpu.ops import rasterize_pallas  # noqa: F401

        return "pallas"
    except ImportError:  # pragma: no cover - during bring-up
        return "xla"


def rasterize_with_depth(
    v: jnp.ndarray,
    vi: jnp.ndarray,
    height: int,
    width: int,
    wireframe: bool = False,
    impl: str = "auto",
    y_offset: "int | jnp.ndarray" = 0,
    full_height: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rasterize and also return the (non-differentiable) depth image.

    Mirrors ``drtk.rasterize_with_depth`` (drtk/rasterize.py:69-103).

    ``y_offset``/``full_height`` select a row-tile viewport (rows
    [y_offset, y_offset+height) of the full_height-row frame), bit-exact
    with the full-frame result; used for pixel sharding
    (drtk_tpu.parallel.spmd). ``y_offset`` may be traced.

    Returns:
        (depth_img [N, H, W] float, index_img [N, H, W] int32). Background
        pixels have depth 0 and index -1.
    """
    if v.ndim != 3 or v.shape[-1] != 3:
        raise ValueError(f"rasterize: expected v of shape [N, V, 3], got {v.shape}")
    if vi.shape[-1] != 3:
        raise ValueError(f"rasterize: expected vi last dim 3, got {vi.shape}")
    if vi.dtype != jnp.int32:
        raise ValueError(f"rasterize: expected int32 vi, got {vi.dtype}")
    if v.shape[1] >= 0x10000000:
        # Top nibble of vi[..., 0] is reserved (rasterize_kernel.cu:459-462).
        raise ValueError("rasterize: at most 2**28 vertices are supported")
    if height <= 0 or width <= 0:
        raise ValueError("rasterize: height and width must be positive")
    vi = broadcast_vi(vi, v.shape[0])
    if vi.shape[0] != v.shape[0]:
        raise ValueError("rasterize: batch size of v and vi must match")
    if v.dtype in (jnp.float16, jnp.bfloat16):
        # Autocast parity: the reference casts half-precision inputs to fp32
        # for rasterization (rasterize_module.cpp:63-71).
        v = v.astype(jnp.float32)

    # Rasterization is wholly non-differentiable (rasterize_module.cpp:43-51);
    # stopping gradients at the input also keeps autodiff from tracing into
    # the Pallas kernel, which defines no JVP rule.
    depth_img, index_img = _rasterize_dispatch(
        jax.lax.stop_gradient(v), vi, height, width, wireframe,
        _choose_impl(impl), y_offset=y_offset, full_height=full_height,
    )
    return jax.lax.stop_gradient(depth_img), index_img


def rasterize(
    v: jnp.ndarray,
    vi: jnp.ndarray,
    height: int,
    width: int,
    wireframe: bool = False,
    impl: str = "auto",
    y_offset: "int | jnp.ndarray" = 0,
    full_height: int | None = None,
) -> jnp.ndarray:
    """Rasterize a mesh; returns the int32 triangle-index image [N, H, W].

    Mirrors ``drtk.rasterize`` (drtk/rasterize.py:17-65). Not differentiable —
    use :func:`drtk_tpu.edge_grad_estimator` for discontinuity gradients.
    See :func:`rasterize_with_depth` for the row-tile viewport arguments.
    """
    _, index_img = rasterize_with_depth(
        v, vi, height, width, wireframe, impl, y_offset, full_height
    )
    return index_img
