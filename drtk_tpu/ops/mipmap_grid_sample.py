"""Mipmapped, anisotropic grid sampling (TPU-native).

Equivalent of the reference's ``mipmap_grid_sampler_ext``
(`src/mipmap_grid_sampler/mipmap_grid_sampler_kernel.cu` and
`drtk/mipmap_grid_sample.py` in facebookresearch/DRTK): ``grid_sample`` plus
OpenGL-spec mip selection (eq. 8.15/8.16, p.255) and anisotropic filtering
with up to ``max_aniso`` taps along the dominant screen-space axis.

TPU-first design notes
----------------------

* The reference passes the pyramid as up to 11 separate tensors marshalled
  through a ``TensorInfoList`` (mipmap_grid_sampler_module.cpp:56-88) and
  each CUDA thread dynamically indexes ``inputs[d1]``. Dynamic per-pixel
  tensor selection does not vectorize on TPU; instead we pack the pyramid
  into a single **texture atlas** (levels concatenated along width). The
  per-pixel mip level then becomes plain coordinate arithmetic — a gather of
  per-level parameters (size, offset) followed by one batched gather into
  the atlas — identical work for every pixel, fully vectorized on the VPU.

* Per-pixel anisotropic tap counts (``N`` from 1 to ``max_aniso``,
  kernel.cu:460-478) are a dynamic trip count. We evaluate all ``max_aniso``
  taps and mask taps ``i >= N`` — the vectorized equivalent of the
  reference's data-dependent loop (wasted lanes are cheaper than divergence
  on a vector machine).

* The backward needs gradients for the texture levels and the grid only —
  the reference returns ``(vector<Tensor> input_grads, Tensor grid_grad)``
  and nothing for ``vt_dxdy_img`` (kernel.cu:1103+). We therefore build the
  forward out of differentiable gathers and ``stop_gradient`` everything
  derived from ``vt_dxdy_img`` (level selection, tap offsets, tap weights);
  JAX autodiff then produces exactly the reference's VJP: scatter-adds into
  the levels (``safe_add_2d``) and the sampling derivative for the grid.

Conventions preserved (kernel.cu:411-631):
  * ``align_corners`` is forced ``False`` inside the kernel (:423).
  * ``px = sqrt((dudx*W)^2 + (dvdx*H)^2 + 1e-12)`` with W, H of the *base*
    level (:458-459).
  * ``N = min(ceil(p_max/p_min), max_aniso)``; ``N = 1`` if ``p_min == 0``.
  * ``lambda = log2(p_max / N)``; NaN/Inf -> 0; clamped to
    ``[0, mipmaps - 1 - 1e-6]``.
  * ``clip_grad``: when the pyramid is truncated (lambda > mipmaps-1),
    rescale the uv-steps by ``exp2(l) * N / p_max`` (:480-493).
  * tap ``i`` offset along the dominant axis: ``(i+1)/(N+1)*2 - 1`` times
    the uv gradient; weights ``(1-a)/N`` for level d1 and ``a/N`` for d1+1.
  * ``force_max_aniso``: always take ``max_aniso`` taps (debug/parity mode).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from drtk_tpu.ops.window_accum import BLK_H as _BLK_H
from drtk_tpu.ops.window_accum import BLK_W as _BLK_W
from drtk_tpu.ops.window_accum import blocked_taps as _blocked_taps

__all__ = ["mipmap_grid_sample", "mipmap_grid_sample_ref"]

_MAX_MIPMAP_COUNT = 11  # kernel.cu:16


# --------------------------------------------------------------------------
# Atlas construction
# --------------------------------------------------------------------------


def _build_atlas(levels: Sequence[jnp.ndarray]):
    """Concatenate mip levels along width into one [N, C, Ha, Wa] texture.

    Returns (atlas, w_tab, h_tab, xoff_tab) where the tables are [Q] int32
    per-level width/height/x-offset (y-offset is always 0).
    """
    n, c = levels[0].shape[:2]
    hs = [lvl.shape[2] for lvl in levels]
    ws = [lvl.shape[3] for lvl in levels]
    ha = max(hs)
    xoffs = []
    off = 0
    for w in ws:
        xoffs.append(off)
        off += w
    wa = off
    atlas = jnp.zeros((n, c, ha, wa), levels[0].dtype)
    for lvl, xo in zip(levels, xoffs):
        atlas = jax.lax.dynamic_update_slice(atlas, lvl, (0, 0, 0, xo))
    return (
        atlas,
        jnp.asarray(ws, jnp.int32),
        jnp.asarray(hs, jnp.int32),
        jnp.asarray(xoffs, jnp.int32),
    )


# --------------------------------------------------------------------------
# Per-pixel-level coordinate math (align_corners always False)
# --------------------------------------------------------------------------


def _unnormalize_dyn(coord: jnp.ndarray, size: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] -> pixel space with a per-pixel size array (align_corners=F)."""
    return ((coord + 1.0) * size - 1.0) / 2.0


def _reflect_dyn(x: jnp.ndarray, low, high) -> jnp.ndarray:
    span = high - low
    span = jnp.where(span == 0, 1.0, span)
    cc = jnp.abs(x - low)
    extra = jnp.mod(cc, span)
    flips = jnp.floor(cc / span)
    return jnp.where(jnp.mod(flips, 2.0) == 0.0, extra + low, span - extra + low)


def _fold_dyn(x: jnp.ndarray, size: jnp.ndarray, padding_mode: str) -> jnp.ndarray:
    """compute_source_index padding fold with per-pixel sizes
    (grid_utils.h:68-81; align_corners=False)."""
    if padding_mode == "border":
        return jnp.clip(x, 0.0, size - 1.0)
    if padding_mode == "reflection":
        x = _reflect_dyn(x, -0.5, size - 0.5)
        return jnp.clip(x, 0.0, size - 1.0)
    return x  # zeros: raw coords, taps bounds-checked at gather time


def _gather_atlas(
    atlas: jnp.ndarray,
    ix: jnp.ndarray,
    iy: jnp.ndarray,
    wp: jnp.ndarray,
    hp: jnp.ndarray,
    xoff: jnp.ndarray,
) -> jnp.ndarray:
    """Gather atlas[n, :, iy, xoff + ix] with per-level bounds masking.

    ix/iy: [N, *S] int32 level-local tap indices; wp/hp/xoff broadcastable
    to the same shape. Out-of-level taps return 0 (the zeros-padding
    contract; border/reflection pre-fold so they never go out of level).
    Returns [N, C, *S].
    """
    n, c, ha, wa = atlas.shape
    inb = (ix >= 0) & (ix < wp) & (iy >= 0) & (iy < hp)
    ixc = jnp.clip(ix, 0, wp - 1) + xoff
    iyc = jnp.clip(iy, 0, hp - 1)

    # Per-channel ELEMENT gathers from a channel-leading flat view. A
    # channels-minor [P, C] gather output tile-pads C=3 -> 128 in HBM (42x
    # memory and traffic); per-channel [P] outputs stay unpadded, which is
    # worth far more than the row-gather dispatch saving.
    flat = (iyc * wa + ixc).reshape(n, -1)
    tab = atlas.reshape(n, c, ha * wa)
    out = jnp.stack(
        [jax.vmap(lambda t, ii: t[ii])(tab[:, k], flat) for k in range(c)],
        axis=1,
    ).reshape((n, c) + ix.shape[1:])
    return jnp.where(inb[:, None], out, 0.0)


def _build_quad_atlas(atlas):
    """Quad table for one-row-per-sample bilinear taps: the atlas (padded
    with a zero ring at top/left so bases one texel outside a level read
    true zeros / the correct shifted neighbor) concatenated with its
    x/y/xy-shifted copies. Returns (quad [N, (Ha+1)*(Wa+1), 4C], Wa+1) —
    rows channels-minor for the gather-unit-bound forward; the backward
    never touches this layout (see _quad_rows_gather).
    """
    n, c, ha, wa = atlas.shape
    t = jnp.moveaxis(atlas, 1, -1)  # [N, Ha, Wa, C]
    t = jnp.pad(t, ((0, 0), (1, 0), (1, 0), (0, 0)))
    tx1 = jnp.concatenate([t[:, :, 1:], jnp.zeros_like(t[:, :, :1])], 2)
    ty1 = jnp.concatenate([t[:, 1:], jnp.zeros_like(t[:, :1])], 1)
    txy = jnp.concatenate([ty1[:, :, 1:], jnp.zeros_like(t[:, :, :1])], 2)
    quad = jnp.concatenate([t, tx1, ty1, txy], -1)
    return quad.reshape(n, (ha + 1) * (wa + 1), 4 * c), wa + 1




@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _quad_rows_gather(quad, by, bx, wq, xoffs):
    """rows[n, k, t, h, w] = quad[n, by*wq + bx, k].

    Forward: ONE row gather per sample (the gather unit amortizes its
    per-element cost over the 4C-float row; per-channel element gathers are
    ~5x slower), transposed straight into the channel-leading
    [N, K, T, H, W] layout — so the padded [P, K]-minor gather result is a
    single transient, never the custom-vjp boundary.

    Backward: the texture gradient goes through
    drtk_tpu.ops.window_accum.window_accumulate instead of XLA's sort-based
    scatter-add, entirely in channel-leading layouts (a [P, K]-minor tensor
    gets (8,128)-tile-padded ~10x in HBM).

    by/bx: [N, T, H, W] int32 (always in bounds);
    quad: [N, Hq*Wq, K]; xoffs: static per-level atlas x-offsets, used by
    the backward to group taps by mip level (levels sit side by side in the
    atlas, so mixed-level pixel blocks would otherwise span it and defeat
    the windows). Returns [N, K, T, H, W].
    """
    n = quad.shape[0]
    k = quad.shape[-1]
    flat = (by * wq + bx).reshape(n, -1)
    rows = jax.vmap(lambda q, ii: q[ii])(quad, flat)  # [N, P, K]
    rows = jnp.moveaxis(rows, -1, 1)  # [N, K, P]
    return rows.reshape((n, k) + by.shape[1:])


def _quad_rows_gather_fwd(quad, by, bx, wq, xoffs):
    # quad[:0] is a zero-byte vma token: under shard_map the cotangent must
    # be psummed down to the primal's varying axes (ops.math.psum_cotangent).
    return _quad_rows_gather(quad, by, bx, wq, xoffs), (
        by, bx, quad.shape, quad[:0]
    )


def _quad_rows_gather_bwd(wq, xoffs, res, g):
    from drtk_tpu.ops.math import psum_cotangent

    by, bx, quad_shape, quad_tok = res
    n, rq, k = quad_shape
    hq = rq // wq

    if g.dtype == jnp.float64 or _varying(g):
        # x64 oracle runs and shard_map blocks: dtype-preserving per-channel
        # scatters (the window path accumulates in f32 / assumes full
        # frames).
        flat = (by * wq + bx).reshape(n, -1)
        gq = jnp.stack(
            [
                jax.vmap(
                    lambda ids, vals: jnp.zeros((rq,), g.dtype)
                    .at[ids]
                    .add(vals)
                )(flat, g[:, j].reshape(n, -1))
                for j in range(k)
            ],
            axis=-1,
        )
        return (psum_cotangent(gq, quad_tok), None, None)

    from drtk_tpu.ops.window_accum import window_accumulate

    t = by.shape[1]
    rows_b = _blocked_taps(g.astype(jnp.float32))  # [N, K, P]
    iy_b = _blocked_taps(by)
    ix_b = _blocked_taps(bx)
    # Inert taps (iy = -1): their coords must not stretch the window
    # bounds. Two kinds — blocked_taps padding (reads texel 0 in fwd), and
    # taps whose cotangent is zero in EVERY channel. The latter is what
    # keeps the fast path alive on real scenes: background pixels carry
    # interpolate's -1..1 sweep pattern as uv, so their taps span the whole
    # mip level and would overflow every pixel block touching background
    # (observed on the avatar4k step: 100% scatter fallback, ~13 s of a
    # 22 s step). Masked pipelines (img * (index != -1)) zero exactly those
    # cotangents, and dropping zero-cotangent taps is exact.
    live = jnp.any(g != 0, axis=1).astype(jnp.int32)  # [N, T, H, W]
    inert = _blocked_taps(live) == 0
    iy_b = jnp.where(inert, -1, iy_b)

    wq_pad = max(-(-wq // 128) * 128, 512)
    hq_pad = max(-(-hq // 8) * 8, 48)
    interpret = jax.devices()[0].platform != "tpu"
    # One accumulate pass per mip level: mask taps to the level's atlas
    # x-range so every block's window covers one level's tight bbox (blocks
    # with no taps at a level cost nothing — their kernel step is fully
    # predicated out). Window 48 x 512: an 8x128-px rect at <=2 texels/px
    # stride plus tap spread and origin alignment.
    bounds = list(xoffs) + [1 << 30]
    acc = 0.0
    for l in range(len(xoffs)):
        in_l = (ix_b >= bounds[l]) & (ix_b < bounds[l + 1])
        acc = acc + window_accumulate(
            rows_b, jnp.where(in_l, iy_b, -1), ix_b, hq_pad, wq_pad,
            block=t * _BLK_H * _BLK_W, win_h=48, win_w=512,
            interpret=interpret,
        )
    gq = acc[:, :, :hq, :wq]
    # back to the forward's flat channels-minor table layout
    gq = jnp.moveaxis(gq.reshape(n, k, rq), 1, -1)
    return (psum_cotangent(gq.astype(g.dtype), quad_tok), None, None)


def _varying(x):
    try:
        return bool(jax.typeof(x).vma)
    except AttributeError:  # pragma: no cover - older jax
        return False


_quad_rows_gather.defvjp(_quad_rows_gather_fwd, _quad_rows_gather_bwd)


def _sample_level_bilinear(quad_info, u, v, wp, hp, xoff, padding_mode):
    """Bilinear sample at normalized (u, v) from the per-pixel level
    described by (wp, hp, xoff): ONE quad-table gather per (sample, channel)
    with a window-accumulated VJP. u/v/wp/hp/xoff: [N, T, H, W] (tap-last
    layout — the minor dims stay the big image axes throughout). Returns
    [N, C, T, H, W]."""
    quad, wq, xoffs = quad_info
    c = quad.shape[-1] // 4
    hq = quad.shape[1] // wq
    x = _fold_dyn(_unnormalize_dyn(u, wp.astype(u.dtype)), wp.astype(u.dtype), padding_mode)
    y = _fold_dyn(_unnormalize_dyn(v, hp.astype(u.dtype)), hp.astype(u.dtype), padding_mode)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    tx = x - x0f
    ty = y - y0f
    ix = x0f.astype(jnp.int32)
    iy = y0f.astype(jnp.int32)

    bx = jnp.clip(xoff + ix + 1, 0, wq - 1)
    by = jnp.clip(iy + 1, 0, hq - 1)
    rows = _quad_rows_gather(quad, by, bx, wq, xoffs)  # [N, 4C, T, H, W]

    wts = [(1 - tx) * (1 - ty), tx * (1 - ty), (1 - tx) * ty, tx * ty]
    if padding_mode == "zeros":
        inx0 = (ix >= 0) & (ix < wp)
        inx1 = (ix + 1 >= 0) & (ix + 1 < wp)
        iny0 = (iy >= 0) & (iy < hp)
        iny1 = (iy + 1 >= 0) & (iy + 1 < hp)
        masks = [inx0 & iny0, inx1 & iny0, inx0 & iny1, inx1 & iny1]
        wts = [w * m for w, m in zip(wts, masks)]
    # border/reflection: coords pre-folded into the level, and the +1 taps
    # carry zero weight exactly at the level edge.
    out = 0.0
    for corner in range(4):
        w_c = wts[corner][:, None].astype(rows.dtype)
        out = out + rows[:, corner * c : (corner + 1) * c] * w_c
    return out  # [N, C, T, H, W]


def _cubic_weights(t: jnp.ndarray, a: float = -0.75):
    t2 = t * t
    t3 = t2 * t
    w0 = a * (t3 - 2 * t2 + t)
    w1 = (a + 2) * t3 - (a + 3) * t2 + 1
    w2 = -(a + 2) * t3 + (2 * a + 3) * t2 - a * t
    w3 = a * (t2 - t3)
    return (w0, w1, w2, w3)


def _sample_level_bicubic_quad(quad_info, u, v, wp, hp, xoff, padding_mode):
    """Bicubic via the quad table (zeros padding only): the 4x4 stencil is a
    2x2 grid of 2x2 texel blocks, so FOUR quad-row gathers replace the 16
    per-channel element gathers of the bounded path — and the texture
    gradient rides the same window-accumulated VJP as bilinear. Out-of-level
    taps are weight-masked (the zeros contract: get_value_bounded returns 0,
    grid_utils.h:83-101), so whatever a clipped quad row gathered is inert.
    """
    quad, wq, xoffs = quad_info
    c = quad.shape[-1] // 4
    hq = quad.shape[1] // wq
    dt = u.dtype
    wpf = wp.astype(dt)
    hpf = hp.astype(dt)
    x = _unnormalize_dyn(u, wpf)
    y = _unnormalize_dyn(v, hpf)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = _cubic_weights(x - x0f)
    wy = _cubic_weights(y - y0f)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    out = 0.0
    for bj in range(2):
        for bi in range(2):
            ix = x0 + (2 * bi - 1)  # level-local x of the block's corner
            iy = y0 + (2 * bj - 1)
            bx = jnp.clip(xoff + ix + 1, 0, wq - 1)
            by = jnp.clip(iy + 1, 0, hq - 1)
            rows = _quad_rows_gather(quad, by, bx, wq, xoffs)
            for corner, (dx_, dy_) in enumerate(
                [(0, 0), (1, 0), (0, 1), (1, 1)]
            ):
                i = 2 * bi + dx_
                j = 2 * bj + dy_
                tx = ix + dx_
                ty = iy + dy_
                inb = (tx >= 0) & (tx < wp) & (ty >= 0) & (ty < hp)
                w_c = (wx[i] * wy[j] * inb)[:, None].astype(rows.dtype)
                out = out + rows[:, corner * c : (corner + 1) * c] * w_c
    return out  # [N, C, T, H, W]


def _sample_level_bicubic(atlas, u, v, wp, hp, xoff, padding_mode):
    """Bicubic (A=-0.75) sample; per-tap bounding like get_value_bounded
    (grid_utils.h:83-120)."""
    dt = u.dtype
    wpf = wp.astype(dt)
    hpf = hp.astype(dt)
    x = _unnormalize_dyn(u, wpf)
    y = _unnormalize_dyn(v, hpf)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = _cubic_weights(x - x0f)
    wy = _cubic_weights(y - y0f)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    def bound(idx, sizef):
        vf = idx.astype(dt)
        if padding_mode == "border":
            vf = jnp.clip(vf, 0, sizef - 1)
        elif padding_mode == "reflection":
            vf = _reflect_dyn(vf, -0.5, sizef - 0.5)
            vf = jnp.clip(vf, 0, sizef - 1)
        return vf.astype(jnp.int32)

    # 16 per-channel element gathers in the tap-last layout: every tensor
    # keeps the big image axes minor, so nothing gets (8,128)-tile-padded.
    out = 0.0
    for j in range(4):
        raw_iy = y0 + (j - 1)
        iy = raw_iy if padding_mode == "zeros" else bound(raw_iy, hpf)
        for i in range(4):
            raw_ix = x0 + (i - 1)
            ix = raw_ix if padding_mode == "zeros" else bound(raw_ix, wpf)
            tap = _gather_atlas(atlas, ix, iy, wp, hp, xoff)  # [N, C, ...]
            out = out + tap * (wx[i] * wy[j])[:, None].astype(tap.dtype)
    return out


# --------------------------------------------------------------------------
# Main op
# --------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_aniso",
        "mode",
        "padding_mode",
        "force_max_aniso",
        "clip_grad",
    ),
)
def _mipmap_grid_sample_impl(
    levels: Tuple[jnp.ndarray, ...],
    grid: jnp.ndarray,
    vt_dxdy_img: jnp.ndarray,
    max_aniso: int,
    mode: str,
    padding_mode: str,
    force_max_aniso: bool,
    clip_grad: bool,
) -> jnp.ndarray:
    q = len(levels)
    n, hout, wout = grid.shape[:3]
    dt = grid.dtype
    base_h, base_w = levels[0].shape[2:]

    atlas, w_tab, h_tab, xoff_tab = _build_atlas(levels)
    # Static per-level x-offsets (level widths are static shapes).
    _ws = [lvl.shape[3] for lvl in levels]
    _hs = [lvl.shape[2] for lvl in levels]
    xoffs_py = [sum(_ws[:i]) for i in range(len(_ws))]

    def _take_static(vals, idx):
        """Tiny-static-table lookup by traced index: Q-1 predicated selects
        instead of an XLA element-gather. The per-pixel level-parameter
        lookups are [N, 2T, H, W]-many scalar gathers (measured 133 ms per
        8-band step at 4K); the same lookup as selects is pure VPU."""
        out = jnp.full(idx.shape, vals[0], jnp.int32)
        for j in range(1, len(vals)):
            out = jnp.where(idx == j, jnp.int32(vals[j]), out)
        return out

    # ---- mip selection (kernel.cu:451-503), all non-differentiable --------
    d = jax.lax.stop_gradient(vt_dxdy_img)  # [N, H, W, 2, 2]
    dudx, dvdx = d[..., 0, 0], d[..., 0, 1]
    dudy, dvdy = d[..., 1, 0], d[..., 1, 1]

    px = jnp.sqrt((dudx * base_w) ** 2 + (dvdx * base_h) ** 2 + 1e-12)
    py = jnp.sqrt((dudy * base_w) ** 2 + (dvdy * base_h) ** 2 + 1e-12)
    p_max = jnp.maximum(px, py)
    p_min = jnp.minimum(px, py)

    n_taps = jnp.minimum(jnp.ceil(p_max / p_min), float(max_aniso))
    n_taps = jnp.where((p_min == 0.0) | (n_taps == 0), 1.0, n_taps)

    lam = jnp.log2(p_max / n_taps)
    lam = jnp.where(jnp.isnan(lam) | jnp.isinf(lam), 0.0, lam)

    l = jnp.minimum(lam, q - 1 - 1e-6)

    if clip_grad:
        # Truncated pyramid: rescale uv steps so taps stay texel-spaced.
        scaling = jnp.where(
            lam > q - 1, jnp.exp2(l) * n_taps / p_max, jnp.ones_like(lam)
        )
        dudx = dudx * scaling
        dvdx = dvdx * scaling
        dudy = dudy * scaling
        dvdy = dvdy * scaling

    l = jnp.maximum(l, 0.0)
    d1 = jnp.floor(l).astype(jnp.int32)
    a = (l - jnp.floor(l)).astype(dt)

    n_int = n_taps.astype(jnp.int32)
    if force_max_aniso:
        n_int = jnp.full_like(n_int, max_aniso)
    n_f = n_int.astype(dt)

    # ---- tap coordinates ---------------------------------------------------
    u = grid[..., 0]
    v = grid[..., 1]

    x_dom = px > py
    du = jnp.where(x_dom, dudx, dudy).astype(dt)
    dv = jnp.where(x_dom, dvdx, dvdy).astype(dt)

    # i = 0..max_aniso-1 tap fractions: (i+1)/(N+1)*2-1, masked at i >= N.
    # Tap-LAST layout everywhere: taps on axis 1, image axes minor —
    # taps/channels-minor tensors get (8,128)-tile-padded 10-30x in HBM.
    i_arr = jnp.arange(max_aniso, dtype=dt)[None, :, None, None]
    frac = (i_arr + 1.0) / (n_f[:, None] + 1.0) * 2.0 - 1.0  # [N,T,H,W]
    tap_mask = (i_arr < n_f[:, None]).astype(dt)

    u_t = u[:, None] + du[:, None] * frac  # [N, T, H, W]
    v_t = v[:, None] + dv[:, None] * frac

    # ---- per-pixel level parameters ---------------------------------------
    def level_params(idx):  # idx [N, H, W] -> ([N, 1, H, W],)*3
        return (
            _take_static(_ws, idx)[:, None],
            _take_static(_hs, idx)[:, None],
            _take_static(xoffs_py, idx)[:, None],
        )

    if mode == "bilinear" or padding_mode == "zeros":
        quad, wq_q = _build_quad_atlas(atlas)
        # quad-table x-offsets: level x-ranges shift by the zero-ring column
        xoffs_static = tuple(int(x) for x in xoffs_py)
        quad_info = (quad, wq_q, xoffs_static)
        level_sampler = (
            _sample_level_bilinear
            if mode == "bilinear"
            else _sample_level_bicubic_quad
        )
        sample = functools.partial(level_sampler, quad_info)
    else:
        # bicubic border/reflection: per-tap folding breaks the 2x2 block
        # structure, so those modes keep the bounded element-gather path.
        sample = functools.partial(_sample_level_bicubic, atlas)

    inv_n = 1.0 / n_f
    if q == 1:
        wp, hp, xoff = level_params(d1)
        out = sample(u_t, v_t, wp, hp, xoff, padding_mode)  # [N,C,T,H,W]
        w_tap = tap_mask * ((1.0 - a) * inv_n)[:, None]
        return jnp.sum(out * w_tap[:, None], axis=2)

    # One MERGED gather over both mip levels: taps 0..T-1 sample level d1,
    # taps T..2T-1 sample d1+1, with the (1-a)/N and a/N blend weights
    # folded into the tap reduction. Halves the backward's per-level
    # window_accumulate pass count (one custom-vjp gather instead of two,
    # each of which paid one pass per level) and the kernel dispatches.
    d2 = jnp.minimum(d1 + 1, q - 1)
    t = max_aniso
    lvl2 = jnp.concatenate(
        [
            jnp.broadcast_to(d1[:, None], (n, t) + d1.shape[1:]),
            jnp.broadcast_to(d2[:, None], (n, t) + d2.shape[1:]),
        ],
        axis=1,
    )  # [N, 2T, H, W]
    wp = _take_static(_ws, lvl2)
    hp = _take_static(_hs, lvl2)
    xoff = _take_static(xoffs_py, lvl2)
    u_t2 = jnp.concatenate([u_t, u_t], axis=1)
    v_t2 = jnp.concatenate([v_t, v_t], axis=1)
    w_tap = jnp.concatenate(
        [
            tap_mask * ((1.0 - a) * inv_n)[:, None],
            tap_mask * (a * inv_n)[:, None],
        ],
        axis=1,
    )  # [N, 2T, H, W]
    out = sample(u_t2, v_t2, wp, hp, xoff, padding_mode)  # [N, C, 2T, H, W]
    return jnp.sum(out * w_tap[:, None], axis=2)


def mipmap_grid_sample(
    input: List[jnp.ndarray],
    grid: jnp.ndarray,
    vt_dxdy_img: jnp.ndarray,
    max_aniso: int,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: Optional[bool] = None,
    force_max_aniso: Optional[bool] = False,
    clip_grad: Optional[bool] = False,
) -> jnp.ndarray:
    """Mipmapped, anisotropic texture sampling.

    Mirrors ``drtk.mipmap_grid_sample`` (drtk/mipmap_grid_sample.py:18-127).

    Args:
        input: mip pyramid — list of [N, C, H_i, W_i] textures, highest
            resolution first; up to 11 levels; levels need not halve exactly.
        grid: [N, H_out, W_out, 2] normalized uv field.
        vt_dxdy_img: [N, H_out, W_out, 2, 2] Jacobian of uv w.r.t. pixel
            position (rows: d/dx, d/dy), in normalized (0..1) uv units.
        max_aniso: maximum anisotropic tap count.
        mode: "bilinear" | "bicubic" (no nearest, like the reference).
        padding_mode: "zeros" | "border" | "reflection".
        align_corners: must be falsy; the kernel forces False (kernel.cu:423).
        force_max_aniso: always take max_aniso taps (parity/debug mode).
        clip_grad: rescale uv steps when the pyramid is truncated.

    Returns:
        [N, C, H_out, W_out] filtered samples. Gradients flow to the texture
        levels and the grid (not to vt_dxdy_img), like the reference.
    """
    if mode not in ("bilinear", "bicubic"):
        raise ValueError(
            "mipmap_grid_sample(): only 'bilinear' and 'bicubic' modes are "
            f"supported but got: '{mode}'"
        )
    if padding_mode not in ("zeros", "border", "reflection"):
        raise ValueError(
            "mipmap_grid_sample(): expected padding_mode to be 'zeros', "
            f"'border', or 'reflection', but got: '{padding_mode}'"
        )
    if not input:
        raise ValueError("mipmap_grid_sample(): empty mip pyramid")
    # Autocast parity (mipmap_grid_sampler_module.cpp:232+): f16/bf16
    # inputs compute in float32.
    from drtk_tpu.ops.math import autocast_f32

    input = [autocast_f32(lvl) for lvl in input]
    grid = autocast_f32(grid)
    vt_dxdy_img = autocast_f32(vt_dxdy_img)
    if len(input) > _MAX_MIPMAP_COUNT:
        raise ValueError(
            f"mipmap_grid_sample(): at most {_MAX_MIPMAP_COUNT} mip levels "
            f"are supported, got {len(input)}"
        )
    for lvl in input:
        if lvl.ndim != 4:
            raise ValueError(
                f"mipmap_grid_sample(): levels must be [N, C, H, W], got {lvl.shape}"
            )
    if grid.ndim != 4 or grid.shape[-1] != 2:
        raise ValueError(
            f"mipmap_grid_sample(): grid must be [N, H, W, 2], got {grid.shape}"
        )
    if vt_dxdy_img.ndim != 5 or vt_dxdy_img.shape[-2:] != (2, 2):
        raise ValueError(
            "mipmap_grid_sample(): vt_dxdy_img must be [N, H, W, 2, 2], got "
            f"{vt_dxdy_img.shape}"
        )
    if max_aniso < 1:
        raise ValueError("mipmap_grid_sample(): max_aniso must be >= 1")
    return _mipmap_grid_sample_impl(
        tuple(input),
        grid,
        vt_dxdy_img,
        int(max_aniso),
        mode,
        padding_mode,
        bool(force_max_aniso),
        bool(clip_grad),
    )


# --------------------------------------------------------------------------
# Reference oracle (port of mipmap_grid_sample_ref, drtk/mipmap_grid_sample
# .py:130-295)
# --------------------------------------------------------------------------


def _mipmap_selection_ref(q, p_max, p_min, max_aniso):
    if max_aniso != 1:
        n_taps = jnp.minimum(jnp.ceil(p_max / p_min), float(max_aniso))
        n_taps = jnp.where(jnp.isnan(n_taps), 1.0, n_taps)
        lam = jnp.log2(p_max / n_taps)
    else:
        lam = jnp.log2(p_max)
    lam = jnp.where(jnp.isinf(lam), 0.0, lam)
    lam = jnp.clip(lam, 0.0, q - 1 - 1e-6)
    d1 = jnp.floor(lam).astype(jnp.int32)
    a = lam - jnp.floor(lam)
    return d1, a


def mipmap_grid_sample_ref(
    input: List[jnp.ndarray],
    grid: jnp.ndarray,
    vt_dxdy_img: jnp.ndarray,
    max_aniso: int,
    mode: str = "bilinear",
    padding_mode: str = "border",
    align_corners: Optional[bool] = False,
    high_quality: bool = False,
) -> jnp.ndarray:
    """Oracle port of the reference's pure-torch ``mipmap_grid_sample_ref``.

    The main implementation should match this when called with
    ``force_max_aniso=True`` and ``clip_grad=False`` and this with
    ``high_quality=False`` (the documented equivalence contract,
    drtk/mipmap_grid_sample.py:140-147).
    """
    from drtk_tpu.ops.grid_sample import grid_sample

    q = len(input)
    base_h, base_w = input[0].shape[2:]
    size = jnp.asarray([base_h, base_w], grid.dtype)

    d = jax.lax.stop_gradient(vt_dxdy_img)
    d_pix = d * size[None, None, None, :]

    px = jnp.linalg.norm(d_pix[..., 0, :], axis=-1)
    py = jnp.linalg.norm(d_pix[..., 1, :], axis=-1)

    if not high_quality:
        p_max = jnp.maximum(px, py)
        p_min = jnp.minimum(px, py) if max_aniso != 1 else None
    else:
        s = jnp.linalg.svd(d_pix, compute_uv=False)
        p_max = s[..., 0]
        p_min = s[..., 1]

    d1, a = _mipmap_selection_ref(q, p_max, p_min, max_aniso)

    if max_aniso != 1:
        fracs = [
            (j + 1.0) / (max_aniso + 1.0) * 2.0 - 1.0 for j in range(max_aniso)
        ]
        if not high_quality:
            uv_step_x = d[..., 0, :]
            uv_step_y = d[..., 1, :]
            uv_ext = [
                jnp.where(
                    (px > py)[..., None],
                    grid + uv_step_x * f,
                    grid + uv_step_y * f,
                )
                for f in fracs
            ]
        else:
            _, s_, vt_ = jnp.linalg.svd(d_pix)
            uv_step = (vt_[..., 0, :] * s_[..., 0:1]) / size[None, None, None, :]
            uv_ext = [grid + uv_step * f for f in fracs]

    result = []
    for level in input:
        if max_aniso == 1:
            r = grid_sample(
                level, grid, mode=mode, padding_mode=padding_mode,
                align_corners=bool(align_corners),
            )
        else:
            taps = [
                grid_sample(
                    level, g, mode=mode, padding_mode=padding_mode,
                    align_corners=bool(align_corners),
                )
                for g in uv_ext
            ]
            r = sum(taps) / max_aniso
        result.append(r)

    if q == 1:
        return result[0]
    stacked = jnp.stack(result, axis=0)  # [Q, N, C, H, W]

    def gather_level(idx):  # [N, H, W] -> [N, C, H, W]
        return jnp.take_along_axis(
            jnp.moveaxis(stacked, 0, -1),  # [N, C, H, W, Q]
            jnp.broadcast_to(
                idx[:, None, :, :, None],
                (stacked.shape[1], stacked.shape[2]) + idx.shape[1:] + (1,),
            ),
            axis=-1,
        )[..., 0]

    s0 = gather_level(d1)
    s1 = gather_level(jnp.minimum(d1 + 1, q - 1))
    return s0 + (s1 - s0) * a[:, None].astype(s0.dtype)
