"""Multi-Sphere Image (MSI) raymarcher (NeRF++-style background).

TPU-native equivalent of the reference's ``msi_ext``
(`src/msi/msi_kernel.cu` in facebookresearch/DRTK):

* One ray per output element; concentric spheres with radius interpolated
  linearly in 1/r between ``min_inv_r`` (nearest) and ``max_inv_r``
  (farthest); ``n_steps = L * sub_step_count`` front-to-back
  (msi_kernel.cu:208-293).
* Ray-sphere intersection: ``tc = dot(-o, d)``, ``h2 = |o|^2 - tc^2``,
  ``t = tc + sqrt(r^2 - h2)``; the step is skipped when the ray misses the
  sphere (det < 0).
* Direction -> equirectangular uv: ``u = atan2(z, x)/pi``,
  ``v = 2*atan2(y, |xz|)/pi`` (:198-204).
* Tri-filtered sampling: bilinear within a layer, Catmull-Rom-style cubic
  (ATen A=-0.75 coefficients) across layers, with border-clamped
  coordinates (msi_sample_bilinear_cubic, :17-88).
* Exponential transmittance compositing in log space with early
  termination at ``stop_thresh`` (:275-286): on stop, ``log_transmit`` is
  set to -1e3 and the ray goes inactive.
* Output [N, 4] = (rgb, log_transmittance).
* Gradients flow **only to the texture** — ray_o/ray_d receive none
  (msi_module.cpp:108-122).

TPU-first design: the per-ray sequential march with data-dependent break is
re-expressed as a **parallel prefix scan**. Transmittance compositing is
``exp(-cumsum(pcnt))``; the early-termination break is recovered exactly
from the unmasked prefix, because the prefix equals the sequential
transmittance up to and including the first step that crosses
``stop_thresh`` — everything after the first crossing is masked out and
``log_transmit`` is pinned to -1e3 like the kernel. All ``n_steps``
samples are gathered in one batched gather instead of a 16..128-iteration
sequential loop, which is the difference between VPU-saturating work and a
latency-bound scan on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["msi"]


def _cubic_coeffs(t: jnp.ndarray, a: float = -0.75):
    """ATen get_cubic_upsampling_coefficients (A = -0.75)."""
    t2 = t * t
    t3 = t2 * t
    c0 = a * (t3 - 2 * t2 + t)
    c1 = (a + 2) * t3 - (a + 3) * t2 + 1
    c2 = -(a + 2) * t3 + (2 * a + 3) * t2 - a * t
    c3 = a * (t2 - t3)
    return c0, c1, c2, c3


def _sample_bilinear_cubic(texture: jnp.ndarray, u, v, w):
    """Bilinear (u, v) x cubic (w) sampling of an [L, C, H, W] texture at
    normalized coords in [-1, 1]; border-clamped like msi_sample_bilinear_
    cubic (msi_kernel.cu:17-88). u/v/w: [R] -> returns [R, C].

    TPU note: the four spatial taps of each layer come from ONE row gather
    out of a quad table (texture concatenated with its x/y/xy-shifted
    copies) — 4 row gathers per sample instead of 16 element gathers, and
    the texture-gradient VJP becomes 4 row scatters. The +1 taps carry zero
    weight exactly at the clipped boundary, so zero-filled shifts preserve
    the kernel's within_bounds_2d semantics.
    """
    l_cnt, c_cnt, h, w_size = texture.shape
    dt = u.dtype

    def unnorm_clip(coord, size):
        x = ((coord + 1.0) * size - 1.0) / 2.0
        return jnp.clip(x, 0.0, size - 1.0)

    x = unnorm_clip(u, w_size)
    y = unnorm_clip(v, h)
    z = unnorm_clip(w, l_cnt)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    tx = x - x0
    ty = y - y0
    tz = z - z0
    ix = x0.astype(jnp.int32)
    iy = y0.astype(jnp.int32)
    iz = z0.astype(jnp.int32)

    t = jnp.moveaxis(texture, 1, -1)  # [L, H, W, C]
    tx1_ = jnp.concatenate([t[:, :, 1:], jnp.zeros_like(t[:, :, :1])], 2)
    ty1_ = jnp.concatenate([t[:, 1:], jnp.zeros_like(t[:, :1])], 1)
    txy_ = jnp.concatenate([ty1_[:, :, 1:], jnp.zeros_like(t[:, :, :1])], 2)
    quad = jnp.concatenate([t, tx1_, ty1_, txy_], -1).reshape(
        l_cnt * h * w_size, 4 * c_cnt
    )

    wts = jnp.stack(
        [(1 - tx) * (1 - ty), tx * (1 - ty), (1 - tx) * ty, tx * ty], axis=-1
    )  # [R, 4]

    cz = _cubic_coeffs(tz)
    out = jnp.zeros((u.shape[0], c_cnt), dt)
    base = iy * w_size + ix
    for i in range(4):
        lz = jnp.clip(iz - 1 + i, 0, l_cnt - 1)
        rows = quad[lz * (h * w_size) + base].reshape(-1, 4, c_cnt)
        plane = jnp.einsum("rkc,rk->rc", rows, wts.astype(rows.dtype))
        out = out + plane * cz[i][:, None]
    return out


@functools.partial(
    jax.jit, static_argnames=("sub_step_count",)
)
def _msi_impl(ray_o, ray_d, texture, sub_step_count, min_inv_r, max_inv_r,
              stop_thresh):
    n_layers = texture.shape[0]
    n_steps = n_layers * sub_step_count
    dt = texture.dtype

    r_o = ray_o.astype(dt)
    r_d = ray_d.astype(dt)
    r_d = r_d / jnp.linalg.norm(r_d, axis=-1, keepdims=True)

    tc = jnp.sum(-r_o * r_d, axis=-1)  # [R]
    h2 = jnp.sum(r_o * r_o, axis=-1) - tc * tc

    step_size = 1.0 / n_steps
    i_arr = jnp.arange(n_steps, dtype=dt)
    a_arr = ((n_steps - 1 - i_arr) + 0.5) / n_steps  # near -> far, [S]

    # ---- all step geometry at once: [R, S] -------------------------------
    inv_r = (1.0 - a_arr) * max_inv_r + a_arr * min_inv_r  # [S]
    r = 1.0 / inv_r
    det = (r * r)[None, :] - h2[:, None]  # [R, S]
    hit = det >= 0.0
    t = tc[:, None] + jnp.sqrt(jnp.maximum(det, 0.0))
    pos = r_o[:, None, :] + t[..., None] * r_d[:, None, :]  # [R, S, 3]

    lon = jnp.arctan2(pos[..., 2], pos[..., 0])
    lat = jnp.arctan2(pos[..., 1], jnp.hypot(pos[..., 0], pos[..., 2]))
    u = lon / jnp.pi
    v = 2.0 * lat / jnp.pi
    w = jnp.broadcast_to((1.0 - 2.0 * a_arr)[None, :], u.shape)

    num_rays = ray_o.shape[0]
    sample = _sample_bilinear_cubic(
        texture, u.reshape(-1), v.reshape(-1), w.reshape(-1)
    ).reshape(num_rays, n_steps, 4)
    rgb = sample[..., :3]
    alpha = sample[..., 3]

    # ---- prefix-scan compositing ------------------------------------------
    act = hit & (alpha > 0.0)
    pcnt = jnp.where(act, alpha * step_size, 0.0)  # [R, S]
    incl = jnp.cumsum(pcnt, axis=1)  # log_T after step i (negated)
    excl = incl - pcnt  # log_T before step i (negated)

    # Early termination: first step whose post-update transmittance crosses
    # stop_thresh; the unmasked prefix is exact up to and including it.
    stop_flag = act & (jnp.exp(-incl) < stop_thresh)
    any_stop = jnp.any(stop_flag, axis=1)  # [R]
    first_stop = jnp.argmax(stop_flag, axis=1)  # [R] (0 when none)
    first_stop = jnp.where(any_stop, first_stop, n_steps - 1)

    contrib_mask = act & (i_arr[None, :].astype(jnp.int32)
                          <= first_stop[:, None].astype(jnp.int32))
    weight = jnp.exp(-excl) * (1.0 - jnp.exp(-pcnt))
    out_v = jnp.sum(
        jnp.where(contrib_mask[..., None],
                  weight[..., None] * jnp.maximum(rgb, 0.0), 0.0),
        axis=1,
    )

    final_log_t = -jnp.take_along_axis(incl, first_stop[:, None], axis=1)[:, 0]
    log_t = jnp.where(any_stop, jnp.asarray(-1e3, dt), final_log_t)
    return jnp.concatenate([out_v, log_t[:, None]], axis=-1)


def msi(
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    texture: jnp.ndarray,
    sub_step_count: int = 2,
    min_inv_r: float = 1.0,
    max_inv_r: float = 0.0,
    stop_thresh: float = 1e-7,
) -> jnp.ndarray:
    """Render a Multi-Sphere Image. Mirrors ``drtk.msi`` (drtk/msi.py:15-54).

    Args:
        ray_o: [N, 3] ray origins.
        ray_d: [N, 3] ray directions (normalized internally).
        texture: [L, 4, H, W] MSI texture — rgb + sigma (negative log alpha)
            channels, equirectangular layout.
        sub_step_count: sub-sampling rate of the layers (steps = L * rate).
        min_inv_r: inverse of the smallest sphere radius (1 = unit sphere).
        max_inv_r: inverse of the largest radius (0 = infinity).
        stop_thresh: early ray-termination transmittance threshold.

    Returns:
        [N, 4]: rgb in the first 3 channels, log-transmittance in the 4th.
        Gradients flow to ``texture`` only, like the reference
        (msi_module.cpp:108-122).
    """
    # Autocast parity (msi_module.cpp:145-171): f16/bf16 inputs compute in
    # float32.
    from drtk_tpu.ops.math import autocast_f32

    ray_o = autocast_f32(ray_o)
    ray_d = autocast_f32(ray_d)
    texture = autocast_f32(texture)
    if ray_o.ndim != 2 or ray_o.shape[-1] != 3:
        raise ValueError(f"msi: expected ray_o [N, 3], got {ray_o.shape}")
    if ray_d.shape != ray_o.shape:
        raise ValueError(
            f"msi: ray_d shape {ray_d.shape} must match ray_o {ray_o.shape}"
        )
    if texture.ndim != 4 or texture.shape[1] != 4:
        raise ValueError(
            f"msi: expected texture [L, 4, H, W], got {texture.shape}"
        )
    if sub_step_count < 1:
        raise ValueError("msi: sub_step_count must be >= 1")
    return _msi_impl(
        jax.lax.stop_gradient(ray_o),
        jax.lax.stop_gradient(ray_d),
        texture,
        int(sub_step_count),
        float(min_inv_r),
        float(max_inv_r),
        float(stop_thresh),
    )
