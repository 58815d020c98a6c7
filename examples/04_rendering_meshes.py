"""Rendering meshes — cameras, mipmapped textures, and an MSI background.

Mirrors the reference's DRTK_Tutorial_rendering_meshes: a world-space mesh
viewed through a pinhole camera (drtk_tpu.transform), shaded with
anisotropic mipmapped texture sampling driven by the analytic screen-space
uv Jacobian, composited over a multi-sphere-image background.
"""

import jax
import jax.numpy as jnp
import numpy as np

import drtk_tpu as dt
from common import save_ppm

h = w = 512

# --- a wavy grid mesh in world space ----------------------------------------
gn = 41
rng = np.random.RandomState(0)
ys, xs = np.meshgrid(np.linspace(-1, 1, gn), np.linspace(-1, 1, gn), indexing="ij")
zs = 4.0 + 0.35 * np.sin(3 * xs) * np.cos(3 * ys)
v = jnp.asarray(np.stack([xs, ys, zs], -1).reshape(1, -1, 3).astype(np.float32))
idx = np.arange(gn * gn).reshape(gn, gn)
a, b, c, d = (idx[:-1, :-1].ravel(), idx[:-1, 1:].ravel(),
              idx[1:, :-1].ravel(), idx[1:, 1:].ravel())
vi = jnp.asarray(np.concatenate(
    [np.stack([a, b, c], -1), np.stack([b, d, c], -1)]).astype(np.int32))
vt = jnp.asarray(np.stack([(xs + 1) / 2, (ys + 1) / 2], -1)
                 .reshape(1, -1, 2).astype(np.float32))

# --- camera ------------------------------------------------------------------
campos = jnp.zeros((1, 3), jnp.float32)
camrot = jnp.eye(3, dtype=jnp.float32)[None]
focal = jnp.asarray(np.diag([w * 0.8, h * 0.8]).astype(np.float32)[None])
princpt = jnp.asarray(np.array([[w / 2, h / 2]], np.float32))

v_pix = dt.transform(v, campos=campos, camrot=camrot, focal=focal, princpt=princpt)

# --- rasterize + interpolate --------------------------------------------------
index_img = dt.rasterize(v_pix, vi, h, w)
_, bary = dt.render(v_pix, vi, index_img)
mask = index_img != -1
uv_img = dt.interpolate(vt, vi, index_img, bary)
uv = jnp.moveaxis(uv_img, 1, -1) * 2.0 - 1.0

# --- mipmapped texture (checkerboard pyramid) ---------------------------------
base = 256
cy, cx = np.meshgrid(np.arange(base), np.arange(base), indexing="ij")
checker = (((cy // 8 + cx // 8) % 2).astype(np.float32) * 0.7 + 0.2)
tex0 = np.stack([checker, 1 - checker, np.full_like(checker, 0.5)])[None]
levels = [jnp.asarray(tex0)]
while levels[-1].shape[-1] > 4:
    lv = levels[-1]
    levels.append((lv[..., ::2, ::2] + lv[..., 1::2, ::2]
                   + lv[..., ::2, 1::2] + lv[..., 1::2, 1::2]) / 4.0)

# analytic screen-space uv Jacobian drives the mip/aniso selection
jac = dt.screen_space_uv_derivative(
    v, vt, vi, vi, index_img, bary, mask, campos, camrot, focal
)
shaded = dt.mipmap_grid_sample(levels, uv, jac, max_aniso=4, padding_mode="border")

# --- MSI background ------------------------------------------------------------
ys_p, xs_p = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
dirs = np.stack([(xs_p - w / 2) / (w * 0.8), (ys_p - h / 2) / (h * 0.8),
                 np.ones_like(xs_p)], -1).reshape(-1, 3).astype(np.float32)
msi_tex = jnp.asarray(
    np.concatenate([rng.rand(4, 3, 32, 64), np.full((4, 1, 32, 64), 2.0)], 1)
    .astype(np.float32))
bg = dt.msi(jnp.zeros((h * w, 3), jnp.float32), jnp.asarray(dirs), msi_tex)
bg_img = jnp.moveaxis(bg[:, :3].reshape(h, w, 3), -1, 0)[None]

out = jnp.where(mask[:, None], shaded, bg_img)
save_ppm("mesh_render.ppm", np.asarray(out[0]))
print("done; foreground pixels:", int(mask.sum()))
