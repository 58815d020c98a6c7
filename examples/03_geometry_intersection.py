"""Geometry intersection — depth gradients at 3-D penetration boundaries.

Mirrors the reference's DRTK_Tutorial_3_geometry_intersection: when two
triangles interpenetrate, the visibility boundary is an intersection line
whose motion depends on vertex z. edge_grad_estimator's intersection branch
(dp/dr from projected face normals) supplies exactly those gradients, so a
z-only fit can recover depth from silhouette motion alone.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import drtk_tpu as dt
from drtk_tpu.ops.grid_sample import grid_sample
from common import save_ppm

h = w = 256

# Two crossing triangles: tri 2 penetrates tri 1 in depth.
v_gt = jnp.asarray(
    np.array(
        [[20, 40, 100], [230, 40, 100], [128, 230, 100],     # flat at z=100
         [20, 200, 60], [230, 200, 140], [128, 30, 100]],    # tilted in z
        np.float32,
    )[None]
)
vi = jnp.arange(6, dtype=jnp.int32).reshape(2, 3)
vt = jnp.zeros((1, 6, 2), jnp.float32).at[:, 3:, 0].set(1.0)
tex = jnp.ones((1, 3, 8, 8), jnp.float32).at[:, :, :, 4:].set(0.25)


def forward(v):
    index_img = dt.rasterize(v, vi, h, w)
    _, bary = dt.render(v, vi, index_img)
    uv = jnp.moveaxis(dt.interpolate(vt, vi, index_img, bary), 1, -1)
    img = grid_sample(tex, uv, padding_mode="border")
    img = img * (index_img != -1)[:, None]
    return dt.edge_grad_estimator(
        v_pix=v, vi=vi, bary_img=bary, img=img, index_img=index_img
    )


img_gt = jax.jit(forward)(v_gt)
save_ppm("intersection_target.ppm", np.asarray(img_gt[0]))

# Perturb only z of the tilted triangle.
v = v_gt.at[0, 3:, 2].add(jnp.asarray([25.0, -20.0, 15.0]))

opt = optax.adam(5e-1)
state = opt.init(v)


@jax.jit
def step(v, state):
    loss, g = jax.value_and_grad(
        lambda v: jnp.mean((forward(v) - img_gt) ** 2)
    )(v)
    g = g.at[..., :2].set(0.0)  # z_only
    updates, state = opt.update(g, state)
    return optax.apply_updates(v, updates), state, loss


def intersection_iou(v):
    # The *observable* quantity: where each triangle wins the z-test. z is
    # only determined up to motions that keep the intersection line fixed,
    # so we compare index images, not raw z.
    idx = dt.rasterize(v, vi, h, w)
    idx_gt = dt.rasterize(v_gt, vi, h, w)
    same = jnp.sum((idx == idx_gt) & (idx_gt >= 0))
    return float(same / jnp.maximum(jnp.sum(idx_gt >= 0), 1))


loss0 = None
iou0 = intersection_iou(v)
for it in range(1500):
    v, state, loss = step(v, state)
    if loss0 is None:
        loss0 = float(loss)
    if it % 150 == 0:
        print(f"iter {it:5d}  loss {float(loss):.3e}")

print(
    f"loss {loss0:.3e} -> {float(loss):.3e}; "
    f"index-image agreement {100*iou0:.1f}% -> {100*intersection_iou(v):.1f}%"
)
save_ppm("intersection_final.ppm", np.asarray(jax.jit(forward)(v)[0]))
