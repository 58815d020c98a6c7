"""Optimizing geometry — the canonical two-triangles inverse-rendering fit.

Mirrors the reference's DRTK_Tutorial_2_optimizing_geometry and
test/two_triangles.py: perturb vertices, then recover them by gradient
descent on image MSE. The edge_grad_estimator supplies the silhouette
gradients that make this work.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import drtk_tpu as dt
from drtk_tpu.ops.grid_sample import grid_sample
from common import save_ppm

h = w = 512

v_gt = jnp.asarray(
    np.array(
        [[10, 200, 100], [300, 50, 100], [400, 500, 100],
         [50, 400, 200], [400, 50, 50], [300, 500, 200]],
        np.float32,
    )[None]
)
vi = jnp.arange(6, dtype=jnp.int32).reshape(2, 3)
vt = jnp.zeros((1, 6, 2), jnp.float32).at[:, 3:, 0].set(1.0)
tex = jnp.ones((1, 3, 16, 16), jnp.float32).at[:, :, :, 8:].set(0.5)


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
save_ppm("two_triangles_target.ppm", np.asarray(img_gt[0]))

rng = np.random.RandomState(10)
noise = rng.randn(1, 6, 3).astype(np.float32) * 20.0
noise[..., 2] = 0.0  # xy only
v = v_gt + jnp.asarray(noise)

opt = optax.adam(1e-1)
state = opt.init(v)


@jax.jit
def step(v, state):
    loss, g = jax.value_and_grad(
        lambda v: jnp.mean((forward(v) - img_gt) ** 2)
    )(v)
    g = g.at[..., 2].set(0.0)
    updates, state = opt.update(g, state)
    return optax.apply_updates(v, updates), state, loss


for it in range(2000):
    v, state, loss = step(v, state)
    if it % 200 == 0:
        print(f"iter {it:5d}  loss {float(loss):.3e}")

err = float(jnp.abs(v - v_gt)[..., :2].max())
print(f"final loss {float(loss):.3e}, max vertex error {err:.2f}px")
save_ppm("two_triangles_final.ppm", np.asarray(jax.jit(forward)(v)[0]))
